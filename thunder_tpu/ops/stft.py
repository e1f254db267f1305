"""Spectral ops: framing, STFT, power spectrum, slaney mel filterbank.

Numerical-parity targets (reference: /root/reference/src/thunder):
- ``PowerSpectrum`` (`quartznet/transform.py:147-208`): hann window with
  ``periodic=False``, ``n_fft = next_pow2(win_length)``, centered STFT with
  reflect padding, magnitude squared, out_lengths = floor(len/hop) + 1.
- ``MelScale`` (`quartznet/transform.py:211-255`): slaney-scale/slaney-norm
  mel filterbank, ``log(x + 2**-24)``.
- ``convolution_stft`` (`blocks.py:38-91`): the reference's FFT-free STFT; the
  TPU analogue here is the ``method="matmul"`` path which computes the DFT as
  a windowed-basis matmul — that one runs on the MXU and is the building block
  of the fused Pallas frontend kernel.

Everything is channels-last: the power spectrum is ``(batch, frames, freqs)``
and mel features are ``(batch, frames, n_mels)``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "hann_window",
    "next_pow2",
    "mel_filterbank",
    "frame_signal",
    "stft",
    "convolution_stft",
    "power_spectrum",
    "power_spectrum_lengths",
    "mel_features",
    "preemphasis",
]


def next_pow2(n: int) -> int:
    return 2 ** math.ceil(math.log2(n))


def hann_window(win_length: int, periodic: bool = False, dtype=np.float32) -> np.ndarray:
    """Hann window; ``periodic=False`` matches ``torch.hann_window(periodic=False)``."""
    if win_length == 1:
        return np.ones((1,), dtype=dtype)
    n = np.arange(win_length, dtype=np.float64)
    denom = win_length if periodic else win_length - 1
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / denom))
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# Slaney mel scale
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3.0  # linear region: mels per Hz below 1 kHz
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP  # = 15.0
_LOGSTEP = math.log(6.4) / 27.0


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    mels = freq / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mels = np.where(log_region, _MIN_LOG_MEL + np.log(np.maximum(freq, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP, mels)
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    freqs = _F_SP * mels
    log_region = mels >= _MIN_LOG_MEL
    freqs = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mels - _MIN_LOG_MEL)), freqs)
    return freqs


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, slaney scale + slaney (area) normalization.

    Matches ``torchaudio.functional.melscale_fbanks(..., norm="slaney",
    mel_scale="slaney")`` as used by the reference MelScale
    (`quartznet/transform.py:227-239`).

    Returns:
        ``(n_freqs, n_mels)`` matrix; mel features = power @ fb.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    mel_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2)
    f_pts = _mel_to_hz_slaney(mel_pts)  # (n_mels + 2,)

    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)

    down_slopes = (-slopes[:, :-2]) / f_diff[:-1]  # rising edge
    up_slopes = slopes[:, 2:] / f_diff[1:]  # falling edge
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    # slaney normalization: scale each filter to be approximately constant
    # energy per channel (2 / bandwidth)
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(dtype)


# ---------------------------------------------------------------------------
# Framing and STFT
# ---------------------------------------------------------------------------


def frame_signal(x: jax.Array, n_fft: int, hop_length: int, center: bool = True) -> jax.Array:
    """Slice ``(batch, time)`` audio into overlapping frames ``(batch, frames, n_fft)``.

    With ``center=True`` the signal is reflect-padded by ``n_fft // 2`` on both
    sides first (torch.stft semantics), giving ``1 + time // hop`` frames.
    """
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    # conv_general_dilated_patches extracts sliding windows as a conv with an
    # identity kernel — lowers to cheap data movement on TPU.
    patches = lax.conv_general_dilated_patches(
        x[:, :, None],
        filter_shape=(n_fft,),
        window_strides=(hop_length,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        # pure data movement: force full precision so TPU doesn't round the
        # identity-kernel conv through bf16
        precision=lax.Precision.HIGHEST,
    )
    return patches  # (batch, frames, n_fft)


def _padded_window(window: np.ndarray, n_fft: int) -> np.ndarray:
    """Center-pad a window of length win_length to n_fft (torch.stft behavior)."""
    win_length = window.shape[0]
    lpad = (n_fft - win_length) // 2
    rpad = n_fft - win_length - lpad
    return np.pad(window, (lpad, rpad))


def _rdft_basis(n_fft: int, dtype=np.float32):
    """Real-DFT basis: cos/sin matrices of shape (n_fft, n_fft//2+1)."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    return np.cos(angle).astype(dtype), np.sin(angle).astype(dtype)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center", "method"))
def stft(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    method: str = "matmul",
):
    """Short-time Fourier transform of ``(batch, time)`` audio.

    Args:
        method: ``"matmul"`` computes the real DFT as two MXU matmuls with a
            windowed cos/sin basis (the TPU-native path, analogous to the
            reference's ``convolution_stft``).  ``"fft"`` uses ``jnp.fft.rfft``
            (XLA FFT) and serves as the numerical reference.

    Returns:
        ``(real, imag)`` arrays of shape ``(batch, frames, n_fft // 2 + 1)``.
    """
    window = _padded_window(hann_window(win_length), n_fft)
    frames = frame_signal(x, n_fft, hop_length, center=center)
    if method == "fft":
        spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
        return jnp.real(spec).astype(x.dtype), jnp.imag(spec).astype(x.dtype)
    cos_b, sin_b = _rdft_basis(n_fft)
    wcos = jnp.asarray(cos_b * window[:, None], dtype=x.dtype)
    wsin = jnp.asarray(sin_b * window[:, None], dtype=x.dtype)
    real = jnp.matmul(frames, wcos, precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32).astype(x.dtype)
    imag = jnp.matmul(frames, wsin, precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32).astype(x.dtype)
    return real, imag


def convolution_stft(x: jax.Array, n_fft: int, hop_length: int, win_length: int, center: bool = True):
    """FFT-free STFT (windowed DFT matmul) — the reference's ``convolution_stft``
    (`blocks.py:38-91`) rebuilt as the MXU-native path.  Alias for
    ``stft(..., method="matmul")``; returns ``(real, imag)``."""
    return stft(x, n_fft, hop_length, win_length, center=center, method="matmul")


def power_spectrum_lengths(lengths: jax.Array, hop_length: int) -> jax.Array:
    """Frame count for valid samples: floor(len / hop) + 1 (`transform.py:182-184`).

    Zero-length inputs map to zero frames (the reference never sees length 0;
    here the SPMD batch padder marks padding rows with length 0 so every
    masked statistic downstream excludes them exactly).
    """
    lengths = lengths.astype(jnp.int32)
    return jnp.where(lengths > 0, lengths // hop_length + 1, 0)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "method"))
def power_spectrum(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    method: str = "matmul",
) -> jax.Array:
    """|STFT|^2 of ``(batch, time)`` audio -> ``(batch, frames, n_freqs)``."""
    real, imag = stft(x, n_fft, hop_length, win_length, center=True, method=method)
    return real * real + imag * imag


def preemphasis(x: jax.Array, coeff: float = 0.97) -> jax.Array:
    """y[n] = x[n] - coeff * x[n-1], y[0] = x[0] (`transform.py:121-144`)."""
    return jnp.concatenate([x[:, :1], x[:, 1:] - coeff * x[:, :-1]], axis=1)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "n_mels", "sample_rate", "log_scale", "method"))
def mel_features(
    x: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_mels: int,
    log_scale: bool = True,
    method: str = "matmul",
) -> jax.Array:
    """Power spectrum -> mel -> log, fused under one jit.

    Returns ``(batch, frames, n_mels)``.
    """
    power = power_spectrum(x, n_fft, hop_length, win_length, method=method)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate), dtype=x.dtype)
    mel = jnp.matmul(power, fb, precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32).astype(x.dtype)
    if log_scale:
        mel = jnp.log(mel + 2.0**-24)
    return mel
