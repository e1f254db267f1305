"""Audio feature frontends as parameter-free flax modules.

``FilterbankFeatures`` is the QuartzNet/Citrinet mel frontend — behavioral
rebuild of the reference pipeline (`/root/reference/src/thunder/quartznet/
transform.py:258-321`): dither (train only) -> preemphasis -> power spectrum
-> mel -> log -> masked per-feature normalization (+ optional SpecCutout /
SpecAugment in train mode).  On TPU the whole thing lowers to two fused
matmul chains (windowed-DFT + mel projection) — see
:mod:`thunder_tpu.ops.stft`; a hand-fused Pallas variant lives in
:mod:`thunder_tpu.kernels`.

``Wav2Vec2Preprocess`` mirrors `/root/reference/src/thunder/huggingface/
transform.py:18-55` (zero-mean/unit-var waveform normalization).

Output layout is channels-last ``(batch, frames, features)``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from thunder_tpu.ops.masking import lengths_to_mask, normalize_tensor
from thunder_tpu.ops.specaugment import spec_augment, spec_cutout
from thunder_tpu.ops.stft import (
    mel_features,
    next_pow2,
    power_spectrum_lengths,
    preemphasis,
)

__all__ = ["FilterbankFeatures", "Wav2Vec2Preprocess"]


class FilterbankFeatures(nn.Module):
    """Raw audio ``(batch, time)`` -> normalized log-mel ``(batch, frames, nfilt)``."""

    sample_rate: int = 16000
    n_window_size: int = 320
    n_window_stride: int = 160
    n_fft: Optional[int] = None
    preemph: float = 0.97
    nfilt: int = 64
    dither: float = 1e-5
    num_cutout_masks: int = 0
    num_time_masks: int = 0
    num_freq_masks: int = 0
    mask_time_width: int = 50
    mask_freq_width: int = 20
    stft_method: str = "matmul"
    #: None -> use the fused Pallas kernel on TPU, XLA elsewhere;
    #: True/False force it
    use_fused_kernel: bool | None = None
    #: fused-kernel DFT precision: "auto" (3-pass bf16 on TPU, exact f32
    #: elsewhere), "3x", or "highest"; only affects the fused Pallas path
    dft_precision: str = "auto"
    div_guard: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        if self.num_cutout_masks > 0 and (self.num_freq_masks + self.num_time_masks > 0):
            raise ValueError("Cutout and SpecAugment can't be used at the same time.")
        if self.dft_precision not in ("auto", "3x", "highest"):
            raise ValueError(
                f"dft_precision must be auto|3x|highest, got {self.dft_precision!r}"
            )
        if self.n_window_size <= 0 or self.n_window_stride <= 0:
            raise ValueError(
                "FilterbankFeatures got an invalid value for either n_window_size "
                "or n_window_stride. Both must be positive ints."
            )
        super().__post_init__()

    @property
    def fft_size(self) -> int:
        return self.n_fft or next_pow2(self.n_window_size)

    def output_lengths(self, lengths: jax.Array) -> jax.Array:
        return power_spectrum_lengths(lengths, self.n_window_stride)

    @nn.compact
    def __call__(self, audio: jax.Array, lengths: jax.Array, train: bool = False):
        x = audio.astype(jnp.float32)
        if train and self.dither > 0:
            rng = self.make_rng("augment")
            x = x + self.dither * jax.random.normal(rng, x.shape, dtype=x.dtype)
        n_fft = self.fft_size
        out_lengths = self.output_lengths(lengths)
        fused = self.use_fused_kernel
        if fused is None:
            fused = jax.default_backend() == "tpu"
        if fused:
            from thunder_tpu.kernels.frontend_pallas import fused_log_mel

            mel = fused_log_mel(
                x,
                sample_rate=self.sample_rate,
                n_fft=n_fft,
                hop_length=self.n_window_stride,
                win_length=self.n_window_size,
                n_mels=self.nfilt,
                preemph=self.preemph,
                dft_precision=self.dft_precision,
            )
        else:
            mel = mel_features(
                preemphasis(x, self.preemph),
                self.sample_rate,
                n_fft,
                self.n_window_stride,
                self.n_window_size,
                self.nfilt,
                method=self.stft_method,
            )

        # per-(sample, feature) normalization over valid frames; statistics are
        # stop-gradiented like the reference's no_grad block (transform.py:87)
        mask = lengths_to_mask(out_lengths, mel.shape[1])[:, :, None]
        feats = normalize_tensor(mel, mask, div_guard=self.div_guard, axis=1)

        if train and self.num_cutout_masks > 0:
            feats = spec_cutout(
                self.make_rng("augment"),
                feats,
                rect_masks=self.num_cutout_masks,
                time_width=self.mask_time_width,
                freq_width=self.mask_freq_width,
            )
        if train and (self.num_time_masks + self.num_freq_masks) > 0:
            feats = spec_augment(
                self.make_rng("augment"),
                feats,
                time_masks=self.num_time_masks,
                freq_masks=self.num_freq_masks,
                time_width=self.mask_time_width,
                freq_width=self.mask_freq_width,
            )
        return feats.astype(self.dtype), out_lengths


class Wav2Vec2Preprocess(nn.Module):
    """Zero-mean/unit-variance waveform normalization (HF-compatible).

    Follows the reference's formula per branch (``blocks.py:118-153``,
    selected by ``mask_input`` in `huggingface/transform.py:18-55`):

    - ``mask_input=True``: population std, ``(x - mean) / (std + div_guard)``;
    - ``mask_input=False``: sample std (ddof=1), ``(x - mean) /
      sqrt(var + div_guard)`` — the reference's unmasked branch.  The
      ddof-1 factor matters: N/(N-1) is ~3e-5 at 1 s audio, which amplifies
      to ~5e-3 at the logits of a wav2vec2-base stack — enough to flip
      near-tie argmaxes (found by tests/test_reference_parity_e2e.py).

    DELIBERATE DEVIATION: statistics are always computed over the valid
    region.  The reference pads only to the batch max, so for
    mask_input=False models (e.g. wav2vec2-base-960h) its unmasked stats see
    ~zero padding.  This framework pads to static buckets — unmasked stats
    would scale a short clip by the bucket fill factor, making transcriptions
    depend on the padding amount.  For unpadded inputs (the reference's
    regime) the valid region is everything and the outputs are identical.
    """

    div_guard: float = 1e-7
    mask_input: bool = False

    @nn.compact
    def __call__(self, audio: jax.Array, lengths: jax.Array, train: bool = False):
        mask = lengths_to_mask(lengths, audio.shape[-1])
        if self.mask_input:
            return normalize_tensor(audio, mask, div_guard=self.div_guard, axis=-1), lengths
        maskf = mask.astype(audio.dtype)
        x = audio * maskf
        n = jnp.sum(maskf, axis=-1, keepdims=True)
        mean = jnp.sum(x, axis=-1, keepdims=True) / n
        sq = jnp.sum(jnp.square((x - mean) * maskf), axis=-1, keepdims=True)
        var = sq / jnp.maximum(n - 1.0, 1.0)
        normalized = (x - mean) / jnp.sqrt(var + self.div_guard)
        return normalized * maskf, lengths
