import jax.numpy as jnp
import numpy as np
import pytest
import torch

from thunder_tpu.ops import (
    hann_window,
    mel_features,
    mel_filterbank,
    next_pow2,
    power_spectrum,
    power_spectrum_lengths,
    preemphasis,
    stft,
)


def test_hann_window_matches_torch():
    for n in [16, 320, 401]:
        ours = hann_window(n, periodic=False)
        want = torch.hann_window(n, periodic=False).numpy()
        np.testing.assert_allclose(ours, want, atol=1e-6)


def test_next_pow2():
    assert next_pow2(320) == 512
    assert next_pow2(512) == 512
    assert next_pow2(400) == 512


def _torch_power_spectrum(x, n_fft, hop, win):
    window = torch.hann_window(win, periodic=False)
    spec = torch.stft(
        torch.tensor(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        center=True,
        window=window,
        return_complex=True,
    )
    return spec.abs().pow(2).numpy()  # (batch, freq, frames)


def test_stft_fft_matches_torch(sample_audio):
    audio, _ = sample_audio
    n_fft, hop, win = 512, 160, 320
    want = _torch_power_spectrum(audio, n_fft, hop, win)
    got = np.asarray(power_spectrum(jnp.asarray(audio), n_fft, hop, win, method="fft"))
    # ours is (batch, frames, freqs); torch is (batch, freqs, frames)
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=2e-2, rtol=1e-4)


def test_stft_matmul_matches_fft(sample_audio):
    audio, _ = sample_audio
    n_fft, hop, win = 512, 160, 320
    r1, i1 = stft(jnp.asarray(audio), n_fft, hop, win, method="fft")
    r2, i2 = stft(jnp.asarray(audio), n_fft, hop, win, method="matmul")
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-2)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-2)


def test_power_spectrum_lengths():
    lengths = jnp.array([16000, 12000, 4800])
    out = np.asarray(power_spectrum_lengths(lengths, 160))
    np.testing.assert_array_equal(out, [101, 76, 31])
    # frames produced match length formula for full-length input
    frames = power_spectrum(jnp.zeros((1, 16000)), 512, 160, 320).shape[1]
    assert frames == 101


def test_preemphasis_matches_reference_math():
    x = np.random.default_rng(0).standard_normal((2, 100)).astype(np.float32)
    got = np.asarray(preemphasis(jnp.asarray(x), 0.97))
    want = np.concatenate([x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mel_filterbank_matches_transformers():
    """Cross-validate the slaney mel matrix against HF transformers'
    independent implementation (same algorithm torchaudio implements for the
    reference's melscale_fbanks call, `quartznet/transform.py:227-239`)."""
    audio_utils = pytest.importorskip("transformers.audio_utils")
    for n_freqs, n_mels, sr in [(257, 64, 16000), (513, 80, 16000), (201, 40, 8000)]:
        theirs = audio_utils.mel_filter_bank(
            num_frequency_bins=n_freqs,
            num_mel_filters=n_mels,
            min_frequency=0.0,
            max_frequency=sr / 2,
            sampling_rate=sr,
            norm="slaney",
            mel_scale="slaney",
        )
        ours = mel_filterbank(n_freqs, n_mels, sr)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(257, 64, 16000)
    assert fb.shape == (257, 64)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=0) > 0).all()
    # peak frequency bins increase monotonically with mel index
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    # slaney norm: filter areas roughly 2/(width) * width/2 -> the weighted sum
    # integral over hz of each filter is ~1 after slaney normalization
    hz_per_bin = 8000.0 / 256
    areas = fb.sum(axis=0) * hz_per_bin
    np.testing.assert_allclose(areas, 1.0, atol=0.35)


def test_mel_filterbank_slaney_breakpoint():
    # below 1 kHz the mel scale is linear: filters are evenly spaced in hz
    fb = mel_filterbank(513, 80, 16000)
    freqs = np.linspace(0, 8000, 513)
    peaks = freqs[fb.argmax(axis=0)]
    low = peaks[peaks < 900]
    if len(low) > 3:
        spacing = np.diff(low)
        assert spacing.std() / spacing.mean() < 0.35


def test_mel_features_pipeline(sample_audio):
    audio, _ = sample_audio
    out = mel_features(jnp.asarray(audio), 16000, 512, 160, 320, 64)
    assert out.shape == (4, 101, 64)
    assert np.isfinite(np.asarray(out)).all()
    # log floor: log(2^-24) for silent input
    silent = mel_features(jnp.zeros((1, 16000)), 16000, 512, 160, 320, 64)
    np.testing.assert_allclose(np.asarray(silent), np.log(2.0**-24), atol=1e-3)
