"""Full FilterbankFeatures pipeline vs a torch mirror of the reference.

The mirror reproduces `quartznet/transform.py:258-321` with torch primitives:
preemphasis -> torch.stft (hann periodic=False, center) -> |.|^2 -> mel matmul
(matrix cross-validated against transformers.audio_utils at 1e-9, see
tests/test_ops_stft.py) -> log(x + 2^-24) -> masked per-feature normalize.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.ops.stft import mel_filterbank


def _torch_filterbank(audio: np.ndarray, lengths: np.ndarray, n_fft=512, hop=160, win=320, n_mels=64):
    x = torch.tensor(audio)
    # preemphasis (transform.py:121-144)
    x = torch.cat([x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]], dim=1)
    window = torch.hann_window(win, periodic=False)
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop, win_length=win, center=True,
                      window=window, return_complex=True)
    power = spec.abs().pow(2.0)  # (B, F, T)
    fb = torch.tensor(mel_filterbank(n_fft // 2 + 1, n_mels, 16000))  # (F, n_mels)
    mel = torch.matmul(fb.T, power)  # (B, n_mels, T)
    mel = torch.log(mel + 2.0**-24)
    # masked per-feature normalization (blocks.py:118-153, div_guard=1e-5)
    out_lens = torch.tensor(lengths) // hop + 1
    t = mel.shape[-1]
    mask = (torch.arange(t)[None, :] < out_lens[:, None])[:, None, :]
    mel = mel.masked_fill(~mask, 0.0)
    n = mask.sum(-1, keepdim=True)
    mean = mel.sum(-1, keepdim=True) / n
    std = (((mel - mean) * mask).pow(2).sum(-1, keepdim=True) / n).sqrt()
    normed = ((mel - mean) / (std + 1e-5)).masked_fill(~mask, 0.0)
    return normed.numpy(), out_lens.numpy()


def test_filterbank_features_matches_torch_mirror(sample_audio):
    audio, lengths = sample_audio
    ft = FilterbankFeatures(use_fused_kernel=False)
    got, got_lens = ft.apply({}, jnp.asarray(audio), jnp.asarray(lengths), train=False)
    want, want_lens = _torch_filterbank(audio, lengths)

    np.testing.assert_array_equal(np.asarray(got_lens), want_lens)
    # ours is (B, T, F); mirror is (B, F, T)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=2e-3
    )


def test_filterbank_fused_kernel_matches_torch_mirror(sample_audio):
    from thunder_tpu.kernels import fused_log_mel
    from thunder_tpu.ops.masking import masked_feature_normalize
    from thunder_tpu.ops.stft import power_spectrum_lengths

    audio, lengths = sample_audio
    mel = fused_log_mel(jnp.asarray(audio), interpret=True)
    out_lens = power_spectrum_lengths(jnp.asarray(lengths), 160)
    got = masked_feature_normalize(mel, out_lens)
    want, want_lens = _torch_filterbank(audio, lengths)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, atol=2e-3)
