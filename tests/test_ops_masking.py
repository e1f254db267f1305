import jax.numpy as jnp
import numpy as np
import torch

from thunder_tpu.ops import (
    apply_mask,
    conv_output_length,
    get_same_padding,
    lengths_to_mask,
    masked_feature_normalize,
    normalize_tensor,
)


def test_lengths_to_mask_basic():
    mask = lengths_to_mask(jnp.array([3, 1, 0]), 5)
    expected = np.array(
        [
            [True, True, True, False, False],
            [True, False, False, False, False],
            [False, False, False, False, False],
        ]
    )
    np.testing.assert_array_equal(np.asarray(mask), expected)


def test_apply_mask_zeroes_padding():
    x = jnp.ones((2, 4, 3))
    out = apply_mask(x, jnp.array([2, 4]))
    assert float(out[0, 2:].sum()) == 0.0
    assert float(out[1].sum()) == 12.0


def test_normalize_tensor_matches_torch_reference_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 50)).astype(np.float32)
    lengths = np.array([50, 30, 10])
    mask = np.arange(50)[None, :] < lengths[:, None]

    ours = np.asarray(normalize_tensor(jnp.asarray(x), jnp.asarray(mask), div_guard=1e-7, axis=-1))

    # independent torch implementation of the reference math (blocks.py:118-153)
    xt = torch.tensor(x)
    mt = torch.tensor(mask)
    xt = xt.masked_fill(~mt, 0.0)
    n = mt.sum(-1, keepdim=True)
    mean = xt.sum(-1, keepdim=True) / n
    std = (((xt - mean) * mt).pow(2).sum(-1, keepdim=True) / n).sqrt()
    want = ((xt - mean) / (std + 1e-7)).masked_fill(~mt, 0.0).numpy()

    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_normalize_tensor_unmasked_uses_sample_std():
    x = np.linspace(-1, 1, 20, dtype=np.float32)[None]
    ours = np.asarray(normalize_tensor(jnp.asarray(x), None, div_guard=1e-7, axis=-1))
    xt = torch.tensor(x)
    want = ((xt - xt.mean(-1, keepdim=True)) / (xt.var(-1, keepdim=True) + 1e-7).sqrt()).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_masked_feature_normalize_stats():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 40, 8)).astype(np.float32)
    lengths = jnp.array([40, 25])
    out = np.asarray(masked_feature_normalize(jnp.asarray(x), lengths))
    # valid region of sample 1 should be ~zero-mean/unit-std per feature
    valid = out[1, :25]
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(valid.std(axis=0), 1.0, atol=1e-3)
    # padding region zeroed
    assert np.abs(out[1, 25:]).max() == 0.0


def test_same_padding_law():
    # out == ceil(in / stride) for odd kernels (reference tests' padding law)
    for k in [3, 11, 33, 87]:
        for stride in [1, 2]:
            for length in [100, 101, 257]:
                pad = get_same_padding(k, stride, 1)
                out = conv_output_length(length, k, stride, pad, 1)
                assert out == -(-length // stride), (k, stride, length)


def test_same_padding_dilation():
    for k in [3, 11, 87]:
        for dil in [2, 3]:
            pad = get_same_padding(k, 1, dil)
            out = conv_output_length(200, k, 1, pad, dil)
            assert abs(int(out) - 200) <= 1


def test_same_padding_raises_on_stride_and_dilation():
    import pytest

    with pytest.raises(ValueError):
        get_same_padding(3, 2, 2)


def test_conv_output_length_matches_torch():
    for k, s, p, d in [(33, 2, 16, 1), (87, 1, 87, 2), (1, 1, 0, 1), (5, 3, 2, 1)]:
        conv = torch.nn.Conv1d(1, 1, k, stride=s, padding=p, dilation=d)
        x = torch.zeros(1, 1, 500)
        want = conv(x).shape[-1]
        got = conv_output_length(500, k, s, p, d)
        assert int(got) == want
