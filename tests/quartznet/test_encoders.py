import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from thunder_tpu.models import CitrinetEncoder, QuartznetEncoder, SqueezeExcite


def test_quartznet_encoder_shapes():
    enc = QuartznetEncoder(repeat=2, filters=(64, 64), kernel_sizes=(33, 39))
    x = jnp.zeros((2, 100, 64))
    lengths = jnp.array([100, 60])
    variables = enc.init(jax.random.PRNGKey(0), x, lengths)
    out, out_lens = enc.apply(variables, x, lengths)
    # stem halves time; final channels 1024
    assert out.shape == (2, 50, 1024)
    np.testing.assert_array_equal(np.asarray(out_lens), [50, 30])


def test_citrinet_encoder_shapes():
    enc = CitrinetEncoder(filters=(64, 64), kernel_sizes=(13, 15), strides=(1, 2), repeat=2)
    x = jnp.zeros((2, 100, 80))
    lengths = jnp.array([100, 60])
    variables = enc.init(jax.random.PRNGKey(0), x, lengths)
    out, out_lens = enc.apply(variables, x, lengths)
    assert out.shape == (2, 50, 640)
    np.testing.assert_array_equal(np.asarray(out_lens), [50, 30])


def test_bucket_invariance():
    """Same samples in a wider padding bucket must give identical valid
    outputs — the static-shape correctness property that replaces dynamic
    shapes on TPU."""
    enc = QuartznetEncoder(repeat=2, filters=(32,), kernel_sizes=(33,))
    rng = np.random.default_rng(0)
    data = rng.standard_normal((2, 80, 64)).astype(np.float32)
    lengths = jnp.array([80, 51])
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(data), lengths)

    out_a, lens_a = enc.apply(variables, jnp.asarray(data), lengths)
    wide = np.zeros((2, 128, 64), dtype=np.float32)
    wide[:, :80] = data
    out_b, lens_b = enc.apply(variables, jnp.asarray(wide), lengths)

    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_b))
    for i, l in enumerate(np.asarray(lens_a)):
        np.testing.assert_allclose(
            np.asarray(out_a)[i, :l], np.asarray(out_b)[i, :l], atol=1e-5
        )


def test_squeeze_excite_matches_torch_mirror():
    se = SqueezeExcite(reduction_ratio=4)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 16)).astype(np.float32)
    lengths = jnp.array([20, 20])  # full length: matches reference unmasked pool
    variables = se.init(jax.random.PRNGKey(0), jnp.asarray(x), lengths)
    ours = np.asarray(se.apply(variables, jnp.asarray(x), lengths))

    # independent torch mirror of the reference SqueezeExcite (citrinet/blocks.py:48-83)
    xt = torch.tensor(x.transpose(0, 2, 1))
    w1 = torch.tensor(np.asarray(variables["params"]["fc1"]["kernel"]).T)
    w2 = torch.tensor(np.asarray(variables["params"]["fc2"]["kernel"]).T)
    pooled = xt.mean(-1)
    gate = torch.sigmoid(F.linear(F.relu(F.linear(pooled, w1)), w2))
    want = (xt * gate[:, :, None]).numpy()
    np.testing.assert_allclose(ours.transpose(0, 2, 1), want, atol=1e-5)


def test_squeeze_excite_masked_pooling():
    """With padding, the pool must only average valid frames."""
    se = SqueezeExcite(reduction_ratio=4)
    rng = np.random.default_rng(1)
    x_short = rng.standard_normal((1, 10, 8)).astype(np.float32)
    x_padded = np.zeros((1, 25, 8), dtype=np.float32)
    x_padded[:, :10] = x_short
    variables = se.init(jax.random.PRNGKey(0), jnp.asarray(x_short), jnp.array([10]))
    out_short = np.asarray(se.apply(variables, jnp.asarray(x_short), jnp.array([10])))
    out_padded = np.asarray(se.apply(variables, jnp.asarray(x_padded), jnp.array([10])))
    np.testing.assert_allclose(out_short[0], out_padded[0, :10], atol=1e-6)
