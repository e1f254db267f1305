import jax
import jax.numpy as jnp
import numpy as np

from thunder_tpu.ops import spec_augment, spec_cutout


def test_spec_augment_zeroes_bands():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 100, 64))
    out = np.asarray(spec_augment(rng, x, time_masks=2, freq_masks=2, time_width=20, freq_width=10))
    assert out.shape == x.shape
    # some band zeroed, most kept
    zero_frac = (out == 0).mean()
    assert 0 < zero_frac < 0.9
    # masks shared across batch (torchaudio mask_along_axis semantics)
    np.testing.assert_array_equal(out[0] == 0, out[1] == 0)


def test_spec_augment_width_bound():
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((1, 200, 64))
    out = np.asarray(spec_augment(rng, x, time_masks=1, time_width=15))
    zero_t = (out[0] == 0).all(axis=1)
    assert zero_t.sum() <= 15


def test_spec_augment_deterministic_per_key():
    x = jnp.ones((1, 50, 32))
    a = spec_augment(jax.random.PRNGKey(7), x, time_masks=1, freq_masks=1)
    b = spec_augment(jax.random.PRNGKey(7), x, time_masks=1, freq_masks=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spec_cutout_rectangles():
    rng = jax.random.PRNGKey(2)
    x = jnp.ones((2, 100, 64))
    out = np.asarray(spec_cutout(rng, x, rect_masks=3, time_width=10, freq_width=15))
    assert out.shape == x.shape
    assert (out == 0).any()
    # zeros form rectangles: rows with zeros should share the same zero columns
    zmask = out[0] == 0
    rows = np.where(zmask.any(axis=1))[0]
    if len(rows) > 1:
        cols0 = set(np.where(zmask[rows[0]])[0].tolist())
        assert all(set(np.where(zmask[r])[0].tolist()) <= cols0 or cols0 <= set(np.where(zmask[r])[0].tolist()) for r in rows[:5])


def test_no_masks_is_identity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 30, 8)).astype(np.float32))
    out = spec_augment(jax.random.PRNGKey(0), x, time_masks=0, freq_masks=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
