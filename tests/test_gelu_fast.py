"""Fast polynomial gelu (TPU bf16 path) accuracy envelope."""
def test_fast_gelu_matches_exact_within_bf16_rounding():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from thunder_tpu.models.wav2vec2 import _fast_gelu

    x = jnp.linspace(-12.0, 12.0, 100001, dtype=jnp.float32)
    got = np.asarray(_fast_gelu(x))
    want = np.asarray(jax.nn.gelu(x, approximate=False))
    assert np.abs(got - want).max() < 2.1e-3
    # f32 module compute keeps the exact erf path
    from thunder_tpu.models.wav2vec2 import gelu

    exact = np.asarray(gelu(x))
    np.testing.assert_allclose(exact, want, atol=1e-6)
    # bf16 dispatches to the polynomial
    fast = np.asarray(gelu(x.astype(jnp.bfloat16)).astype(jnp.float32))
    assert np.abs(fast - want).max() < 0.05  # bf16 io rounding dominates
