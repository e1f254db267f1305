"""Fused residual-add+LayerNorm: fallback bit-exactness + kernel parity.

The serving engine routes ``LayerNorm(x + y)`` through the one-pass Pallas
kernel (kernels/add_ln.py); everywhere else ``_AddLayerNorm`` must match
flax's ``nn.LayerNorm`` applied to ``x + y`` bit-for-bit so training and
checkpoint numerics are unchanged (reference semantics:
``transformers`` Wav2Vec2EncoderLayer post-LN, reached via
/root/reference/src/thunder/huggingface/compatibility.py:65-112).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.kernels.add_ln import add_layer_norm
from thunder_tpu.models.wav2vec2 import _AddLayerNorm


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fallback_matches_flax_layernorm_bitexact(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 96, 256)), dtype)
    y = jnp.asarray(rng.standard_normal((4, 96, 256)), dtype)

    ref = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    ref_params = ref.init(jax.random.PRNGKey(0), x + y)
    # non-trivial scale/bias
    ref_params = {
        "params": {
            "scale": jnp.asarray(rng.standard_normal(256).astype(np.float32) + 1.0),
            "bias": jnp.asarray(rng.standard_normal(256).astype(np.float32)),
        }
    }
    want = ref.apply(ref_params, x + y)

    mod = _AddLayerNorm(epsilon=1e-5, dtype=dtype)
    got = mod.apply(ref_params, x, y, train=True)  # train => always fallback
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape", [(4, 96, 256), (2, 128, 768), (1, 8, 128)])
def test_kernel_interpret_matches_flax(shape):
    rng = np.random.default_rng(1)
    d = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(d).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.standard_normal(d).astype(np.float32))

    ref = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    want = np.asarray(
        ref.apply({"params": {"scale": scale, "bias": bias}}, x + y), np.float32
    )
    got = np.asarray(
        add_layer_norm(x, y, scale, bias, eps=1e-5, interpret=True), np.float32
    )
    assert got.shape == want.shape
    # kernel adds in f32 (tighter than the bf16 reference add): bf16-level tol
    np.testing.assert_allclose(got, want, atol=4e-2, rtol=4e-2)


def test_kernel_handles_row_blocks():
    # rows not divisible by the default block: bm halves until it divides
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 8, 128)), jnp.bfloat16)
    y = jnp.zeros_like(x)
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    out = add_layer_norm(x, y, scale, bias, interpret=True)
    assert out.shape == x.shape
    row = np.asarray(out, np.float32)[0, 0]
    assert abs(row.mean()) < 5e-2 and abs(row.std() - 1.0) < 5e-2
