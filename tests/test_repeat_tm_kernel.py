"""Interpret-mode correctness of the time-major fused repeat kernel.

The kernel is an opt-in/experimental path (see its module docstring for the
measured v5e results); this pins its numerics against a pure-numpy reference
including masking, channel change, no-relu, and multi-tile windows.
"""
import jax
import numpy as np
import jax.numpy as jnp
import pytest
from thunder_tpu.kernels.repeat_tm import fused_repeat_tm

def ref_repeat(x_tbc, lengths, dw, pw, scale, bias, k, relu):
    # numpy reference in (T, B, C)
    T, B, C = x_tbc.shape
    pad = k // 2
    xp = np.pad(x_tbc, ((pad, k - 1 - pad), (0, 0), (0, 0)))
    y = np.zeros((T, B, C), np.float32)
    for j in range(k):
        y += xp[j:j+T] * dw[j][None, None, :]
    z = y.reshape(T*B, C) @ pw
    z = z * scale + bias
    if relu:
        z = np.maximum(z, 0.0)
    z = z.reshape(T, B, -1)
    for b in range(B):
        z[lengths[b]:, b, :] = 0.0
    return z

rng = np.random.default_rng(0)


@pytest.mark.parametrize(
    "T,B,C,CO,k,relu",
    [(256, 16, 128, 128, 9, True), (384, 32, 256, 128, 33, False), (128, 16, 128, 256, 5, True)],
)
def test_fused_repeat_tm_matches_reference(T, B, C, CO, k, relu):
    x = (rng.standard_normal((T, B, C)) * 0.1).astype(np.float32)
    lengths = rng.integers(T // 2, T + 1, size=(B,)).astype(np.int32)
    for b in range(B):
        x[lengths[b]:, b, :] = 0.0
    dw = (rng.standard_normal((k, C)) * 0.1).astype(np.float32)
    pw = (rng.standard_normal((C, CO)) * 0.05).astype(np.float32)
    scale = rng.standard_normal(CO).astype(np.float32)
    bias = rng.standard_normal(CO).astype(np.float32)
    want = ref_repeat(x, lengths, dw, pw, scale, bias, k, relu)
    got = np.asarray(fused_repeat_tm(jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(dw), jnp.asarray(pw), jnp.asarray(scale), jnp.asarray(bias), kernel_size=k, relu=relu, interpret=True))
    err = np.abs(want - got).max()
    assert err < 1e-4
