"""Fused residual-add + LayerNorm Pallas kernel (TPU serving path).

The post-LN wav2vec2 encoder layer applies ``LayerNorm(x + sublayer(x))``
twice per layer (reference: ``transformers`` `modeling_wav2vec2.
Wav2Vec2EncoderLayer.forward`, reached via `/root/reference/src/thunder/
huggingface/compatibility.py:65-112`).  XLA lowers that expression as two
loop fusions — an add + f32 stat reduce, then a normalize that re-reads
both inputs — moving ~5 passes of HBM traffic per call.  This kernel does
the whole thing in one pass: read ``x`` and ``y`` once, write
``LN(x + y) * g + b`` once (3 passes), with the row statistics computed
in-register over the feature lanes.

Numerics follow ``flax.linen.LayerNorm`` exactly: float32 statistics,
fast variance ``E[x^2] - E[x]^2`` clipped at zero, float32 normalize with
float32 scale/bias, cast to the compute dtype on the way out.  The single
deviation is that the residual add itself runs in float32 here (the
unfused path adds in bf16 before promoting) — a strictly tighter rounding,
covered by the interpret-mode parity test (tests/wav2vec2/test_add_ln.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, y_ref, g_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32) + y_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    o_ref[...] = (
        (x - mu) * inv * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def add_layer_norm(
    x: jax.Array,
    y: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-5,
    block_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``LayerNorm(x + y) * scale + bias`` over the last axis, one HBM pass.

    ``x``/``y``: ``(..., D)`` with the same shape; ``scale``/``bias``: ``(D,)``.
    Requires ``D % 128 == 0`` (checked by the caller's gate).
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    n = 1
    for s in lead:
        n *= s
    x2 = x.reshape(n, d)
    y2 = y.reshape(n, d)
    bm = block_rows
    while n % bm:
        bm //= 2
    g2 = scale.reshape(1, d).astype(jnp.float32)
    b2 = bias.reshape(1, d).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(n // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        interpret=interpret,
    )(x2, y2, g2, b2)
    return out.reshape(*lead, d)
