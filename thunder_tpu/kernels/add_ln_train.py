"""Fused residual-add + dropout + LayerNorm for TRAINING (custom_vjp).

The eval-side ``kernels/add_ln.py`` fuses ``LN(x + y)`` into one HBM pass
for serving; training kept the unfused expression for autodiff.  This
module closes that: ``o = LN(x + dropout(y))`` as a forward Pallas kernel
plus a backward kernel, wired through ``custom_vjp`` — covering the two
post-norm sites per wav2vec2 layer where HF applies hidden-state dropout
before the residual LayerNorm (`modeling_wav2vec2.Wav2Vec2Attention` /
``feed_forward`` -> ``Wav2Vec2EncoderLayer``; the reference reaches them
through ``AutoModelForCTC``, `/root/reference/src/thunder/huggingface/
compatibility.py:65-112`).

Design (same playbook as ``attn_train``):

- the dropout keep mask is generated IN-KERNEL with the Mosaic PRNG,
  seeded per ``(seed, row-block)``, and regenerated bit-identically in the
  backward — never stored;
- the forward saves NO statistics: the backward re-reads x/y, regenerates
  the mask, and recomputes mean/rstd (a lane reduction — cheap VPU) before
  applying the standard LayerNorm backward;
- dgamma/dbeta accumulate in an ``(8, D)`` f32 scratch across the
  sequential row-block grid (each block pre-reduces its rows 8-way), so
  the parameter grads cost no extra HBM pass.

Row-block layout: inputs flattened to ``(rows, D)``; D must tile the
128-lane axis and rows the 8-sublane axis (the caller gates on this).
Measured end-to-end effect and numerics gates: docs/benchmarks.md round-5
and the ``add_ln_train`` selftest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["add_ln_dropout_train", "dropout_keep_mask"]

_ROWS = 256  # rows per grid step


def _keep_mask(seed, block, shape, rate):
    pltpu.prng_seed(seed, block)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u = pltpu.bitcast(bits >> 9, jnp.int32).astype(jnp.float32) * (2.0**-23)
    return u >= rate


def _fwd_kernel(seed_ref, x_ref, y_ref, scale_ref, bias_ref, o_ref, *, rate, eps):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    y = y_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0], i, y.shape, rate)
        y = jnp.where(keep, y * (1.0 / (1.0 - rate)), 0.0)
    s = x + y
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(s * s, axis=-1, keepdims=True) - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    out = (s - mu) * (rstd * scale_ref[...]) + bias_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, x_ref, y_ref, scale_ref, do_ref,
    dx_ref, dy_ref, dg_ref, db_ref, dg_acc, db_acc, *, rate, eps,
):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    y = y_ref[...].astype(jnp.float32)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0], i, y.shape, rate)
        yd = jnp.where(keep, y * inv_keep, 0.0)
    else:
        keep = None
        yd = y
    s = x + yd
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(s * s, axis=-1, keepdims=True) - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    shat = (s - mu) * rstd

    do = do_ref[...].astype(jnp.float32)
    g = do * scale_ref[...]
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gsm = jnp.mean(g * shat, axis=-1, keepdims=True)
    ds = rstd * (g - gm - shat * gsm)
    dx_ref[...] = ds.astype(dx_ref.dtype)
    dy = jnp.where(keep, ds * inv_keep, 0.0) if rate > 0.0 else ds
    dy_ref[...] = dy.astype(dy_ref.dtype)

    # parameter grads: reduce the block's rows, accumulate across the
    # sequential grid in f32 scratch, write every step (last wins)
    dg_part = jnp.sum(do * shat, axis=0, keepdims=True)
    db_part = jnp.sum(do, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dg_acc[...] = jnp.zeros(dg_acc.shape, dg_acc.dtype)
        db_acc[...] = jnp.zeros(db_acc.shape, db_acc.dtype)

    dg_acc[0:1, :] += dg_part
    db_acc[0:1, :] += db_part
    dg_ref[...] = dg_acc[...]
    db_ref[...] = db_acc[...]


def _fwd_call(x2, y2, scale, bias, seed, rate, eps, interpret):
    rows, d = x2.shape
    nb = rows // _ROWS
    blk = pl.BlockSpec((_ROWS, d), lambda i, seed: (i, 0))
    vec = pl.BlockSpec((1, d), lambda i, seed: (0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, eps=eps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[blk, blk, vec, vec],
            out_specs=blk,
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), x2.dtype),
        interpret=interpret,
    )(seed, x2, y2, scale.reshape(1, d), bias.reshape(1, d))


def _bwd_call(x2, y2, scale, do, seed, rate, eps, interpret):
    rows, d = x2.shape
    nb = rows // _ROWS
    blk = pl.BlockSpec((_ROWS, d), lambda i, seed: (i, 0))
    vec = pl.BlockSpec((1, d), lambda i, seed: (0, 0))
    acc = pl.BlockSpec((8, d), lambda i, seed: (0, 0))
    dx, dy, dg8, db8 = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, eps=eps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[blk, blk, vec, blk],
            out_specs=[blk, blk, acc, acc],
            scratch_shapes=[
                pltpu.VMEM((8, d), jnp.float32),
                pltpu.VMEM((8, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ],
        interpret=interpret,
    )(seed, x2, y2, scale.reshape(1, d), do)
    return dx, dy, dg8.sum(axis=0), db8.sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _core(x2, y2, scale, bias, seed, rate, eps, interpret):
    return _fwd_call(x2, y2, scale, bias, seed, rate, eps, interpret)


def _core_fwd(x2, y2, scale, bias, seed, rate, eps, interpret):
    o = _fwd_call(x2, y2, scale, bias, seed, rate, eps, interpret)
    return o, (x2, y2, scale, seed)


def _core_bwd(rate, eps, interpret, res, do):
    x2, y2, scale, seed = res
    dx, dy, dg, db = _bwd_call(x2, y2, scale, do, seed, rate, eps, interpret)
    return dx, dy, dg, db, None


_core.defvjp(_core_fwd, _core_bwd)


def add_ln_dropout_train(
    x: jax.Array,
    y: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    seed: jax.Array,
    dropout_rate: float = 0.0,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """``LayerNorm(x + dropout(y))`` fused, differentiable in x/y/scale/bias.

    ``x``/``y``: ``(..., D)`` with D a multiple of 128 and the flattened row
    count a multiple of 256 (callers gate — see ``_use_fused_add_ln_train``).
    ``seed``: int32 ``(1,)``; ignored at ``dropout_rate == 0``.  Statistics
    and the normalize run in f32 (identical math to ``_AddLayerNorm``'s
    unfused path); the dropout mask is the kernel's own Mosaic-PRNG mask
    (deterministic per seed; recoverable via :func:`dropout_keep_mask`).
    """
    d = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    if d % 128 or rows % _ROWS:
        raise ValueError(f"add_ln_dropout_train needs D%128==0 and rows%{_ROWS}==0, got {x.shape}")
    if not 0.0 <= dropout_rate < 1.0:
        raise ValueError(f"dropout_rate must be in [0, 1), got {dropout_rate}")
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    x2 = x.reshape(rows, d)
    y2 = y.reshape(rows, d)
    o = _core(
        x2, y2, scale.astype(jnp.float32), bias.astype(jnp.float32), seed,
        float(dropout_rate), float(eps), bool(interpret),
    )
    return o.reshape(x.shape)


def dropout_keep_mask(shape, seed, dropout_rate: float, interpret: bool = False) -> jax.Array:
    """The exact keep mask ``add_ln_dropout_train`` applies for ``seed`` —
    same PRNG stream, seeding, and block layout.  Test/debug helper."""
    d = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s

    def kernel(seed_ref, m_ref):
        i = pl.program_id(0)
        m_ref[...] = _keep_mask(seed_ref[0], i, m_ref.shape, dropout_rate).astype(jnp.float32)

    m = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows // _ROWS,),
            in_specs=[],
            out_specs=pl.BlockSpec((_ROWS, d), lambda i, seed: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    return m.reshape(shape)
