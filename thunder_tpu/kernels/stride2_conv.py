"""Fused stride-2 conv + gelu Pallas kernel (wav2vec2 feature extractor).

The wav2vec2 extractor body is six ``conv(k∈{2,3}, stride 2) -> gelu``
layers (reference: HF ``Wav2Vec2FeatureEncoder``, consumed via
`/root/reference/src/thunder/huggingface/compatibility.py`).  Because the
stride equals 2 and the input is channels-last, consecutive frame *pairs*
are contiguous in memory: with the free reshape ``pairs = x.reshape(B, T//2,
2C)`` a stride-2 conv is exactly

    k=2:  out[t] = pairs[t] @ W01                       (one matmul)
    k=3:  out[t] = pairs[t] @ W01 + x[2t+2] @ W2        (+ one halo row)

where ``W01 = [W0; W1]`` stacks the first two taps.  An XLA-level version
of this decomposition is measured-closed (docs/benchmarks.md): the phase
slices materialize half-tensor HBM copies and break XLA's conv+gelu
epilogue fusion.  This kernel performs the same matmuls *inside one Pallas
pass* — the pair view is free, the k=3 halo row rides a second (tiny)
BlockSpec, and the polynomial gelu runs on the f32 accumulator before the
bf16 store — so no intermediate ever touches HBM.

Padding contract (chaining without copies): ``T`` must be a multiple of
``2*bm`` (so the tile grid divides exactly — Pallas partial edge blocks
would otherwise read shifted/undefined data).  The result then carries
``T//2`` time rows: for k=3 the final row (and only it) is garbage — it
would need the input row ``T`` — and for k=2 every row is valid.  Because
the output length ``T//2`` is itself even, layers chain with NO
inter-layer pad/slice: the caller pads the raw audio ONCE so the first
conv emits a ``512``-multiple, then each kernel layer halves it.  Garbage
rows never contaminate valid rows (a valid output row reads only input
rows below the valid input length), so one slice at the end of the chain
suffices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stride2_conv_gelu", "stride2_out_length", "pick_bm"]

BM = 256  # preferred output rows per tile
HALO = 8  # sublane-aligned halo block rows


def stride2_out_length(t: int, k: int) -> int:
    """VALID output length of a stride-2 conv."""
    return (t - k) // 2 + 1


def pick_bm(p: int) -> int:
    """Largest power-of-two tile (≤ BM, ≥ HALO) dividing ``p`` pair rows."""
    bm = BM
    while bm > HALO and p % bm:
        bm //= 2
    return bm


def _gelu_f32(y: jax.Array) -> jax.Array:
    # the ONE minimax polynomial (max err 2e-3, below bf16 rounding) shared
    # with the model-side _fast_gelu — imported lazily (trace time) so the
    # kernel module itself stays import-light
    from thunder_tpu.models.wav2vec2 import _GELU_COEFFS as coeffs

    t = jnp.clip(y, -4.0, 4.0)
    t2 = t * t
    p = jnp.full_like(y, coeffs[-1])
    for c in coeffs[-2::-1]:
        p = p * t2 + c
    phi = 0.5 + t * p
    phi = jnp.where(y > 4.0, 1.0, jnp.where(y < -4.0, 0.0, phi))
    return y * phi


def _kernel3(pairs_ref, halo_ref, w01_ref, w2_ref, bias_ref, out_ref, *, c, out_dtype, bias):
    a = pairs_ref[0]  # (bm, 2C)
    # x[2t+2] for the tile = pairs[t+1][:C]: rows 1..bm of the pair view —
    # the last comes from the halo block (first row of the next tile)
    nxt = jnp.concatenate([a[1:, :c], halo_ref[0, :1, :c]], axis=0)  # (bm, C)
    y = jnp.dot(a, w01_ref[:, :], preferred_element_type=jnp.float32)
    y = y + jnp.dot(nxt, w2_ref[:, :], preferred_element_type=jnp.float32)
    if bias:
        y = y + bias_ref[0, :]
    out_ref[0] = _gelu_f32(y).astype(out_dtype)


def _kernel2(pairs_ref, w01_ref, bias_ref, out_ref, *, out_dtype, bias):
    y = jnp.dot(pairs_ref[0], w01_ref[:, :], preferred_element_type=jnp.float32)
    if bias:
        y = y + bias_ref[0, :]
    out_ref[0] = _gelu_f32(y).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stride2_conv_gelu(x: jax.Array, kernel: jax.Array, bias=None, *, interpret: bool = False) -> jax.Array:
    """Fused ``conv(k, stride=2, VALID) -> gelu`` over channels-last input.

    Args:
        x: ``(B, T, C)`` with ``T`` a multiple of ``2*pick_bm(T//2)``
            (guaranteed when T is a 512-multiple, or any halving of one);
            rows beyond the caller's valid length may be garbage (they
            never reach valid output rows).
        kernel: ``(k, C, Co)`` conv taps, ``k`` in (2, 3).
        bias: optional ``(Co,)``.
        interpret: run the Pallas interpreter (CPU tests).

    Returns:
        ``(B, T//2, Co)`` in ``x.dtype`` — for k=3 the final time row is
        garbage (VALID length is ``T//2 - 1``); for k=2 all rows are valid.
    """
    b, t, c = x.shape
    k, kc, co = kernel.shape
    if k not in (2, 3):
        raise ValueError(f"stride2_conv_gelu supports k in (2, 3), got {k}")
    if kc != c:
        raise ValueError(f"kernel C mismatch: {kc} != {c}")
    p = t // 2
    bm = pick_bm(p)
    if t % (2 * bm):
        raise ValueError(f"time dim {t} must divide the 2*{bm} tile grid")

    nt = p // bm
    pairs = x.reshape(b, p, 2 * c)  # free: frame pairs are contiguous

    w01 = kernel[:2].reshape(2 * c, co).astype(x.dtype)
    has_bias = bias is not None
    bias_arr = (
        jnp.asarray(bias, jnp.float32).reshape(1, co)
        if has_bias
        else jnp.zeros((1, co), jnp.float32)
    )

    if k == 2:
        out = pl.pallas_call(
            functools.partial(_kernel2, out_dtype=x.dtype, bias=has_bias),
            out_shape=jax.ShapeDtypeStruct((b, p, co), x.dtype),
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, bm, 2 * c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * c, co), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bm, co), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(pairs, w01, bias_arr)
        return out

    w2 = kernel[2].astype(x.dtype)  # (C, Co)
    # halo: first pair-row of the NEXT tile.  The index map clamps at the
    # last in-bounds halo block; the clamped (wrong) halo row can only
    # affect the final tile's last output row — exactly the one garbage row
    # beyond the k=3 VALID length (p - 1)
    hmax = max((p - HALO) // HALO, 0)
    halo_blocks = bm // HALO

    out = pl.pallas_call(
        functools.partial(_kernel3, c=c, out_dtype=x.dtype, bias=has_bias),
        out_shape=jax.ShapeDtypeStruct((b, p, co), x.dtype),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, bm, 2 * c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, HALO, 2 * c),
                lambda bi, i: (bi, jnp.minimum((i + 1) * halo_blocks, hmax), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2 * c, co), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, co), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, co), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pairs, pairs, w01, w2, bias_arr)
    return out
