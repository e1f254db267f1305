"""One-panel MHA training kernel: custom_vjp forward+backward at dh=64.

Training counterpart of ``attn_onepanel.mha_from_qkv`` (serving, fwd-only).
The reference reaches wav2vec2 finetuning through HF ``AutoModelForCTC`` +
Lightning (`/root/reference/src/thunder/finetune.py:19-88`,
`/root/reference/src/thunder/huggingface/compatibility.py:65-112`); its
flagship finetune default keeps ``attention_dropout=0.1``.  Motivation, from
the round-4 measurements (docs/benchmarks.md):

- jax's stock flash backward runs ~13-20 TFLOPS at dh=64 (dq/dkv block sweep
  measured flat): every backward matmul contracts or produces a 64-wide
  panel, half-idling the 128-lane MXU, and the kernel's in-loop ``p.T`` /
  ``ds.T`` tile transposes are Mosaic relayouts.  Measured cost: 8.7
  ms/layer fwd+bwd vs a 4.35 ms analytic floor — the single biggest gap in
  the training step.
- dropout on the attention probabilities forced the materialized-score
  fallback (the stock flash kernel has no prob dropout), so the HF-default
  ``attention_dropout=0.1`` config could not ride flash at all.

This kernel fixes both with the same head-pair lane packing as the serving
kernel: each grid step processes two adjacent dh=64 heads as one 128-lane
panel, so every matmul in BOTH directions is full-width, and q/k/v panels
are BlockSpec-sliced straight from the packed ``(B, T, 3H)`` qkv GEMM output
(the backward likewise emits a packed ``[dq | dk | dv]`` cotangent, so the
qkv GEMM's weight/input grads consume it with zero layout work).

Dropout runs IN-KERNEL with the Mosaic PRNG, seeded per
``(seed, batch, head_pair, 128-row q slab)`` — stateless and invariant to
the fwd/bwd q-block tilings (which differ at long T), so the mask is
regenerated bit-identically in the backward, never stored
(an (B, H, T, T) mask tensor would be 54 GB at the train shape).  The
backward identity ``rowsum(P (.) dP) = rowsum(dO (.) O)`` survives dropout
(with ``P_d = P (.) M/keep``: ``rowsum(P (.) dP) = rowsum(P_d (.) dP_d) =
dO . O``), so the backward needs only ``o``/``do`` — no stats are saved and
the softmax is recomputed from the scores panel already needed for ``ds``.

Backward layout: one grid step per (batch, head pair) holds the full k/v
panels in VMEM, loops the q blocks, writes each packed dq block, and
accumulates dk/dv in f32 scratch — no cross-step accumulation, no tile
transposes (the transposed contractions use ``dot_general`` over the
sublane dim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mha_train"]

_NEG = float(jnp.finfo(jnp.float32).min)


def _dot_nt(a, b):  # (m, k) x (n, k) -> (m, n)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_nn(a, b):  # (m, k) x (k, n) -> (m, n)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_tn(a, b):  # (k, m) x (k, n) -> (m, n)  (contract sublane dim)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


#: dropout masks are generated in fixed slabs of this many query rows,
#: keyed on the ABSOLUTE slab index — NOT on the kernel's q-block index —
#: so the forward and backward regenerate bit-identical bits even when they
#: tile the q dimension differently (at t > 1024 the forward runs bq=256
#: while the backward's VMEM cap is bq=128; keying on the q-block index
#: made the backward apply a different mask than the forward, caught by the
#: block_q_bwd invariance check in tests/wav2vec2/test_attn_train.py)
_MASK_ROWS = 128


def _dropout_keep_masks(seed, b, hp, row0, shape, rate):
    """Two deterministic keep masks (head lo, head hi) for q rows
    ``[row0, row0 + shape[0])``.

    Each 128-row slab is seeded on ``(seed, slab_index)`` (Mosaic allows at
    most two seed words, so batch/head-pair/row-slab fold into one unique
    integer) and drawn in a fixed order/shape, so ANY q-block tiling of the
    callers regenerates bit-identical masks.  uint32 bits -> [0, 1) floats
    via the top 23 bits (exact in f32); keep where u >= rate.
    """
    bq, t = shape

    def uniform01():
        # logical shift needs unsigned bits (prng_random_bits returns int32;
        # an arithmetic >> would sign-extend and skew the distribution)
        bits = pltpu.bitcast(pltpu.prng_random_bits((_MASK_ROWS, t)), jnp.uint32)
        # logical shift leaves 23 bits; go back through int32 for the f32
        # cast (Mosaic has no uint32 -> f32 conversion)
        return pltpu.bitcast(bits >> 9, jnp.int32).astype(jnp.float32) * (2.0**-23)

    # generate every 128-row slab the block touches, then slice the block
    # out.  row0 is a traced program_id product in the forward (where bq is
    # always a multiple of 128, so blocks are slab-aligned) and a python int
    # in the backward's unrolled q loop (where odd bq like 192 may split a
    # slab).
    if isinstance(row0, int):
        slab0 = row0 // _MASK_ROWS
        nslab = (row0 + bq + _MASK_ROWS - 1) // _MASK_ROWS - slab0
        off = row0 - slab0 * _MASK_ROWS
    else:
        if bq % _MASK_ROWS:
            raise ValueError(
                f"dropout q blocks must be multiples of {_MASK_ROWS} rows "
                f"when the row offset is dynamic, got {bq}"
            )
        slab0 = row0 // _MASK_ROWS  # traced; prng_seed accepts dynamic ints
        nslab = bq // _MASK_ROWS
        off = 0
    lo_parts, hi_parts = [], []
    for i in range(nslab):
        pltpu.prng_seed(seed, (b * pl.num_programs(1) + hp) * 4096 + slab0 + i)
        lo_parts.append(uniform01() >= rate)
        hi_parts.append(uniform01() >= rate)
    lo = lo_parts[0] if nslab == 1 else jnp.concatenate(lo_parts, 0)
    hi = hi_parts[0] if nslab == 1 else jnp.concatenate(hi_parts, 0)
    if off or lo.shape[0] != bq:
        lo = jax.lax.slice_in_dim(lo, off, off + bq, axis=0)
        hi = jax.lax.slice_in_dim(hi, off, off + bq, axis=0)
    return lo, hi


def _addmask(lens_b, bq_rows, t):
    return jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) < lens_b,
        jnp.zeros((1, t), jnp.float32),
        jnp.full((1, t), _NEG),
    )


def _fwd_kernel(seed_ref, lens_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale, t, rate):
    b, hp, qb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q = q_ref[0] * jnp.asarray(sm_scale, q_ref.dtype)  # (bq, 128): heads (2h, 2h+1)
    k = k_ref[0]
    v = v_ref[0]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k_lo = jnp.where(lane_k < 64, k, jnp.zeros_like(k))
    k_hi = jnp.where(lane_k >= 64, k, jnp.zeros_like(k))
    s_lo = _dot_nt(q, k_lo)  # (bq, t) head 2h scores (hi lanes of k are zero)
    s_hi = _dot_nt(q, k_hi)
    addmask = _addmask(lens_ref[b], q.shape[0], t)

    def expm(s):
        s = s + addmask
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        return p.astype(q_ref.dtype), jnp.sum(p, axis=1, keepdims=True)

    p_lo, z_lo = expm(s_lo)
    p_hi, z_hi = expm(s_hi)
    bq = q.shape[0]
    if rate > 0.0 and t > 1024 and bq > _MASK_ROWS:
        # per-128-row-slab masking with direct output stores: each slab's
        # mask is generated at shape (128, t) (one PRNG seed, no concatenate
        # — measured 6.03 vs 6.50 ms/chain at T=1536 against materializing
        # the (256, t) mask) and the p @ v matmul splits into per-slab
        # halves of identical total FLOPs.  At t <= 1024 the concatenated
        # mask is cheaper (4.46 vs 4.67 at T=768), so this path gates on t.
        # Both paths consume identical slab-keyed bits.  The 1/keep dropout
        # scale folds into the deferred softmax division.
        lane_o = jax.lax.broadcasted_iota(jnp.int32, (_MASK_ROWS, v.shape[1]), 1)
        row_slice = lambda a, r0: jax.lax.slice_in_dim(a, r0, r0 + _MASK_ROWS, axis=0)
        for i in range(bq // _MASK_ROWS):
            r0 = i * _MASK_ROWS
            keep_lo, keep_hi = _dropout_keep_masks(
                seed_ref[0], b, hp, qb * bq + r0, (_MASK_ROWS, t), rate
            )
            pl_i = jnp.where(keep_lo, row_slice(p_lo, r0), jnp.zeros((), p_lo.dtype))
            ph_i = jnp.where(keep_hi, row_slice(p_hi, r0), jnp.zeros((), p_hi.dtype))
            o_lo = _dot_nn(pl_i, v) / (row_slice(z_lo, r0) * (1.0 - rate))
            o_hi = _dot_nn(ph_i, v) / (row_slice(z_hi, r0) * (1.0 - rate))
            o_ref[0, pl.ds(r0, _MASK_ROWS), :] = jnp.where(lane_o < 64, o_lo, o_hi).astype(o_ref.dtype)
        return
    if rate > 0.0:
        keep_lo, keep_hi = _dropout_keep_masks(
            seed_ref[0], b, hp, qb * bq, p_lo.shape, rate
        )
        p_lo = jnp.where(keep_lo, p_lo, jnp.zeros_like(p_lo))
        p_hi = jnp.where(keep_hi, p_hi, jnp.zeros_like(p_hi))
        # fold the 1/keep dropout scale into the deferred softmax division
        z_lo = z_lo * (1.0 - rate)
        z_hi = z_hi * (1.0 - rate)
    o_lo = _dot_nn(p_lo, v) / z_lo  # lanes <64 valid (head 2h)
    o_hi = _dot_nn(p_hi, v) / z_hi
    lane_o = jax.lax.broadcasted_iota(jnp.int32, o_lo.shape, 1)
    o_ref[0] = jnp.where(lane_o < 64, o_lo, o_hi).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, lens_ref, q_ref, k_ref, v_ref, o_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, sm_scale, t, bq, rate,
):
    b, hp = pl.program_id(0), pl.program_id(1)
    dt = q_ref.dtype
    k = k_ref[0]
    v = v_ref[0]
    lane_kv = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k_lo = jnp.where(lane_kv < 64, k, jnp.zeros_like(k))
    k_hi = jnp.where(lane_kv >= 64, k, jnp.zeros_like(k))
    v_lo = jnp.where(lane_kv < 64, v, jnp.zeros_like(v))
    v_hi = jnp.where(lane_kv >= 64, v, jnp.zeros_like(v))
    addmask = _addmask(lens_ref[b], bq, t)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    dk_acc[...] = jnp.zeros(dk_acc.shape, dk_acc.dtype)
    dv_acc[...] = jnp.zeros(dv_acc.shape, dv_acc.dtype)

    for qb in range(t // bq):
        sl = pl.ds(qb * bq, bq)
        q = q_ref[0, sl, :] * jnp.asarray(sm_scale, dt)
        do = do_ref[0, sl, :]
        o = o_ref[0, sl, :]
        # recompute the softmax (scores are needed for ds anyway; cheaper
        # than storing/reloading per-row stats in an off-lane layout)
        s_lo = _dot_nt(q, k_lo) + addmask
        s_hi = _dot_nt(q, k_hi) + addmask
        m_lo = jnp.max(s_lo, axis=1, keepdims=True)
        m_hi = jnp.max(s_hi, axis=1, keepdims=True)
        e_lo = jnp.exp(s_lo - m_lo)  # (bq, t) f32, unnormalized probs
        e_hi = jnp.exp(s_hi - m_hi)
        inv_z_lo = 1.0 / jnp.sum(e_lo, axis=1, keepdims=True)
        inv_z_hi = 1.0 / jnp.sum(e_hi, axis=1, keepdims=True)

        # delta = rowsum(dO (.) O) per head (valid under dropout, see module
        # docstring)
        lane_q = jax.lax.broadcasted_iota(jnp.int32, do.shape, 1)
        prod = do.astype(jnp.float32) * o.astype(jnp.float32)
        delta_lo = jnp.sum(jnp.where(lane_q < 64, prod, 0.0), axis=1, keepdims=True)
        delta_hi = jnp.sum(jnp.where(lane_q >= 64, prod, 0.0), axis=1, keepdims=True)

        # dP_d = dO V^T per head (v lane-masked; dO's other-head lanes hit
        # the zeroed v lanes and contribute nothing)
        dp_lo = _dot_nt(do, v_lo)
        dp_hi = _dot_nt(do, v_hi)
        if rate > 0.0:
            keep_lo, keep_hi = _dropout_keep_masks(
                seed_ref[0], b, hp, qb * bq, (bq, t), rate
            )
            dpm_lo = jnp.where(keep_lo, dp_lo * inv_keep, 0.0)
            dpm_hi = jnp.where(keep_hi, dp_hi * inv_keep, 0.0)
        else:
            keep_lo = keep_hi = None
            dpm_lo, dpm_hi = dp_lo, dp_hi
        # dS = P (.) (dP - delta), P = e / z
        ds_lo = (e_lo * (dpm_lo - delta_lo) * inv_z_lo).astype(dt)
        ds_hi = (e_hi * (dpm_hi - delta_hi) * inv_z_hi).astype(dt)

        # dq block: k lane-masked per head; contributions land in each
        # head's own lanes and sum into the packed panel
        dq = (_dot_nn(ds_lo, k_lo) + _dot_nn(ds_hi, k_hi)) * sm_scale
        dq_ref[0, sl, :] = dq.astype(dq_ref.dtype)

        # dk += dS^T q-hat, dv += P_d^T dO' — transposed contractions over
        # the q (sublane) dim, q/do lane-masked per head
        lane128 = lane_q
        q_lo = jnp.where(lane128 < 64, q, jnp.zeros_like(q))
        q_hi = jnp.where(lane128 >= 64, q, jnp.zeros_like(q))
        dk_acc[...] += _dot_tn(ds_lo, q_lo) + _dot_tn(ds_hi, q_hi)

        # dv: P_d rows scaled by 1/(z*keep) folded into dO instead (rank-1
        # row scale), so the bf16 prob panel is reused unscaled
        inv_zk_lo = inv_z_lo * inv_keep
        inv_zk_hi = inv_z_hi * inv_keep
        dof = do.astype(jnp.float32)
        doz_lo = jnp.where(lane128 < 64, dof * inv_zk_lo, 0.0).astype(dt)
        doz_hi = jnp.where(lane128 >= 64, dof * inv_zk_hi, 0.0).astype(dt)
        pu_lo = e_lo.astype(dt)
        pu_hi = e_hi.astype(dt)
        if rate > 0.0:
            pu_lo = jnp.where(keep_lo, pu_lo, jnp.zeros_like(pu_lo))
            pu_hi = jnp.where(keep_hi, pu_hi, jnp.zeros_like(pu_hi))
        dv_acc[...] += _dot_tn(pu_lo, doz_lo) + _dot_tn(pu_hi, doz_hi)

    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _pick_bq(block_q: int, t: int) -> int:
    bq = min(block_q, t)
    while t % bq:
        bq //= 2
    return bq


def _fwd_call(qkv, lengths, seed, heads, rate, block_q, interpret):
    b, t, h3 = qkv.shape
    h = h3 // 3
    pairs = heads // 2
    dh = h // heads
    bq = _pick_bq(block_q, t)
    if rate > 0.0 and bq % 128:
        bq = _pick_bq(128, t)  # the per-slab dropout path needs 128-row tiles
    kernel = functools.partial(_fwd_kernel, sm_scale=dh**-0.5, t=t, rate=rate)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, pairs, t // bq),
            in_specs=[
                pl.BlockSpec((1, bq, 128), lambda b, hp, tq, seed, lens: (b, tq, hp)),
                pl.BlockSpec((1, t, 128), lambda b, hp, tq, seed, lens: (b, 0, pairs + hp)),
                pl.BlockSpec((1, t, 128), lambda b, hp, tq, seed, lens: (b, 0, 2 * pairs + hp)),
            ],
            out_specs=pl.BlockSpec((1, bq, 128), lambda b, hp, tq, seed, lens: (b, tq, hp)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
        interpret=interpret,
    )(seed, lengths, qkv, qkv, qkv)


def _bwd_call(qkv, o, do, lengths, seed, heads, rate, block_q, interpret, block_q_bwd=None):
    b, t, h3 = qkv.shape
    h = h3 // 3
    pairs = heads // 2
    dh = h // heads
    # smaller q blocks at long T keep the f32 score/ds panels inside VMEM
    # (the T=1536 sweep in scripts/bench_attn_train_long.py confirmed 128 as
    # the optimum there; block_q_bwd overrides for experiments)
    if block_q_bwd is None:
        block_q_bwd = block_q if t <= 1024 else min(block_q, 128)
    bq = _pick_bq(block_q_bwd, t)
    kernel = functools.partial(_bwd_kernel, sm_scale=dh**-0.5, t=t, bq=bq, rate=rate)
    grid = (b, pairs)
    panel = lambda which: pl.BlockSpec(
        (1, t, 128), functools.partial(lambda w, b, hp, seed, lens: (b, 0, w * pairs + hp), which)
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                panel(0),  # q
                panel(1),  # k
                panel(2),  # v
                pl.BlockSpec((1, t, 128), lambda b, hp, seed, lens: (b, 0, hp)),  # o
                pl.BlockSpec((1, t, 128), lambda b, hp, seed, lens: (b, 0, hp)),  # do
            ],
            out_specs=[
                pl.BlockSpec((1, t, 128), lambda b, hp, seed, lens: (b, 0, hp)),
                pl.BlockSpec((1, t, 128), lambda b, hp, seed, lens: (b, 0, hp)),
                pl.BlockSpec((1, t, 128), lambda b, hp, seed, lens: (b, 0, hp)),
            ],
            scratch_shapes=[
                pltpu.VMEM((t, 128), jnp.float32),
                pltpu.VMEM((t, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
            jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
            jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
        ],
        interpret=interpret,
    )(seed, lengths, qkv, qkv, qkv, o, do)
    # packed [dq | dk | dv] — the qkv GEMM's vjp consumes it directly
    return jnp.concatenate([dq, dk, dv], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _mha_train(qkv, lengths, seed, heads, rate, block_q, interpret, block_q_bwd):
    return _fwd_call(qkv, lengths, seed, heads, rate, block_q, interpret)


def _mha_train_fwd(qkv, lengths, seed, heads, rate, block_q, interpret, block_q_bwd):
    o = _fwd_call(qkv, lengths, seed, heads, rate, block_q, interpret)
    return o, (qkv, o, lengths, seed)


def _mha_train_bwd(heads, rate, block_q, interpret, block_q_bwd, res, do):
    qkv, o, lengths, seed = res
    dqkv = _bwd_call(
        qkv, o, do, lengths, seed, heads, rate, block_q, interpret,
        block_q_bwd=block_q_bwd,
    )
    return dqkv, None, None


_mha_train.defvjp(_mha_train_fwd, _mha_train_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dropout_rate", "block_q", "interpret", "block_q_bwd"),
)
def mha_train(
    qkv: jax.Array,
    lengths: jax.Array,
    seed: jax.Array,
    heads: int,
    dropout_rate: float = 0.0,
    block_q: int = 256,
    interpret: bool = False,
    block_q_bwd: int | None = None,
) -> jax.Array:
    """Differentiable multi-head attention over packed ``(B, T, 3H)`` qkv.

    ``qkv``: the fused projection output laid out ``[q | k | v]`` on the last
    axis (head-major within each third — what ``_Dense(3h)`` produces).
    ``lengths``: int32 ``(B,)`` valid key counts (contiguous prefix).
    ``seed``: int32 ``(1,)`` dropout seed; ignored when ``dropout_rate`` is 0
    (pass a fresh value per layer per step — the kernel folds in batch/head/
    block indices itself).  Query scaling (``dh**-0.5``) happens in-kernel.
    Returns ``(B, T, H)``; its cotangent is the packed ``[dq | dk | dv]``.

    Requires dh == 64, an even head count, and T a multiple of 128 (callers
    hoist the frame pad, see ``Wav2Vec2Encoder.__call__``).  Padded queries
    attend uniformly over the masked panel; their cotangents are zero in any
    length-masked loss, so the uniform rows contribute no gradient.
    """
    b, t, h3 = qkv.shape
    h = h3 // 3
    dh = h // heads
    if dh != 64 or heads % 2:
        raise ValueError(f"mha_train requires dh==64 and even heads, got dh={dh}, heads={heads}")
    if t % 128:
        raise ValueError(f"T={t} must be a multiple of 128 (hoist the frame pad)")
    if not 0.0 <= dropout_rate < 1.0:
        raise ValueError(f"dropout_rate must be in [0, 1), got {dropout_rate}")
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    return _mha_train(
        qkv, lengths.astype(jnp.int32), seed, heads, float(dropout_rate), block_q,
        interpret, block_q_bwd,
    )
