"""VMEM-resident Pallas kernels for batched CTC prefix beam search.

Same algorithm and exact semantics as the XLA scan in
:mod:`thunder_tpu.ops.ctc_beam_device` (itself pinned against the host
C++/numpy search): per frame the candidate set is the top
``max_tokens_per_step`` tokens above the prune floor; each beam stays
(blank/repeat) or extends by a kept token; extensions colliding with an
existing prefix merge in the log-semiring (rolling-hash identity, one
equality per stay row); frames past a row's length — or where every
candidate prunes — are no-ops.

Why a kernel: the XLA scan pays a fixed per-frame dispatch floor (measured
~110 us/frame at B=64 — docs/benchmarks.md).  Here every piece of search
state stays in VMEM across the whole utterance and the batch rides the
128-wide lane axis, so a frame is a handful of vector passes over
``(W·K, B)`` tiles.

Layout contract:

- per-frame candidates arrive time-major as ``topv (T, K, B)`` log-probs,
  ``topi (T, K, B)`` token ids, and ``pblank (T, 1, B)`` — the wrapper
  computes them with one XLA ``top_k`` (or passes the full vocabulary with
  iota ids when ``K >= V``), streamed in ``TB``-frame blocks by the grid;
- state lives in scratch VMEM as ``(W, B)`` tiles and persists across grid
  steps;
- candidates are ``(W + W*K, B)`` — stay rows then extend rows in
  ``parent*K + slot`` order, matching the XLA scan's concatenation;
- the forward kernel emits per-frame backtrace pointers ``(T, W, B)`` and
  the final ``p_blank``/``p_nonblank``; the reverse kernel walks the
  pointers newest-to-oldest to materialize the token matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["beam_scan_pallas", "beam_backtrace_pallas"]

# multiplicative hash constants, bit-identical to ops/ctc_beam_device.py
# (uint32 wraparound == int32 two's-complement wraparound)
_M1 = np.int32(1000003)
_M2 = np.int32(np.uint32(2654435761).astype(np.int32))
_H_SEED = np.int32(1)
_DEAD_H1 = np.int32(-1)  # 0xFFFFFFFF
_NEG_INF = np.float32(-np.inf)
_BIG_I32 = np.int32(2**30)


def _kernel(len_ref, floor_ref, pb0_ref, pnb0_ref, h10_ref, h20_ref, last0_ref,
            topv_ref, topi_ref, pblank_ref, parents_ref, exts_ref, pb_out,
            pnb_out, h1_out, h2_out, last_out, pb_s, pnb_s, h1_s, h2_s,
            last_s, *, blank: int, W: int, K: int, TB: int, T: int):
    B = len_ref.shape[-1]
    blk = pl.program_id(0)
    floor = floor_ref[0, 0]

    iotaW_col = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)  # beam row ids
    iotaC = jax.lax.broadcasted_iota(jnp.int32, (W + W * K, B), 0)
    # candidate-row -> parent map, built from iotas (no int div)
    pext = jax.lax.broadcasted_iota(jnp.int32, (W, K, B), 0).reshape(W * K, B)
    parentC = jnp.concatenate([iotaW_col, pext], axis=0)  # (W + W*K, B)

    @pl.when(blk == 0)
    def _init():
        # the init arrays are either the canonical fresh-search state (slot 0
        # = the empty prefix, the rest dead) or carried state from a previous
        # window of the same stream (beam_scan_pallas init_state=)
        pb_s[:] = pb0_ref[:]
        pnb_s[:] = pnb0_ref[:]
        h1_s[:] = h10_ref[:]
        h2_s[:] = h20_ref[:]
        last_s[:] = last0_ref[:]

    lengths = len_ref[:]  # (1, B)

    def frame(tt, _):
        t = blk * TB + tt
        tv = topv_ref[pl.ds(tt, 1)].reshape(K, B)
        ti = topi_ref[pl.ds(tt, 1)].reshape(K, B)
        p_blank = pblank_ref[pl.ds(tt, 1)].reshape(1, B)
        pb, pnb = pb_s[:], pnb_s[:]
        h1, h2, last = h1_s[:], h2_s[:], last_s[:]
        total = jnp.logaddexp(pb, pnb)  # (W, B)

        # ---- stay rows (same prefix): blank path + repeated-last path ----
        stay_pb = jnp.where(p_blank >= floor, total + p_blank, _NEG_INF)
        # repeat path contributes when `last` is among this frame's kept
        # tokens: sweep the K candidate slots (ids are unique per frame)
        p_last = jnp.full((W, B), _NEG_INF, jnp.float32)
        lin = jnp.zeros((W, B), jnp.bool_)
        for k in range(K):
            m = last == ti[k].reshape(1, B)
            p_last = jnp.where(m, tv[k].reshape(1, B), p_last)
            lin = lin | (m & (tv[k].reshape(1, B) >= floor))
        last_in = lin & (last >= 0)
        stay_pnb = jnp.where(last_in, pnb + p_last, _NEG_INF)

        # ---- extend rows (W, K, B): prefix + kept token ----
        tv3 = tv.reshape(1, K, B)
        tok3 = ti.reshape(1, K, B)
        ok = (tv3 >= floor) & (tok3 != blank)
        same = tok3 == last[:, None, :]
        base = jnp.where(same, pb[:, None, :], total[:, None, :])
        ext_pnb = jnp.where(ok, base + tv3, _NEG_INF)
        vv3 = tok3 + 2
        eh1 = h1[:, None, :] * _M1 + vv3
        eh2 = h2[:, None, :] * _M2 + vv3

        # ---- merge: absorb each matching extend row into its stay row ----
        # (at most one partner each way — see ops/ctc_beam_device.py)
        extra = jnp.full((W, B), _NEG_INF, jnp.float32)
        absorbed = jnp.zeros((W, K, B), jnp.bool_)
        for q in range(W):
            m = (eh1 == h1[q].reshape(1, 1, B)) & (eh2 == h2[q].reshape(1, 1, B))
            hit = jnp.max(jnp.max(jnp.where(m, ext_pnb, _NEG_INF), axis=0), axis=0)
            extra = jnp.where(iotaW_col == q, hit.reshape(1, B), extra)
            absorbed = absorbed | m
        stay_pnb = jnp.logaddexp(stay_pnb, extra)
        ext_pnb = jnp.where(absorbed, _NEG_INF, ext_pnb)

        # ---- combined candidate totals, stay rows first ----
        e_flat = ext_pnb.reshape(W * K, B)
        stay_tot = jnp.logaddexp(stay_pb, stay_pnb)
        cand = jnp.concatenate([stay_tot, e_flat], axis=0)  # (W + W*K, B)
        m_pnb = jnp.concatenate([stay_pnb, e_flat], axis=0)
        tokenC = jnp.concatenate(
            [jnp.full((W, B), -1, jnp.int32),
             jnp.broadcast_to(tok3, (W, K, B)).reshape(W * K, B)],
            axis=0,
        )

        # ---- iterative top-W per column (lax.top_k tie order: lower idx) --
        picks = []  # (idx, best, pnb, parent, tok) rows of (1, B)
        killer = cand
        for _ in range(W):
            best = jnp.max(killer, axis=0, keepdims=True)
            at = jnp.where(killer == best, iotaC, _BIG_I32)
            idx = jnp.min(at, axis=0, keepdims=True)
            sel = iotaC == idx
            pnb_j = jnp.max(jnp.where(sel, m_pnb, _NEG_INF), axis=0, keepdims=True)
            par_j = jnp.max(jnp.where(sel, parentC, 0), axis=0, keepdims=True)
            tok_j = jnp.max(jnp.where(sel, tokenC, -1), axis=0, keepdims=True)
            killer = jnp.where(sel, _NEG_INF, killer)
            picks.append((idx, best, pnb_j, par_j, tok_j))

        # stack the W picks into (W, B) matrices
        IDX = jnp.zeros((W, B), jnp.int32)
        BEST = jnp.full((W, B), _NEG_INF, jnp.float32)
        PNB = jnp.full((W, B), _NEG_INF, jnp.float32)
        PARENT = jnp.zeros((W, B), jnp.int32)
        TOK = jnp.full((W, B), -1, jnp.int32)
        for j, (idx, best, pnb_j, par_j, tok_j) in enumerate(picks):
            row = iotaW_col == j
            IDX = jnp.where(row, idx, IDX)
            BEST = jnp.where(row, best, BEST)
            PNB = jnp.where(row, pnb_j, PNB)
            PARENT = jnp.where(row, par_j, PARENT)
            TOK = jnp.where(row, tok_j, TOK)

        # gather the parents' fields with one static sweep over old rows
        g_h1 = jnp.zeros((W, B), jnp.int32)
        g_h2 = jnp.zeros((W, B), jnp.int32)
        g_last = jnp.zeros((W, B), jnp.int32)
        g_spb = jnp.full((W, B), _NEG_INF, jnp.float32)
        for w in range(W):
            m = PARENT == w
            g_h1 = jnp.where(m, h1[w].reshape(1, B), g_h1)
            g_h2 = jnp.where(m, h2[w].reshape(1, B), g_h2)
            g_last = jnp.where(m, last[w].reshape(1, B), g_last)
            g_spb = jnp.where(m, stay_pb[w].reshape(1, B), g_spb)

        DEAD = ~jnp.isfinite(BEST)
        IS_STAY = IDX < W
        vvj = TOK + 2
        n_pb = jnp.where(DEAD | ~IS_STAY, _NEG_INF, g_spb)
        n_pnb = jnp.where(DEAD, _NEG_INF, PNB)
        n_h1 = jnp.where(DEAD, _DEAD_H1, jnp.where(IS_STAY, g_h1, g_h1 * _M1 + vvj))
        n_h2 = jnp.where(DEAD, iotaW_col, jnp.where(IS_STAY, g_h2, g_h2 * _M2 + vvj))
        n_last = jnp.where(DEAD, -1, jnp.where(IS_STAY, g_last, TOK))
        n_ext = jnp.where(IS_STAY, -1, TOK)

        # ---- commit (per-column no-op when past length / all pruned) ----
        in_len = (t < lengths) & (t < T)  # (1, B)
        valid = in_len & jnp.isfinite(BEST[0].reshape(1, B))
        pb_s[:] = jnp.where(valid, n_pb, pb)
        pnb_s[:] = jnp.where(valid, n_pnb, pnb)
        h1_s[:] = jnp.where(valid, n_h1, h1)
        h2_s[:] = jnp.where(valid, n_h2, h2)
        last_s[:] = jnp.where(valid, n_last, last)
        parents_ref[pl.ds(tt, 1)] = jnp.where(valid, PARENT, iotaW_col).reshape(1, W, B)
        exts_ref[pl.ds(tt, 1)] = jnp.where(valid, n_ext, -1).reshape(1, W, B)
        return 0

    jax.lax.fori_loop(0, TB, frame, 0)

    # constant-index output blocks: every grid step flushes, last write wins
    pb_out[:] = pb_s[:]
    pnb_out[:] = pnb_s[:]
    h1_out[:] = h1_s[:]
    h2_out[:] = h2_s[:]
    last_out[:] = last_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("blank", "beam_width", "k_tokens", "interpret", "block_frames"),
)
def beam_scan_pallas(
    logp,
    lengths,
    floor,
    *,
    blank: int,
    beam_width: int,
    k_tokens: int,
    interpret: bool = False,
    block_frames: int = 64,
    init_state=None,
):
    """Run the beam-search frame scan on ``(B, T, V)`` log-probs.

    ``k_tokens`` is the per-frame candidate cap (``max_tokens_per_step``);
    when it is below ``V`` one XLA ``top_k`` pre-prunes the vocabulary and
    the kernel searches the reduced ``(T, K)`` candidate stream — this is
    what makes BPE-sized vocabularies (Citrinet's 1025) kernel-eligible.

    ``init_state`` is an optional ``(pb, pnb, h1, h2, last)`` tuple of
    ``(B, W)`` arrays — the previous window's final state — making chunked
    decoding ONE continuous search (identical to searching the stitched
    frames at once; the frame recursion depends only on carried state).

    Returns ``(parents, exts, total, state)`` with ``parents``/``exts``
    shaped ``(B, T, W)`` (backtrace pointers; ``exts`` holds real token
    ids), ``total (B, W)`` the final per-beam log probability, and ``state``
    the final ``(pb, pnb, h1, h2, last)`` tuple for stream continuation.
    """
    B, T, V = logp.shape
    W = beam_width
    K = min(k_tokens, V)
    logp = logp.astype(jnp.float32)
    pblank = logp[..., blank]  # (B, T)
    if K < V:
        topv, topi = jax.lax.top_k(logp, K)  # (B, T, K), ids sorted by prob
    else:
        topv = logp
        topi = jnp.broadcast_to(
            jnp.arange(V, dtype=jnp.int32)[None, None, :], (B, T, V)
        )

    TB = min(block_frames, max(T, 1))
    T_pad = -(-T // TB) * TB
    tv = jnp.transpose(topv, (1, 2, 0))  # (T, K, B)
    ti = jnp.transpose(topi, (1, 2, 0)).astype(jnp.int32)
    pbk = jnp.transpose(pblank, (1, 0)).reshape(T, 1, B)
    if T_pad != T:
        pad = T_pad - T
        tv = jnp.pad(tv, ((0, pad), (0, 0), (0, 0)), constant_values=_NEG_INF)
        ti = jnp.pad(ti, ((0, pad), (0, 0), (0, 0)))
        pbk = jnp.pad(pbk, ((0, pad), (0, 0), (0, 0)), constant_values=_NEG_INF)

    if init_state is None:
        # fresh search: slot 0 = the empty prefix, the rest dead sentinels
        iw = jnp.arange(W, dtype=jnp.int32)[:, None]
        pb0 = jnp.broadcast_to(jnp.where(iw == 0, 0.0, _NEG_INF), (W, B)).astype(jnp.float32)
        pnb0 = jnp.full((W, B), _NEG_INF, jnp.float32)
        h10 = jnp.broadcast_to(jnp.where(iw == 0, _H_SEED, _DEAD_H1), (W, B))
        h20 = jnp.broadcast_to(jnp.where(iw == 0, jnp.full_like(iw, _H_SEED), iw), (W, B))
        last0 = jnp.full((W, B), -1, jnp.int32)
    else:
        pb0, pnb0, h10, h20, last0 = (jnp.transpose(a, (1, 0)) for a in init_state)
        pb0 = pb0.astype(jnp.float32)
        pnb0 = pnb0.astype(jnp.float32)
        h10 = h10.astype(jnp.int32)
        h20 = h20.astype(jnp.int32)
        last0 = last0.astype(jnp.int32)

    state_in_spec = pl.BlockSpec((W, B), lambda i: (0, 0), memory_space=pltpu.VMEM)
    grid = (T_pad // TB,)
    kernel = functools.partial(_kernel, blank=blank, W=W, K=K, TB=TB, T=T)
    parents, exts, pb, pnb, h1, h2, last = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            state_in_spec,
            state_in_spec,
            state_in_spec,
            state_in_spec,
            state_in_spec,
            pl.BlockSpec((TB, K, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, K, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, W, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, W, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((W, B), lambda i: (0, 0), memory_space=pltpu.VMEM)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, W, B), jnp.int32),
            jax.ShapeDtypeStruct((T_pad, W, B), jnp.int32),
            jax.ShapeDtypeStruct((W, B), jnp.float32),
            jax.ShapeDtypeStruct((W, B), jnp.float32),
            jax.ShapeDtypeStruct((W, B), jnp.int32),
            jax.ShapeDtypeStruct((W, B), jnp.int32),
            jax.ShapeDtypeStruct((W, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, B), jnp.float32),
            pltpu.VMEM((W, B), jnp.float32),
            pltpu.VMEM((W, B), jnp.int32),
            pltpu.VMEM((W, B), jnp.int32),
            pltpu.VMEM((W, B), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(lengths, jnp.int32).reshape(1, B),
        jnp.asarray(floor, jnp.float32).reshape(1, 1),
        pb0,
        pnb0,
        h10,
        h20,
        last0,
        tv,
        ti,
        pbk,
    )
    total = jnp.logaddexp(pb, pnb)  # (W, B)
    state = tuple(jnp.transpose(a, (1, 0)) for a in (pb, pnb, h1, h2, last))
    return (
        jnp.transpose(parents[:T], (2, 0, 1)),
        jnp.transpose(exts[:T], (2, 0, 1)),
        total.T,
        state,
    )


def _backtrace_kernel(slots_ref, parents_ref, exts_ref, toks_ref, origin_ref,
                      slot_s, *, W: int, TB: int):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        slot_s[:] = slots_ref[:]

    def frame(k, _):
        tt = TB - 1 - k  # walk the block's frames back-to-front
        p = parents_ref[pl.ds(tt, 1)].reshape(W, -1)  # (W, B)
        e = exts_ref[pl.ds(tt, 1)].reshape(W, -1)
        slot = slot_s[:]  # (n_out, B)
        g_p = jnp.zeros_like(slot)
        g_e = jnp.full_like(slot, -1)
        for w in range(W):
            m = slot == w
            g_p = jnp.where(m, p[w].reshape(1, -1), g_p)
            g_e = jnp.where(m, e[w].reshape(1, -1), g_e)
        toks_ref[pl.ds(tt, 1)] = g_e.reshape(1, *g_e.shape)
        slot_s[:] = g_p
        return 0

    jax.lax.fori_loop(0, TB, frame, 0)
    # after the oldest frame, slot_s is each path's slot in the INITIAL
    # state — the stitch key for cross-window prefix continuation
    origin_ref[:] = slot_s[:]


@functools.partial(jax.jit, static_argnames=("block_frames",))
def beam_backtrace_pallas(parents, exts, slots0, *, block_frames: int = 256):
    """Sequential pointer walk on-device: ``parents``/``exts`` ``(B, T, W)``
    pointer fields (the forward kernel's outputs) + start slots ``(B, n_out)``
    -> ``(toks, origin)``: the token matrix ``(B, n_out, T)`` (-1 where the
    path emitted nothing) and each path's slot in the window's INITIAL state
    ``(B, n_out)`` — the stitch key for cross-window streaming.

    Replaces the XLA associative-scan composition for the Pallas path: the
    walk is one ``(n_out, B)`` gather sweep per frame with the slot state
    VMEM-resident, streaming the pointer blocks newest-to-oldest (measured
    ~13 ms -> ~1 ms at B=64, T=751, W=16 on v5e; same output bit-for-bit).
    """
    B, T, W = parents.shape
    n_out = slots0.shape[1]
    TB = min(block_frames, max(T, 1))
    T_pad = -(-T // TB) * TB
    p = jnp.transpose(parents, (1, 2, 0))  # (T, W, B)
    e = jnp.transpose(exts, (1, 2, 0))
    if T_pad != T:
        # padded frames: identity pointers, no emission — the walk passes
        # through them without moving
        ident = jnp.broadcast_to(
            jnp.arange(W, dtype=p.dtype)[None, :, None], (T_pad - T, W, B)
        )
        p = jnp.concatenate([p, ident], axis=0)
        e = jnp.concatenate([e, jnp.full((T_pad - T, W, B), -1, e.dtype)], axis=0)

    nb = T_pad // TB
    kernel = functools.partial(_backtrace_kernel, W=W, TB=TB)
    toks, origin = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n_out, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            # stream pointer blocks newest-to-oldest
            pl.BlockSpec((TB, W, B), lambda i, nb=nb: (nb - 1 - i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, W, B), lambda i, nb=nb: (nb - 1 - i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (TB, n_out, B), lambda i, nb=nb: (nb - 1 - i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((n_out, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, n_out, B), jnp.int32),
            jax.ShapeDtypeStruct((n_out, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((n_out, B), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(jnp.transpose(slots0, (1, 0)).astype(jnp.int32), p, e)
    return jnp.transpose(toks[:T], (2, 1, 0)), jnp.transpose(origin, (1, 0))
