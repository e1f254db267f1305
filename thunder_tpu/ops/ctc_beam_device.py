"""Batched CTC prefix beam search ON-DEVICE (jit/XLA, static shapes).

Same algorithm and semantics as the host reference
(:func:`thunder_tpu.ops.ctc_beam.prefix_beam_search` — Hannun et al., 2014:
per frame, each beam stays via blank/repeat or extends by a kept token;
candidates collapsing to the same prefix merge in the log-semiring; top
``beam_width`` by total probability survive).  The reference framework has
no beam search at all (greedy only, `/root/reference/src/thunder/module.py:88-100`);
the host C++ runtime here decodes batches over host *cores* — this kernel
decodes them on the accelerator instead, so beam-mode serving scales with
the chip, not the host, and the ``(B, T, V)`` logits never cross the
device→host link.

TPU-shaped design (what makes this jit-able with static shapes):

- **Beam identity is a rolling hash, not a token tuple.**  Two independent
  32-bit multiplicative hashes updated per extension stand in for prefix
  equality (collision odds ~2^-64 per comparison); the scan carries only
  per-beam scalars ``(p_blank, p_nonblank, hash, last_token)``.
- **The merge is one equality matrix, not a hash map.**  A candidate prefix
  has at most TWO sources per frame — the beam already holding it (stay:
  blank path + repeated-last path) and the beam one token shorter extending
  into it — because surviving beams are distinct prefixes and an extension
  ``parent + (v,)`` determines ``(parent, v)`` uniquely.  So every merge is
  extend→stay with a unique partner: one ``(W*K, W)`` hash-equality compare
  absorbs each matched extend row into its stay row (masked max — there can
  be only one) and kills it.  No sort, no segment ops, no hash map.
- **Prefixes are reconstructed by backtrace, also on device.**  The forward
  scan emits per-frame ``(parent slot, extended token)`` pointers; a
  reverse scan walks the top ``nbest`` slots back through time and emits
  the token matrix.  The host fetches only that ``(B, nbest, T)`` result —
  for greedy-sized fetches even at wide beams.

The LM scorers are dynamic trie/hash structures and stay host-only; an
``lm=`` on this backend means continuous on-the-fly rescoring — the
accelerator search is acoustic-only and every surviving beam is LM-ranked
on the host (:func:`lm_prefix_score`, ``DeviceBeamState.best_ranked``).
In-search shallow fusion (the LM steering pruning) remains the host
backend's behavior; with enough ``beam_width`` the two agree.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["beam_search_device", "beam_search_device_stream", "DeviceBeamState"]

_M1 = np.uint32(1000003)
_M2 = np.uint32(2654435761)
_H_SEED = np.uint32(1)
_DEAD_H1 = np.uint32(0xFFFFFFFF)
_NEG_INF = np.float32(-np.inf)


def _hash_update(h1, h2, v):
    vv = (v + 2).astype(jnp.uint32)  # +2 keeps token 0 and the seed distinct
    return h1 * _M1 + vv, h2 * _M2 + vv


def _scan_one(logp, length, floor, *, blank: int, W: int, K: int, n_out: int):
    """Beam-search one ``(T, V)`` log-prob row; returns ``(n_out, T)`` tokens
    (-1 where the winning path emitted nothing) and ``(n_out,)`` scores."""
    T, V = logp.shape

    def frame(state, inp):
        pb, pnb, h1, h2, last = state
        step, t = inp
        if K >= V:
            # keep-all case: candidate ORDER is irrelevant (the merge and the
            # final top-W don't need sorted inputs), so skip the per-frame
            # sort entirely — a large win on small vocabularies where the
            # VPU sort dominates the step
            topv, topi = step, jnp.arange(V, dtype=jnp.int32)
        else:
            topv, topi = lax.top_k(step, K)
        tok_ok = topv >= floor
        p_blank = step[blank]
        total = jnp.logaddexp(pb, pnb)  # (W,)

        # stay rows: same prefix — blank path + repeated-last path.  The
        # repeat contributes only when `last` is among this frame's kept
        # tokens (host reference iterates over `keep` only).
        stay_pb = jnp.where(p_blank >= floor, total + p_blank, _NEG_INF)
        p_last = step[jnp.clip(last, 0, V - 1)]
        last_in = ((topi[None, :] == last[:, None]) & tok_ok[None, :]).any(1) & (last >= 0)
        stay_pnb = jnp.where(last_in, pnb + p_last, _NEG_INF)

        # extend rows (W, K): prefix + v.  v == last extends from the blank
        # path only (the non-blank path collapses into the stay row).
        v = jnp.broadcast_to(topi[None, :], (W, K))
        ok = tok_ok[None, :] & (v != blank)
        base = jnp.where(v == last[:, None], pb[:, None], total[:, None])
        ext_pnb = jnp.where(ok, base + topv[None, :], _NEG_INF)
        eh1, eh2 = _hash_update(h1[:, None], h2[:, None], v)

        # merge: every mergeable pair is one extend row -> one stay row
        # (unique partner each way), so a hash-equality matrix absorbs the
        # matched extend mass into its stay row and kills the extend row
        e1, e2, e_pnb = eh1.reshape(-1), eh2.reshape(-1), ext_pnb.reshape(-1)
        match = (e1[:, None] == h1[None, :]) & (e2[:, None] == h2[None, :])  # (W*K, W)
        absorbed = match.any(axis=1)
        extra = jnp.max(jnp.where(match, e_pnb[:, None], _NEG_INF), axis=0)  # (W,)
        stay_pnb = jnp.logaddexp(stay_pnb, extra)
        e_pnb = jnp.where(absorbed, _NEG_INF, e_pnb)

        arangeW = jnp.arange(W, dtype=jnp.int32)
        m_pb = jnp.concatenate([stay_pb, jnp.full((W * K,), _NEG_INF)])
        m_pnb = jnp.concatenate([stay_pnb, e_pnb])
        key1 = jnp.concatenate([h1, e1])
        key2 = jnp.concatenate([h2, e2])
        parent = jnp.concatenate([arangeW, jnp.repeat(arangeW, K)])
        ext = jnp.concatenate([jnp.full((W,), -1, jnp.int32), v.reshape(-1).astype(jnp.int32)])
        tot = jnp.logaddexp(m_pb, m_pnb)

        vals, idx = lax.top_k(tot, W)
        dead = ~jnp.isfinite(vals)
        n_pb = jnp.where(dead, _NEG_INF, m_pb[idx])
        n_pnb = jnp.where(dead, _NEG_INF, m_pnb[idx])
        # dead slots get per-slot sentinel hashes so they can never extend a
        # real merge run past length 2 next frame
        n_h1 = jnp.where(dead, _DEAD_H1, key1[idx])
        n_h2 = jnp.where(dead, arangeW.astype(jnp.uint32), key2[idx])
        sel_parent, sel_ext = parent[idx], ext[idx]
        n_last = jnp.where(dead, -1, jnp.where(sel_ext >= 0, sel_ext, last[sel_parent]))

        # frame is a no-op when past this row's length or when every token
        # was pruned (host reference: empty `nxt` -> skip frame)
        valid = (t < length) & jnp.isfinite(vals[0])

        def keep(new, old):
            return jnp.where(valid, new, old)

        state = (
            keep(n_pb, pb),
            keep(n_pnb, pnb),
            keep(n_h1, h1),
            keep(n_h2, h2),
            keep(n_last, last),
        )
        ptr = (keep(sel_parent, arangeW), jnp.where(valid, sel_ext, -1))
        return state, ptr

    arangeW = jnp.arange(W, dtype=jnp.uint32)
    init = (
        jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.full((W - 1,), _NEG_INF)]),
        jnp.full((W,), _NEG_INF),
        jnp.where(arangeW == 0, _H_SEED, _DEAD_H1),
        jnp.where(arangeW == 0, _H_SEED, arangeW),
        jnp.full((W,), -1, jnp.int32),
    )
    # unroll=8: measured on v5e at (B=64, T=751, V=29, W=16) — 173 -> 157 ms
    # per batch; the scan is per-step-overhead-bound (B=8 costs 94 ms, so
    # ~half the wall is a fixed ~110 us/step floor), unroll=16 regresses 3x
    (pb, pnb, _, _, _), (parents, exts) = lax.scan(
        frame, init, (logp, jnp.arange(T, dtype=jnp.int32)), unroll=8
    )
    total = jnp.logaddexp(pb, pnb)
    return _backtrace(parents, exts, total, n_out)


def _backtrace(parents, exts, total, n_out: int):
    """Reconstruct the top ``n_out`` label sequences from per-frame pointers.

    ``parents``/``exts`` are ``(T, W)``, ``total`` is ``(W,)`` — the same
    contract the XLA scan and the Pallas kernel both emit.

    Backtrace by parallel pointer composition instead of a T-step scan:
    parents[t] maps (slot after frame t) -> (slot after frame t-1), so the
    path slot A[t] = parents[t+1] ∘ ... ∘ parents[T-1] applied to the final
    slot.  Suffix-compose the maps with an associative scan (O(log T)
    passes over (T, W) gathers — the sequential version was ~half the
    kernel's wall time).
    The reverse scan left-folds from the end — (((M[T-1] ⊕ M[T-2]) ⊕ ...),
    so ⊕ must compose its EARLIER-folded (later-in-time) operand innermost:
    (f ⊕ g)[x] = g[f[x]]
    """
    W = parents.shape[1]
    slots0 = jnp.argsort(-total)[:n_out]
    suffix = lax.associative_scan(
        lambda f, g: jnp.take_along_axis(g, f, axis=-1), parents, reverse=True, axis=0
    )
    ident = jnp.broadcast_to(jnp.arange(W, dtype=parents.dtype), (1, W))
    comp = jnp.concatenate([suffix[1:], ident])  # comp[t] = M[t+1]∘...∘M[T-1]
    path = comp[:, slots0]  # (T, n_out): slot after frame t on each path
    toks = jnp.take_along_axis(exts, path, axis=1)  # (T, n_out)
    return toks.T, total[slots0]  # (n_out, T) forward order, (n_out,)


@functools.partial(jax.jit, static_argnames=("blank", "beam_width", "k_tokens", "n_out"))
def _beam_batch(logits, lengths, floor, *, blank: int, beam_width: int, k_tokens: int, n_out: int):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    run = functools.partial(_scan_one, blank=blank, W=beam_width, K=k_tokens, n_out=n_out)
    return jax.vmap(lambda lp, ln: run(lp, ln, floor))(logp, lengths)


@functools.partial(
    jax.jit, static_argnames=("blank", "beam_width", "k_tokens", "n_out", "interpret")
)
def _beam_batch_pallas(
    logits, lengths, floor, *, blank: int, beam_width: int, k_tokens: int, n_out: int, interpret: bool
):
    from thunder_tpu.kernels.beam_pallas import beam_backtrace_pallas, beam_scan_pallas

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    parents, exts, total, _state = beam_scan_pallas(
        logp,
        lengths,
        floor,
        blank=blank,
        beam_width=beam_width,
        k_tokens=k_tokens,
        interpret=interpret,
    )
    slots0 = jnp.argsort(-total, axis=1)[:, :n_out]  # stable: ties -> lower slot
    toks, _origin = beam_backtrace_pallas(parents, exts, slots0)
    scores = jnp.take_along_axis(total, slots0, axis=1)
    return toks, scores


@functools.lru_cache(maxsize=64)
def _sharded_beam_fn(mesh, axis, use_pallas, blank, beam_width, k, n_out, interpret):
    """jit(shard_map(beam batch)) cached per (mesh, params) so repeated
    serving calls reuse the compiled executable."""
    from jax.sharding import PartitionSpec as P

    if use_pallas:
        run = functools.partial(
            _beam_batch_pallas,
            blank=blank,
            beam_width=beam_width,
            k_tokens=k,
            n_out=n_out,
            interpret=interpret,
        )
    else:
        run = functools.partial(
            _beam_batch, blank=blank, beam_width=beam_width, k_tokens=k, n_out=n_out
        )
    inner = lambda lg, ln, fl: run(lg, ln, fl)
    # per-shard state carries make the scan/kernel non-replicated; vma
    # checking is disabled (each shard decodes its own batch rows only)
    return jax.jit(
        jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P()),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )


def beam_search_device(
    logits,
    lengths: Optional[Sequence[int]] = None,
    blank: Optional[int] = None,
    beam_width: int = 16,
    prune_logp: float = -12.0,
    max_tokens_per_step: int = 50,
    nbest: Optional[int] = None,
    use_pallas: Optional[bool] = None,
    mesh=None,
    data_axis: str = "data",
    lm=None,
    lm_weight: float = 0.0,
):
    """Accelerator-side batched prefix beam search over ``(B, T, V)`` logits.

    Drop-in for :func:`thunder_tpu.ops.ctc_beam.beam_search_decode` /
    ``beam_search_nbest`` when no LM is fused: same arguments, same return
    shape — ``nbest=None`` gives one collapsed id array per sample, else the
    top-``nbest`` ``(ids, log_prob)`` pairs per sample, best first.
    ``logits`` may be a live device array (the fast path: module/engine pass
    their jit outputs straight in, no host transfer of the logits).

    Two implementations share the exact same semantics: an XLA ``lax.scan``
    and a VMEM-resident Pallas kernel (:mod:`thunder_tpu.kernels.beam_pallas`)
    that dodges the scan's per-frame dispatch floor (large vocabularies are
    pre-pruned to the ``max_tokens_per_step`` candidates with one XLA
    ``top_k`` before the kernel).  ``use_pallas=None`` auto-selects the
    kernel on TPU when the per-frame candidate block ``W*K`` is moderate;
    True forces it (interpreter off-TPU), False forces the scan.

    With ``mesh`` (a :class:`jax.sharding.Mesh`), the search runs under
    ``shard_map`` over ``data_axis`` — each device decodes its own batch
    rows, so beam serving scales with the data-parallel mesh exactly like
    the forward pass (the serving engine passes its mesh through).
    ``B`` must divide the axis size.
    """
    logits = jnp.asarray(logits)
    B, T, V = logits.shape
    if blank is None:
        blank = V - 1
    if lengths is None:
        lengths_arr = jnp.full((B,), T, jnp.int32)
    else:
        lengths_arr = jnp.asarray(lengths, jnp.int32)
    k = V if max_tokens_per_step is None else min(int(max_tokens_per_step), V)
    # with an LM, rank over the FULL beam on the host (on-the-fly rescoring:
    # the device search stays acoustic-only, the LM re-orders its survivors
    # via lm_prefix_score — see that helper's docstring for the semantics)
    n_out = (
        int(beam_width)
        if lm is not None
        else (1 if nbest is None else min(int(nbest), beam_width))
    )
    floor = jnp.float32(prune_logp)
    eligible = T > 0 and beam_width * k <= 8192
    if use_pallas and not eligible:
        raise ValueError(
            "use_pallas=True requires T > 0 and beam_width*K <= 8192 "
            f"(got K={k}, T={T}, W={beam_width})"
        )
    if use_pallas is None:
        use_pallas = eligible and jax.default_backend() == "tpu"
    if mesh is not None:
        d = mesh.shape[data_axis]
        if B % d:
            raise ValueError(
                f"batch {B} must divide the mesh's {data_axis!r} axis ({d}) "
                "for sharded beam decoding (pad the batch like the engine does)"
            )
        fn = _sharded_beam_fn(
            mesh,
            data_axis,
            bool(use_pallas),
            int(blank),
            int(beam_width),
            k,
            n_out,
            jax.default_backend() != "tpu",
        )
        toks, scores = fn(logits, lengths_arr, floor)
    elif use_pallas:
        toks, scores = _beam_batch_pallas(
            logits,
            lengths_arr,
            floor,
            blank=int(blank),
            beam_width=int(beam_width),
            k_tokens=k,
            n_out=n_out,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        toks, scores = _beam_batch(
            logits,
            lengths_arr,
            floor,
            blank=int(blank),
            beam_width=int(beam_width),
            k_tokens=k,
            n_out=n_out,
        )
    toks = np.asarray(toks)  # (B, n_out, T), -1 = no emission
    if lm is not None:
        scores = np.asarray(scores)
        ranked = []
        for b, row in enumerate(toks):
            hyps = [
                (row[n][row[n] >= 0].astype(np.int32), float(scores[b, n]))
                for n in range(n_out)
                if np.isfinite(scores[b, n])
            ]
            hyps = [
                (ids, s + lm_weight * lm_prefix_score(lm, ids, final=True))
                for ids, s in hyps
            ]
            hyps.sort(key=lambda h: -h[1])
            ranked.append(hyps)
        if nbest is None:
            return [
                (r[0][0] if r else np.zeros((0,), np.int32)) for r in ranked
            ]
        return [r[: min(int(nbest), len(r))] for r in ranked]
    if nbest is None:
        # scores unused on the best-path return — skip the second
        # device->host fetch (one round trip per call in serving)
        return [row[0][row[0] >= 0].astype(np.int32) for row in toks]
    scores = np.asarray(scores)
    return [
        [
            (row[n][row[n] >= 0].astype(np.int32), float(scores[b, n]))
            for n in range(n_out)
            if np.isfinite(scores[b, n])
        ]
        for b, row in enumerate(toks)
    ]


def lm_prefix_score(lm, prefix, final: bool = True) -> float:
    """Total LM score of a collapsed prefix, host-side.

    Sums the per-token shallow-fusion bonuses the HOST search would have
    accumulated (``lm(prefix[:i], prefix[i])`` — NGramLM conditionals /
    WordFusionLM word-boundary bonuses) plus the pending-word add-on
    (``final_score`` at end-of-utterance, ``partial_score`` for live
    display) when the scorer provides one.  This is what makes the device
    backend LM-capable: the accelerator search stays acoustic-only, and
    ranking applies the LM continuously on the host (on-the-fly rescoring —
    unlike the host backend's in-search fusion, the LM does not influence
    which beams survive pruning)."""
    seq = tuple(int(t) for t in np.asarray(prefix).reshape(-1))
    s = 0.0
    for i in range(len(seq)):
        s += float(lm(seq[:i], seq[i]))
    add = getattr(lm, "final_score" if final else "partial_score", None)
    if add is not None:
        s += float(add(seq))
    return s


class DeviceBeamState:
    """Carried state for cross-window streaming decode on the accelerator.

    The device analogue of :class:`thunder_tpu.ops.ctc_beam.BeamState`: the
    scalar search state (``p_blank``/``p_nonblank``/hashes/last token per
    beam slot) stays on the device between windows, and the host carries
    only each slot's collapsed prefix so far plus its total score.  Seeding
    window k+1 with window k's state makes chunked decoding ONE continuous
    prefix beam search — identical to searching the stitched frames at once
    (the frame recursion depends only on carried state).
    """

    __slots__ = ("arrays", "prefixes", "total")

    def __init__(self, arrays=None, prefixes=None, total=None):
        #: 5-tuple of (B, W) device arrays (pb, pnb, h1, h2, last), or None
        self.arrays = arrays
        #: per sample: list of W collapsed-prefix id arrays (None = dead slot)
        self.prefixes = prefixes
        #: (B, W) float array of per-slot total log probabilities
        self.total = total

    def best(self) -> List[np.ndarray]:
        """Best prefix per sample so far (collapsed label ids, int32)."""
        if self.total is None:
            return []
        out = []
        for b in range(self.total.shape[0]):
            w = int(np.argmax(self.total[b]))
            pref = self.prefixes[b][w]
            out.append(
                pref if (pref is not None and np.isfinite(self.total[b, w]))
                else np.zeros((0,), np.int32)
            )
        return out

    def best_ranked(self, lm=None, lm_weight: float = 0.0, final: bool = True) -> List[np.ndarray]:
        """Best prefix per sample with continuous LM-aware ranking.

        Every live slot's acoustic total gets ``lm_weight *``
        :func:`lm_prefix_score` added (``final`` picks the pending-word
        add-on: ``final_score`` at flush, ``partial_score`` for live partial
        display), so streaming partial rankings reflect the LM on every
        window — not only at flush.  ``lm=None`` degrades to :meth:`best`.
        Ranking-only: the carried device state is never touched."""
        if lm is None:
            return self.best()
        if self.total is None:
            return []
        out = []
        for b in range(self.total.shape[0]):
            best_pref, best_score = np.zeros((0,), np.int32), -np.inf
            for w in range(self.total.shape[1]):
                pref = self.prefixes[b][w]
                if pref is None or not np.isfinite(self.total[b, w]):
                    continue
                score = float(self.total[b, w]) + lm_weight * lm_prefix_score(
                    lm, pref, final=final
                )
                if score > best_score:
                    best_pref, best_score = pref, score
            out.append(best_pref)
        return out


@functools.partial(
    jax.jit, static_argnames=("blank", "beam_width", "k_tokens", "interpret", "fresh")
)
def _beam_stream_step(
    logits, lengths, floor, state_arrays, *, blank, beam_width, k_tokens, interpret, fresh
):
    from thunder_tpu.kernels.beam_pallas import beam_backtrace_pallas, beam_scan_pallas

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    parents, exts, total, new_state = beam_scan_pallas(
        logp,
        lengths,
        floor,
        blank=blank,
        beam_width=beam_width,
        k_tokens=k_tokens,
        interpret=interpret,
        init_state=None if fresh else state_arrays,
    )
    B = logits.shape[0]
    # backtrace EVERY slot: the window's emissions per beam + the slot each
    # beam descends from in the carried-in state (the stitch key)
    slots_all = jnp.broadcast_to(jnp.arange(beam_width, dtype=jnp.int32)[None, :], (B, beam_width))
    toks, origin = beam_backtrace_pallas(parents, exts, slots_all)
    return toks, origin, total, new_state


def beam_search_device_stream(
    logits,
    lengths: Optional[Sequence[int]] = None,
    blank: Optional[int] = None,
    beam_width: int = 16,
    prune_logp: float = -12.0,
    max_tokens_per_step: int = 50,
    state: Optional[DeviceBeamState] = None,
) -> DeviceBeamState:
    """Advance carried device beam state over one ``(B, T, V)`` logits window.

    Device analogue of :func:`thunder_tpu.ops.ctc_beam.beam_search_stream`
    (no-LM mode): when the windows' logits tile a full utterance, the result
    is identical to :func:`beam_search_device` over the whole utterance at
    once — and, transitively, to the host stream (pinned by
    tests/test_ctc_beam_device.py).  ``logits`` may be a live device array;
    per window only the ``(B, W, T)`` emission matrix and two ``(B, W)``
    vectors cross the device->host link.
    """
    logits = jnp.asarray(logits)
    B, T, V = logits.shape
    if blank is None:
        blank = V - 1
    if lengths is None:
        lengths_arr = jnp.full((B,), T, jnp.int32)
    else:
        lengths_arr = jnp.asarray(lengths, jnp.int32)
    k = V if max_tokens_per_step is None else min(int(max_tokens_per_step), V)
    W = int(beam_width)
    if beam_width * k > 8192:
        raise ValueError(
            "device streaming beam requires beam_width*K <= 8192 "
            f"(got K={k}, W={beam_width}); lower max_tokens_per_step or use "
            "the host backend"
        )
    if state is None:
        state = DeviceBeamState()
    if T == 0:
        # no frames: a no-op, like the host stream on an empty window.  A
        # still-fresh state gains the canonical host view (one live empty
        # prefix) so best() works before any frames arrive.
        if state.arrays is None and state.total is None:
            total = np.full((B, W), -np.inf, np.float32)
            total[:, 0] = 0.0
            prefixes = [[np.zeros((0,), np.int32)] + [None] * (W - 1) for _ in range(B)]
            return DeviceBeamState(arrays=None, prefixes=prefixes, total=total)
        return state
    fresh = state.arrays is None
    if fresh:
        # dummy arrays keep the jitted signature stable; ignored when fresh
        zf = jnp.zeros((B, W), jnp.float32)
        zi = jnp.zeros((B, W), jnp.int32)
        state_arrays = (zf, zf, zi, zi, zi)
    else:
        state_arrays = state.arrays
    toks, origin, total, new_arrays = _beam_stream_step(
        logits,
        lengths_arr,
        jnp.float32(prune_logp),
        state_arrays,
        blank=int(blank),
        beam_width=W,
        k_tokens=k,
        interpret=jax.default_backend() != "tpu",
        fresh=fresh,
    )
    toks = np.asarray(toks)  # (B, W, T)
    origin = np.asarray(origin)  # (B, W)
    total_np = np.asarray(total)  # (B, W)
    if fresh:
        old_prefixes = [[np.zeros((0,), np.int32)] + [None] * (W - 1) for _ in range(B)]
    else:
        old_prefixes = state.prefixes
    prefixes = []
    for b in range(B):
        row = []
        for w in range(W):
            if not np.isfinite(total_np[b, w]):
                row.append(None)
                continue
            parent = old_prefixes[b][origin[b, w]]
            emitted = toks[b, w][toks[b, w] >= 0]
            if parent is None:
                # a live slot can only descend from a live ancestor; a dead
                # parent means the whole column never advanced (all pruned)
                row.append(emitted.astype(np.int32))
            else:
                row.append(np.concatenate([parent, emitted]).astype(np.int32))
        prefixes.append(row)
    return DeviceBeamState(arrays=new_arrays, prefixes=prefixes, total=total_np)
