"""CTC loss and greedy decoding, TPU-native.

The loss is a log-semiring forward recursion over the extended label sequence
(blanks interleaved), vectorized over ``(batch, state)`` and scanned over time
with ``jax.lax.scan`` — static shapes, no data-dependent control flow, so it
jits cleanly and autodiff provides the backward recursion.

Parity target: ``torch.nn.functional.ctc_loss(blank=blank_idx,
reduction="mean", zero_infinity=True)`` as wrapped by the reference
``calculate_ctc`` (`/root/reference/src/thunder/ctc_loss.py:15-47`):
- per-sample loss divided by its target length (clamped to 1), then averaged
  over the batch;
- infinite losses (impossible alignments) zeroed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ctc_forward_scores",
    "ctc_loss",
    "calculate_ctc",
    "greedy_decode",
    "collapse_ctc",
    "ctc_forced_align",
    "alignment_segments",
]

_NEG = -1e30


def _scan_unroll() -> int:
    """Unroll factor for the time scan (THUNDER_CTC_UNROLL, default 1).

    Each scan iteration touches only a (B, S) tile — microseconds of VPU
    work — so the loop cost is dominated by per-iteration overhead, which
    unrolling amortizes in fwd and in the autodiff transpose.  Kept as an
    env knob because the win is shape- and backend-dependent (A/B'd on chip
    before changing the default).

    TRACE-TIME semantics: the env var is read when a ctc entry point first
    traces for a given shape, and ``ctc_loss``/``calculate_ctc`` are
    module-level ``jax.jit`` wrappers whose cache does NOT key on it —
    changing THUNDER_CTC_UNROLL after the first call in a process is
    silently ignored for already-compiled shapes.  Set it before the first
    ctc call (A/B harnesses that must re-trace reach through ``__wrapped__``
    — scripts/bench_ctc_unroll.py)."""
    import os

    return int(os.environ.get("THUNDER_CTC_UNROLL", "1"))


def _use_pallas_recursion() -> bool:
    """Route the alpha/beta recursion to the Pallas kernels on TPU.

    Trace-time gate (same caveat as ``_scan_unroll``: the module-level jit
    wrappers don't key on it — set THUNDER_CTC_PALLAS before the first ctc
    call in a process).  The scan path is the reference implementation and
    the CPU/fallback path."""
    import os

    if os.environ.get("THUNDER_CTC_PALLAS", "1") == "0":
        return False
    return jax.default_backend() == "tpu"


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def ctc_forward_scores(
    log_probs: jax.Array,
    logit_lengths: jax.Array,
    targets: jax.Array,
    target_lengths: jax.Array,
    blank: int,
) -> jax.Array:
    """Per-sample negative log likelihood of the target under CTC.

    Args:
        log_probs: ``(batch, time, vocab)`` log-softmax outputs.
        logit_lengths: ``(batch,)`` valid frames per sample.
        targets: ``(batch, max_label_len)`` int labels (padding arbitrary).
        target_lengths: ``(batch,)`` valid labels per sample.
        blank: index of the CTC blank token.

    Returns:
        ``(batch,)`` loss values (may be +inf for impossible alignments).
    """
    batch, max_t, _ = log_probs.shape
    max_l = targets.shape[1]
    s_dim = 2 * max_l + 1

    targets = targets.astype(jnp.int32)
    logit_lengths = logit_lengths.astype(jnp.int32)
    target_lengths = target_lengths.astype(jnp.int32)

    # Extended label sequence: blank, y1, blank, y2, ..., blank  -> (B, S)
    z = jnp.full((batch, s_dim), blank, dtype=jnp.int32)
    z = z.at[:, 1::2].set(targets)

    # A skip transition s-2 -> s is allowed when z_s is a label differing from
    # z_{s-2}; never into blanks.
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :s_dim]
    is_label = jnp.arange(s_dim) % 2 == 1
    skip_ok = is_label[None, :] & (z != z_prev2)

    # Per-state emission scores for every frame: (T, B, S)
    lp_z = jnp.take_along_axis(log_probs, z[:, None, :], axis=2)
    lp_z = jnp.moveaxis(lp_z, 1, 0)

    if _use_pallas_recursion():
        # VMEM-resident Pallas recursion (kernels/ctc_pallas.py): same math,
        # custom_vjp backward via the beta recursion; the scan below stays
        # the reference/fallback.  Trace-time gate, like _scan_unroll.
        from thunder_tpu.kernels.ctc_pallas import ctc_ll_pallas

        ll = ctc_ll_pallas(lp_z, skip_ok, logit_lengths, target_lengths)
        loss = -ll
        return jnp.where(loss > -0.5 * _NEG, jnp.inf, loss)

    neg = jnp.asarray(_NEG, log_probs.dtype)
    alpha0 = jnp.full((batch, s_dim), neg, dtype=log_probs.dtype)
    alpha0 = alpha0.at[:, 0].set(lp_z[0][:, 0])
    if s_dim > 1:
        first_label = jnp.where(target_lengths > 0, lp_z[0][:, 1], neg)
        alpha0 = alpha0.at[:, 1].set(first_label)

    def step(alpha, inputs):
        lp_t, t = inputs
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG)[:, :s_dim]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG)[:, :s_dim]
        a2 = jnp.where(skip_ok, a2, neg)
        new_alpha = _logsumexp3(alpha, a1, a2) + lp_t
        # Freeze alpha once past this sample's last valid frame so the carry
        # at the end of the scan equals alpha at t = length - 1.
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    ts = jnp.arange(1, max_t)
    alpha, _ = jax.lax.scan(step, alpha0, (lp_z[1:], ts), unroll=_scan_unroll())

    # log p = logsumexp(alpha[2*tl], alpha[2*tl - 1])
    end = 2 * target_lengths
    a_end = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_end1 = jnp.take_along_axis(alpha, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0]
    a_end1 = jnp.where(target_lengths > 0, a_end1, neg)
    m = jnp.maximum(a_end, a_end1)
    ll = m + jnp.log(jnp.exp(a_end - m) + jnp.exp(a_end1 - m))
    loss = -ll
    # Alignments shorter than needed (T < |extended path|) leave all end
    # states at ~_NEG; report +inf like torch so zero_infinity can kick in.
    return jnp.where(loss > -0.5 * _NEG, jnp.inf, loss)


@partial(jax.jit, static_argnames=("blank", "reduction", "zero_infinity"))
def ctc_loss(
    log_probs: jax.Array,
    logit_lengths: jax.Array,
    targets: jax.Array,
    target_lengths: jax.Array,
    blank: int = 0,
    reduction: str = "mean",
    zero_infinity: bool = True,
    sample_weights: jax.Array | None = None,
) -> jax.Array:
    """CTC loss with torch-compatible reductions.

    ``log_probs`` must already be log-softmaxed, shape ``(batch, time, vocab)``.

    ``sample_weights`` (``(batch,)``, optional) weights each sample's
    contribution to the ``mean``/``sum`` reductions — zero-weight rows are
    excluded exactly, which makes SPMD batch padding loss-transparent: a
    batch padded with repeated zero-weight rows yields the same loss (and
    gradients) as the unpadded batch.
    """
    losses = ctc_forward_scores(log_probs, logit_lengths, targets, target_lengths, blank)
    if zero_infinity:
        losses = jnp.where(jnp.isinf(losses), 0.0, losses)
    if reduction == "none":
        return losses
    if sample_weights is not None:
        w = sample_weights.astype(losses.dtype)
    if reduction == "sum":
        return jnp.sum(losses * w) if sample_weights is not None else jnp.sum(losses)
    if reduction == "mean":
        denom = jnp.maximum(target_lengths, 1).astype(losses.dtype)
        if sample_weights is not None:
            return jnp.sum(w * losses / denom) / jnp.maximum(jnp.sum(w), 1.0)
        return jnp.mean(losses / denom)
    raise ValueError(f"unknown reduction: {reduction}")


@partial(jax.jit, static_argnames=("blank",))
def calculate_ctc(
    logits: jax.Array,
    targets: jax.Array,
    logit_lengths: jax.Array,
    target_lengths: jax.Array,
    blank: int,
    sample_weights: jax.Array | None = None,
) -> jax.Array:
    """API-parity wrapper of the reference ``calculate_ctc`` (`ctc_loss.py:15-47`).

    Args:
        logits: raw model outputs ``(batch, time, vocab)`` (pre-softmax).
            NOTE: channels-last, unlike the reference's (batch, vocab, time).
        sample_weights: optional ``(batch,)`` per-sample weights (see
            :func:`ctc_loss`); used by the Trainer to zero out SPMD padding
            rows so partial batches keep torch-exact mean semantics.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return ctc_loss(
        log_probs,
        logit_lengths,
        targets,
        target_lengths,
        blank=blank,
        reduction="mean",
        zero_infinity=True,
        sample_weights=sample_weights,
    )


@partial(jax.jit, static_argnames=("blank",))
def ctc_forced_align(
    log_probs: jax.Array,
    logit_lengths: jax.Array,
    targets: jax.Array,
    target_lengths: jax.Array,
    blank: int,
):
    """Viterbi forced alignment: the best CTC path for each (audio, text).

    Same lattice as :func:`ctc_forward_scores` with max in place of
    logsumexp, plus a backpointer trace — both as ``lax.scan``s over time
    (static shapes, jits cleanly, batched).  The per-frame *state* sequence
    distinguishes repeated tokens, so token time spans fall out directly
    (:func:`alignment_segments`).  The reference has no alignment support
    (torchaudio gained ``forced_align`` separately); beyond-parity tool for
    timestamping and corpus segmentation.

    Args:
        log_probs: ``(batch, time, vocab)`` log-softmax outputs.
        logit_lengths / targets / target_lengths / blank: as in
            :func:`ctc_forward_scores`.

    Returns:
        ``(states, labels, scores)``: extended-lattice state per frame
        ``(batch, time)`` int32 (state ``2i+1`` = target token ``i``, even =
        blank; frames past a sample's length repeat its end state — mask by
        length), per-frame label ids ``(batch, time)`` int32, and best-path
        log-probs ``(batch,)`` (``-inf`` when no alignment fits, e.g.
        ``time < 2 * target_length`` alignments).
    """
    batch, max_t, _ = log_probs.shape
    max_l = targets.shape[1]
    s_dim = 2 * max_l + 1

    targets = targets.astype(jnp.int32)
    logit_lengths = logit_lengths.astype(jnp.int32)
    target_lengths = target_lengths.astype(jnp.int32)

    z = jnp.full((batch, s_dim), blank, dtype=jnp.int32)
    z = z.at[:, 1::2].set(targets)
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :s_dim]
    is_label = jnp.arange(s_dim) % 2 == 1
    skip_ok = is_label[None, :] & (z != z_prev2)

    lp_z = jnp.take_along_axis(log_probs, z[:, None, :], axis=2)
    lp_z = jnp.moveaxis(lp_z, 1, 0)  # (T, B, S)

    neg = jnp.asarray(_NEG, log_probs.dtype)
    alpha0 = jnp.full((batch, s_dim), neg, dtype=log_probs.dtype)
    alpha0 = alpha0.at[:, 0].set(lp_z[0][:, 0])
    if s_dim > 1:
        first_label = jnp.where(target_lengths > 0, lp_z[0][:, 1], neg)
        alpha0 = alpha0.at[:, 1].set(first_label)

    def fwd(alpha, inputs):
        lp_t, t = inputs
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG)[:, :s_dim]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG)[:, :s_dim]
        a2 = jnp.where(skip_ok, a2, neg)
        stacked = jnp.stack([alpha, a1, a2])  # choice = states back (0/1/2)
        choice = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        new_alpha = jnp.max(stacked, axis=0) + lp_t
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), choice

    ts = jnp.arange(1, max_t)
    alpha, choices = jax.lax.scan(fwd, alpha0, (lp_z[1:], ts))
    # choices[t-1] holds frame t's backpointer; prepend a zero row so
    # choices_full[t] indexes directly by frame
    choices_full = jnp.concatenate(
        [jnp.zeros((1, batch, s_dim), jnp.int8), choices], axis=0
    )

    end = 2 * target_lengths
    a_end = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_end1 = jnp.take_along_axis(alpha, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0]
    a_end1 = jnp.where(target_lengths > 0, a_end1, neg)
    scores = jnp.maximum(a_end, a_end1)
    end_state = jnp.where(a_end >= a_end1, end, jnp.maximum(end - 1, 0))

    # Backtrace, scanned over reversed time.  When the scan reaches a
    # sample's final frame it resets the carry to that sample's end state;
    # above it (padding frames) the carry is pinned to the end state too, so
    # the emitted tail is well-defined.
    def back(s, t):
        ch = jnp.take_along_axis(choices_full[t + 1], s[:, None], axis=1)[:, 0]
        s_prev = s - ch.astype(jnp.int32)
        s_new = jnp.where(t == logit_lengths - 1, end_state,
                          jnp.where(t < logit_lengths - 1, s_prev, s))
        return s_new, s_new

    ts_rev = jnp.arange(max_t - 1, -1, -1)
    _, states_rev = jax.lax.scan(back, end_state, ts_rev)
    states = jnp.flip(states_rev, axis=0).T  # (B, T)
    labels = jnp.take_along_axis(z, states, axis=1)
    scores = jnp.where(scores < 0.5 * _NEG, -jnp.inf, scores)
    return states.astype(jnp.int32), labels.astype(jnp.int32), scores


def alignment_segments(states, logit_lengths, target_lengths):
    """Token time spans from forced-alignment states (host-side).

    Args:
        states: ``(batch, time)`` from :func:`ctc_forced_align`.
        logit_lengths / target_lengths: valid frames / tokens per sample.

    Returns:
        Per sample, a list of ``(start_frame, end_frame_exclusive)`` — entry
        ``i`` is the span of target token ``i`` (lattice state ``2i+1``).
    """
    states = np.asarray(states)
    out = []
    for b in range(states.shape[0]):
        row = states[b, : int(logit_lengths[b])]
        spans = []
        for i in range(int(target_lengths[b])):
            idx = np.nonzero(row == 2 * i + 1)[0]
            spans.append((int(idx[0]), int(idx[-1]) + 1) if idx.size else (0, 0))
        out.append(spans)
    return out


@jax.jit
def greedy_decode(logits: jax.Array) -> jax.Array:
    """Greedy (argmax) token ids per frame: ``(batch, time, vocab)`` -> ``(batch, time)``."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def collapse_ctc(ids: np.ndarray, lengths: np.ndarray | None = None, remove_repeated: bool = True):
    """Host-side CTC collapse: drop consecutive repeats (keep blanks for the
    text transform to strip, mirroring ``torch.unique_consecutive`` semantics
    in the reference's ``decode_prediction``, `text_processing/transform.py:93-122`).

    Args:
        ids: ``(batch, time)`` int array.
        lengths: optional valid frame counts per sample.

    Returns:
        list of 1-D numpy arrays of collapsed ids (consecutive duplicates
        removed, blanks retained).
    """
    ids = np.asarray(ids)
    out = []
    for b in range(ids.shape[0]):
        row = ids[b, : int(lengths[b])] if lengths is not None else ids[b]
        if remove_repeated and row.size:
            keep = np.ones(row.shape, dtype=bool)
            keep[1:] = row[1:] != row[:-1]
            row = row[keep]
        out.append(row)
    return out
