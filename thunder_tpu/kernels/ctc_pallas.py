"""Pallas CTC forward-backward recursion: the scan loop at silicon speed.

The reference reaches CTC through torch's cuDNN/ATen kernel
(`/root/reference/src/thunder/ctc_loss.py:39-47`).  The TPU-native loss in
``ops/ctc.py`` runs the log-semiring alpha recursion as a ``lax.scan`` —
numerically exact, but each of the T≈750 scan iterations touches only a
``(B, 2L+1)`` tile (microseconds of VPU work), so the loop is bound by
per-iteration scan overhead, not compute: ~3-5 ms of a training step
(measured in the round-5 residual ablation; ``THUNDER_CTC_UNROLL`` A/B'd
flat).  This module replaces ONLY the recursion with two Pallas kernels
that keep the state tile resident in VMEM across a sequential T-grid:

- the forward kernel runs the alpha recursion (grid over T, alpha carried
  in scratch, one ``(1, B, S)`` emission block streamed per step) and
  writes the full alpha tensor for the backward;
- the backward kernel runs the beta recursion over a REVERSED T index map
  and emits ``dL/d lp_z`` directly via the occupancy identity
  ``gamma[t,s] = alpha[t,s] + beta[t,s] - ll``.

Everything around the recursion — extended-label construction, the
``take_along_axis`` gather (whose transpose scatters grads back to the
vocab axis), the end-state logsumexp, reductions, zero_infinity — stays in
XLA, identical to the scan path; the custom_vjp boundary is exactly
``lp_z (T, B, S) -> ll (B,)``.  The scan path remains the reference and
the fallback (CPU, kill switch THUNDER_CTC_PALLAS=0); equality of loss AND
gradient between the two paths is pinned in tests/test_ctc_pallas.py and
the on-chip ``ctc_recursion`` selftest.

Length semantics match the scan exactly: alpha freezes past each sample's
last valid frame (the tail reads alpha at ``t = length - 1``), padded
frames and padded S lanes contribute exactly zero gradient, and samples
whose target is impossible (T < extended-path length) keep their ~-1e30
end states so the +inf / zero_infinity handling outside is unchanged
(their incoming cotangent is zero, which also zeroes the kernel's dlp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ctc_ll_pallas"]

_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _shift_right(x, k):
    """Shift lanes (state axis) right by k, filling with _NEG."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= k, pltpu.roll(x, shift=k, axis=1), jnp.full_like(x, _NEG))


def _shift_left(x, k, s_pad):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # pltpu.roll requires a non-negative shift: left-by-k == right-by-(S-k)
    return jnp.where(
        lane < s_pad - k, pltpu.roll(x, shift=s_pad - k, axis=1), jnp.full_like(x, _NEG)
    )


def _alpha_kernel(lp_ref, skip_ref, lens_ref, tl_ref, alpha_out, alpha_scr, *, k_block):
    # K timesteps per grid step: the per-step grid/DMA overhead dominated a
    # one-frame-per-step layout (751 steps x ~2 us ate the win vs the scan)
    tb = pl.program_id(0)
    lens = lens_ref[...]  # (B, S) broadcast logit lengths
    skip = skip_ref[...] > 0
    for k in range(k_block):
        t = tb * k_block + k
        lp = lp_ref[k]  # (B, S) emissions at frame t
        neg = jnp.full_like(lp, _NEG)
        if k == 0:
            @pl.when(t == 0)
            def _():
                lane = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)
                # alpha0: state 0 = leading blank; state 1 = first label iff
                # the target is non-empty; everything else impossible
                init = jnp.where(lane == 0, lp, neg)
                init = jnp.where((lane == 1) & (tl_ref[...] > 0), lp, init)
                alpha_scr[...] = init

        @pl.when(t > 0)
        def _():
            alpha = alpha_scr[...]
            a1 = _shift_right(alpha, 1)
            a2 = jnp.where(skip, _shift_right(alpha, 2), neg)
            new_alpha = _lse3(alpha, a1, a2) + lp
            # freeze past each sample's last valid frame (scan parity: the
            # final carry equals alpha at t = length - 1)
            alpha_scr[...] = jnp.where(t < lens, new_alpha, alpha)

        alpha_out[k] = alpha_scr[...]


def _beta_kernel(
    lp_ref, alpha_ref, skip_ref, lens_ref, end_ref, llg_ref, dlp_out, bb_scr,
    *, s_pad, t_total, k_block,
):
    # reversed index map over K-frame blocks: program 0 holds the LAST block
    tb = pl.num_programs(0) - 1 - pl.program_id(0)
    lens = lens_ref[...]
    skip = skip_ref[...] > 0
    for k in range(k_block - 1, -1, -1):
        t = tb * k_block + k
        lp = lp_ref[k]
        neg = jnp.full_like(lp, _NEG)

        # bb[t] = beta[t] + lp[t] (emission-inclusive, so each step needs
        # only its own lp block):
        #   at t == len-1: lp on the two end states;
        #   at t <  len-1: lp + lse3(bb[t+1] shifted left by 0/1/2)
        # (the uninitialized first-step scratch read is discarded by the
        # selects below: every sample is in the init or past-length branch)
        bb_prev = jnp.where(t == t_total - 1, neg, bb_scr[...])
        b1 = _shift_left(bb_prev, 1, s_pad)
        # the skip transition s -> s+2 is gated by skip_ok at the DESTINATION
        b2 = _shift_left(jnp.where(skip, bb_prev, neg), 2, s_pad)
        rec = _lse3(bb_prev, b1, b2) + lp
        init = jnp.where(end_ref[...] > 0, lp, neg)
        bb = jnp.where(t == lens - 1, init, jnp.where(t < lens - 1, rec, neg))
        bb_scr[...] = bb

        # dL/dlp_z[t,s] = ghat_b * exp(alpha + beta - ll)
        #              = ghat_b * exp(alpha + bb - lp - ll); zero past length
        g = jnp.exp(alpha_ref[k] + bb - lp - llg_ref[0])
        dlp_out[k] = jnp.where(t < lens, g * llg_ref[1], jnp.zeros_like(g))


_K_BLOCK = 16


def _alpha_call(lp, skip_f, lens_f, tl_f, interpret):
    t_pad, b_pad, s_pad = lp.shape
    nb = t_pad // _K_BLOCK
    plane = pl.BlockSpec((b_pad, s_pad), lambda t: (0, 0))
    blk = pl.BlockSpec((_K_BLOCK, b_pad, s_pad), lambda t: (t, 0, 0))
    return pl.pallas_call(
        functools.partial(_alpha_kernel, k_block=_K_BLOCK),
        grid=(nb,),
        in_specs=[blk, plane, plane, plane],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), jnp.float32)],
        interpret=interpret,
    )(lp, skip_f, lens_f, tl_f)


def _beta_call(lp, alpha, skip_f, lens_f, end_f, ll_b, ghat, t_total, interpret):
    t_pad, b_pad, s_pad = lp.shape
    nb = t_pad // _K_BLOCK
    rev = lambda t: (nb - 1 - t, 0, 0)
    plane = pl.BlockSpec((b_pad, s_pad), lambda t: (0, 0))
    blk = pl.BlockSpec((_K_BLOCK, b_pad, s_pad), rev)
    llg = jnp.stack(
        [
            jnp.broadcast_to(ll_b[:, None], (b_pad, s_pad)),
            jnp.broadcast_to(ghat[:, None], (b_pad, s_pad)),
        ]
    )
    return pl.pallas_call(
        functools.partial(_beta_kernel, s_pad=s_pad, t_total=t_total, k_block=_K_BLOCK),
        grid=(nb,),
        in_specs=[
            blk,
            blk,
            plane,
            plane,
            plane,
            pl.BlockSpec((2, b_pad, s_pad), lambda t: (0, 0, 0)),
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), jnp.float32)],
        interpret=interpret,
    )(lp, alpha, skip_f, lens_f, end_f, llg)


def _prep(lp_z, skip_ok, logit_lengths, target_lengths):
    """Pad (T, B, S) to tile-aligned (T multiple of the K block, B multiple
    of 8, S multiple of 128) and build the broadcast helper planes the
    kernels consume.  Padded frames sit past every sample's length, so the
    freeze/zero gates make them exactly inert."""
    t_total, b, s_dim = lp_z.shape
    t_pad = _round_up(t_total, _K_BLOCK)
    b_pad = _round_up(max(b, 8), 8)
    s_pad = _round_up(s_dim, 128)
    lp = jnp.pad(
        lp_z.astype(jnp.float32),
        ((0, t_pad - t_total), (0, b_pad - b), (0, s_pad - s_dim)),
        constant_values=_NEG,
    )
    skip_f = jnp.pad(skip_ok.astype(jnp.float32), ((0, b_pad - b), (0, s_pad - s_dim)))
    lens_f = jnp.broadcast_to(
        jnp.pad(logit_lengths.astype(jnp.int32), (0, b_pad - b))[:, None].astype(jnp.float32),
        (b_pad, s_pad),
    )
    tl = target_lengths.astype(jnp.int32)
    tl_f = jnp.broadcast_to(
        jnp.pad(tl, (0, b_pad - b))[:, None].astype(jnp.float32), (b_pad, s_pad)
    )
    end = 2 * tl
    lane = jnp.arange(s_dim)[None, :]
    end_states = (lane == end[:, None]) | (
        (lane == jnp.maximum(end - 1, 0)[:, None]) & (tl[:, None] > 0)
    )
    end_f = jnp.pad(end_states.astype(jnp.float32), ((0, b_pad - b), (0, s_pad - s_dim)))
    return lp, skip_f, lens_f, tl_f, end_f


def _ll_from_alpha(alpha_full, logit_lengths, target_lengths, b):
    # alpha at t = len-1 per sample == the scan path's frozen final carry
    t_idx = jnp.maximum(logit_lengths.astype(jnp.int32) - 1, 0)
    a_fin = alpha_full[t_idx, jnp.arange(b)]  # (B, S_pad)
    end = 2 * target_lengths.astype(jnp.int32)
    a_end = jnp.take_along_axis(a_fin, end[:, None], axis=1)[:, 0]
    a_end1 = jnp.take_along_axis(a_fin, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0]
    a_end1 = jnp.where(target_lengths > 0, a_end1, _NEG)
    m = jnp.maximum(a_end, a_end1)
    return m + jnp.log(jnp.exp(a_end - m) + jnp.exp(a_end1 - m))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_core(lp_z, skip_ok, logit_lengths, target_lengths, interpret):
    ll, _ = _ctc_core_fwd(lp_z, skip_ok, logit_lengths, target_lengths, interpret)
    return ll


def _ctc_core_fwd(lp_z, skip_ok, logit_lengths, target_lengths, interpret):
    b = lp_z.shape[1]
    lp, skip_f, lens_f, tl_f, end_f = _prep(lp_z, skip_ok, logit_lengths, target_lengths)
    alpha = _alpha_call(lp, skip_f, lens_f, tl_f, interpret)
    ll = _ll_from_alpha(alpha, logit_lengths, target_lengths, b)
    # lp_z rides along only as the static (B, S) shape carrier for bwd's
    # unpad slice; it shares buffers with lp's source so costs no copy
    return ll, (lp, alpha, skip_f, lens_f, end_f, ll, lp_z)


def _ctc_core_bwd(interpret, res, ghat):
    lp, alpha, skip_f, lens_f, end_f, ll, lp_z = res
    _, b, s_dim = lp_z.shape
    b_pad = lp.shape[1]
    ll_p = jnp.pad(ll, (0, b_pad - b))
    g_p = jnp.pad(ghat.astype(jnp.float32), (0, b_pad - b))
    dlp = _beta_call(lp, alpha, skip_f, lens_f, end_f, ll_p, g_p, lp.shape[0], interpret)
    dlp = dlp[: lp_z.shape[0], :b, :s_dim].astype(lp_z.dtype)
    return dlp, None, None, None


_ctc_core.defvjp(_ctc_core_fwd, _ctc_core_bwd)


def ctc_ll_pallas(lp_z, skip_ok, logit_lengths, target_lengths, interpret=False):
    """Per-sample CTC log-likelihood via the Pallas recursion.

    ``lp_z``: ``(T, B, S)`` per-extended-state emission log-probs (the
    ``take_along_axis`` gather in :func:`ops.ctc.ctc_forward_scores`);
    ``skip_ok``: ``(B, S)`` bool skip-transition mask; lengths ``(B,)``.
    Returns ``ll (B,)`` — impossible alignments stay at ~-1e30, handled by
    the caller exactly like the scan path.  Differentiable w.r.t. ``lp_z``.
    """
    return _ctc_core(lp_z, skip_ok, logit_lengths, target_lengths, bool(interpret))
