"""Compiled-on-TPU numerics smoke checks for every Pallas kernel.

CI runs the kernels only under the Pallas *interpreter* (tests force CPU);
this module is the on-hardware tier: each check runs the kernel COMPILED on
the current backend against its XLA reference and reports the deviation.
Two consumers:

- ``tests_tpu/`` — a ``pytest tests_tpu`` run on a TPU host (auto-skips
  elsewhere);
- ``bench.py`` — the driver's per-round bench invokes :func:`run_selftests`
  before reporting RTF, so every recorded number is backed by same-session
  kernel-numerics validation on the same chip.

Tolerances are DERIVED, not fitted (round-4 hardening): every check whose
comparison is bounded by bf16 storage/compute rounding reports its error in
units of the bf16 ULP at the reference's max magnitude —
``max|got - want| / ulp_bf16(max|want|)`` — so the bound scales with shape
and activation magnitude instead of being a per-shape magic constant.  A
kernel that rounds its output to bf16 once sits at <= 0.5 ULP plus small
reduction-order noise; the gates allow small integer multiples of that.
Checks against effectively-exact f32 references keep absolute tolerances
with >= 100x measured headroom.

(The reference validates its exported graphs with script-vs-eager parity
tests, `/root/reference/tests/quartznet/test_transform_qn.py:62-72`; this is
the analogous compiled-vs-reference discipline for Pallas.)
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["run_selftests", "KERNEL_CHECKS", "ulp_bf16_error"]


def ulp_bf16_error(got, want) -> float:
    """``max|got - want|`` in units of the bf16 ULP at ``max|want|``.

    bf16 has 8 significand bits, so ``ulp(v) = 2**(floor(log2|v|) - 7)``.
    Normalizing by the ULP at the reference's max magnitude is the standard
    mixed-precision forward-error measure: one output-rounding step
    contributes <= 0.5, so an error of k means "k bf16 rounding steps at the
    tensor's scale" regardless of shape or activation magnitude.
    """
    got = jnp.asarray(got, jnp.float32)
    want = jnp.asarray(want, jnp.float32)
    mag = jnp.maximum(jnp.max(jnp.abs(want)), 2.0**-14)
    ulp = 2.0 ** (jnp.floor(jnp.log2(mag)) - 7)
    return float(jnp.max(jnp.abs(got - want)) / ulp)


def _check_frontend() -> float:
    from thunder_tpu.kernels.frontend_pallas import fused_log_mel
    from thunder_tpu.ops.stft import mel_features, preemphasis

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.2)
    got = fused_log_mel(audio, dft_precision="highest")
    want = mel_features(preemphasis(audio, 0.97), 16000, 512, 160, 320, 64)
    return float(jnp.max(jnp.abs(got - want)))


def _check_frontend_serving() -> float:
    """The kernel in its SERVING precision (``dft_precision="auto"`` = the
    3-pass bf16 DFT split on TPU) vs the exact f32 pipeline — the config the
    engine actually runs, not just the "highest" validation mode.  The
    split's documented deviation is <= ~5.4e-3 log-mel units
    (docs/benchmarks.md); tolerance gives ~4x headroom."""
    from thunder_tpu.kernels.frontend_pallas import fused_log_mel
    from thunder_tpu.ops.stft import mel_features, preemphasis

    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.2)
    got = fused_log_mel(audio, dft_precision="auto")
    want = mel_features(preemphasis(audio, 0.97), 16000, 512, 160, 320, 64)
    return float(jnp.max(jnp.abs(got - want)))


def _check_separable_conv() -> float:
    """Fused depthwise+pointwise+BN+ReLU vs the XLA ops, bf16-ULP units.

    QuartzNet15x5 body shape (c=512 channels, k=33) at speech-scale
    activations; both sides run the backend's default matmul precision, so
    the deviation is reduction-order noise at bf16 compute — a few ULP.
    """
    from thunder_tpu.kernels.separable_conv import fused_separable_conv
    from thunder_tpu.ops.conv import conv1d

    rng = np.random.default_rng(1)
    b, t, c, co, k = 4, 384, 512, 512, 33
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    dw = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32) * 0.1)
    pw = jnp.asarray(rng.standard_normal((c, co)).astype(np.float32) * 0.05)
    scale = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    got = fused_separable_conv(x, dw, pw, scale, bias, kernel_size=k, relu=True)
    y = conv1d(x, dw[:, None, :], padding=k // 2, groups=c)
    want = jnp.maximum(jnp.matmul(y, pw) * scale + bias, 0.0)
    return ulp_bf16_error(got, want)


def _check_repeat_tm() -> float:
    """Time-major repeat kernel vs XLA ops, bf16-ULP units (same rationale
    as separable_conv)."""
    from thunder_tpu.kernels.repeat_tm import fused_repeat_tm
    from thunder_tpu.ops.conv import conv1d

    rng = np.random.default_rng(2)
    t, b, c, co, k = 384, 16, 256, 256, 33
    x_bt = rng.standard_normal((b, t, c)).astype(np.float32)
    lengths = np.full((b,), t, np.int32)
    dw = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32) * 0.1)
    pw = jnp.asarray(rng.standard_normal((c, co)).astype(np.float32) * 0.05)
    scale = jnp.ones((co,), jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)
    x_tm = jnp.asarray(np.transpose(x_bt, (1, 0, 2)))
    got = fused_repeat_tm(x_tm, jnp.asarray(lengths), dw, pw, scale, bias, kernel_size=k)
    got = jnp.transpose(got, (1, 0, 2))
    y = conv1d(jnp.asarray(x_bt), dw[:, None, :], padding=k // 2, groups=c)
    want = jnp.maximum(jnp.matmul(y, pw), 0.0)
    return ulp_bf16_error(got, want)


def _check_beam() -> float:
    """Device Pallas beam vs the XLA scan path: exact hypothesis agreement
    (returns 0.0 on agreement, inf on any sequence mismatch).  Runs the
    PRODUCTION serving shape behind the 8.1 ms/batch claim
    (docs/benchmarks.md): B=64, T=751 frames (15 s QuartzNet), V=29,
    beam 16."""
    from thunder_tpu.ops.ctc_beam_device import beam_search_device

    rng = np.random.default_rng(3)
    b, t, v = 64, 751, 29
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    logits[:, :, 0] += 2.0  # blank-dominated, like real CTC posteriors
    lengths = np.linspace(t // 2, t, b).astype(np.int32)
    kw = dict(blank=0, beam_width=16)
    pallas_hyps = beam_search_device(jnp.asarray(logits), jnp.asarray(lengths), use_pallas=True, **kw)
    scan_hyps = beam_search_device(jnp.asarray(logits), jnp.asarray(lengths), use_pallas=False, **kw)
    agree = all(h.tolist() == s.tolist() for h, s in zip(pallas_hyps, scan_hyps))
    return 0.0 if agree else float("inf")


def _attn_onepanel_err(b: int, t: int, heads: int, block_q: int, seed: int) -> float:
    """One-panel MHA kernel vs f32 unfused attention on the same bf16
    q/k/v, bf16-ULP units.  The kernel accumulates in f32 and rounds the
    output to bf16 once; softmax/accumulation order differences add small
    noise on top of that 0.5-ULP rounding step."""
    from thunder_tpu.kernels.attn_onepanel import mha_from_qkv

    rng = np.random.default_rng(seed)
    dh = 64
    h = heads * dh
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h)).astype(np.float32), jnp.bfloat16)
    lengths = jnp.asarray([t] + [t - 57] * (b - 1), jnp.int32)
    got = mha_from_qkv(qkv, lengths, heads=heads, block_q=block_q)
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
    split = lambda a: a.reshape(b, t, heads, dh)
    q, k, v = split(q) * dh**-0.5, split(k), split(v)
    scores = jnp.einsum("bthd,bshd->bhts", q, k, precision="highest")
    valid = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    probs = jax.nn.softmax(jnp.where(valid, scores, -jnp.inf), axis=-1)
    want = jnp.einsum("bhts,bshd->bthd", probs, v, precision="highest").reshape(b, t, h)
    # compare on valid query rows only (padded queries attend uniformly)
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, :, None]
    got = jnp.where(mask, got.astype(jnp.float32), 0.0)
    want = jnp.where(mask, want, 0.0)
    return ulp_bf16_error(got, want)


def _check_attn_onepanel() -> float:
    return _attn_onepanel_err(b=2, t=256, heads=4, block_q=128, seed=4)


def _check_attn_onepanel_1536() -> float:
    """The 30 s serving shape: T=1536 frames, wav2vec2-base head count, the
    production block_q=512 (engine gate at models/wav2vec2.py)."""
    return _attn_onepanel_err(b=2, t=1536, heads=12, block_q=512, seed=6)


def _attn_train_ref(qkv, lengths, heads, mask=None, keep=1.0):
    b, t, h3 = qkv.shape
    h = h3 // 3
    dh = h // heads
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
    split = lambda a: a.reshape(b, t, heads, dh)
    q = split(q) * dh**-0.5
    s = jnp.einsum("bthd,bshd->bhts", q, split(k), precision="highest")
    valid = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        p = p * mask / keep
    return jnp.einsum("bhts,bshd->bthd", p, split(v), precision="highest").reshape(b, t, h)


def _check_attn_train_grad() -> float:
    """Training attention kernel (custom_vjp) gradient vs autodiff of the f32
    unfused reference on the same bf16 qkv, bf16-ULP units on the packed
    [dq|dk|dv] cotangent.  wav2vec2-base train shape (12 heads, T=768);
    dropout off (the dropout check below covers the masked path)."""
    from thunder_tpu.kernels.attn_train import mha_train

    rng = np.random.default_rng(8)
    b, t, heads = 2, 768, 12
    h = heads * 64
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h)).astype(np.float32) * 0.3, jnp.bfloat16)
    lengths = jnp.asarray([t, t - 129], jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)
    qmask = (jnp.arange(t)[None, :] < lengths[:, None])[:, :, None]
    ct = jnp.asarray(
        rng.standard_normal((b, t, h)).astype(np.float32) * np.asarray(qmask), jnp.bfloat16
    )
    gk = jax.grad(
        lambda x: jnp.vdot(mha_train(x, lengths, seed, heads=heads).astype(jnp.float32),
                           ct.astype(jnp.float32))
    )(qkv)
    gr = jax.grad(
        lambda x: jnp.vdot(_attn_train_ref(x, lengths, heads), ct.astype(jnp.float32))
    )(qkv.astype(jnp.float32))
    return ulp_bf16_error(gk.astype(jnp.float32), gr)


def _check_attn_train_dropout(t: int = 128) -> float:
    """In-kernel attention-prob dropout, validated end-to-end on chip:

    1. determinism: same seed -> bit-identical output (inf on mismatch);
    2. the exact dropout mask is RECOVERED by running the kernel with
       identity-valued v panels (out = P_d directly), then checked to be
       binary with kept fraction within 5 sigma of 1-rate;
    3. fwd and custom-vjp grads must match the f32 unfused reference
       applying that recovered mask — returned in bf16-ULP units.

    The ``t=1536`` registration exercises the regime where the forward
    (bq=256) and backward (bq=128) tile the q dimension DIFFERENTLY — the
    regression gate for the 128-row-slab mask keying (`attn_train.py
    _dropout_keep_masks`): q-block-keyed masks made the backward apply
    different bits than the forward there.
    """
    from thunder_tpu.kernels.attn_train import mha_train

    rng = np.random.default_rng(9)
    b, heads, rate = 2, 2, 0.3
    h = heads * 64
    keep = 1.0 - rate
    q = rng.standard_normal((b, t, h)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, t, h)).astype(np.float32) * 0.3
    lengths = jnp.full((b,), t, jnp.int32)
    seed = jnp.asarray([20260821], jnp.int32)

    pd_parts = []
    for off in range(0, t, 64):  # identity-v probes recover 64 key columns each
        v = np.zeros((b, t, h), np.float32)
        for hh in range(heads):
            for j in range(64):
                v[:, off + j, hh * 64 + j] = 1.0
        qkv = jnp.asarray(np.concatenate([q, k, v], axis=-1), jnp.bfloat16)
        out = mha_train(qkv, lengths, seed, heads=heads, dropout_rate=rate)
        out2 = mha_train(qkv, lengths, seed, heads=heads, dropout_rate=rate)
        if not bool(jnp.all(out == out2)):
            return float("inf")  # nondeterministic
        o = np.asarray(out.astype(jnp.float32))
        pd_parts.append(o.reshape(b, t, heads, 64).transpose(0, 2, 1, 3))
    p_d = np.concatenate(pd_parts, axis=-1)

    qkv32 = jnp.asarray(np.concatenate([q, k, np.zeros_like(q)], axis=-1), jnp.bfloat16)
    p_ref = np.asarray(
        jax.nn.softmax(
            jnp.einsum(
                "bthd,bshd->bhts",
                jnp.split(qkv32.astype(jnp.float32), 3, axis=-1)[0].reshape(b, t, heads, 64) * 64**-0.5,
                jnp.split(qkv32.astype(jnp.float32), 3, axis=-1)[1].reshape(b, t, heads, 64),
                precision="highest",
            ),
            axis=-1,
        )
    )
    ratio = p_d * keep / np.maximum(p_ref, 1e-9)
    if float(np.minimum(np.abs(ratio), np.abs(ratio - 1.0)).max()) > 0.05:
        return float("inf")  # mask not binary
    n = ratio.size
    kept = float((ratio > 0.5).mean())
    if abs(kept - keep) > 5.0 * (keep * rate / n) ** 0.5:
        return float("inf")  # kept fraction off

    mask = jnp.asarray((ratio > 0.5).astype(np.float32))
    v = rng.standard_normal((b, t, h)).astype(np.float32) * 0.3
    qkv = jnp.asarray(np.concatenate([q, k, v], axis=-1), jnp.bfloat16)
    ct = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32), jnp.bfloat16)
    fwd = mha_train(qkv, lengths, seed, heads=heads, dropout_rate=rate)
    fwd_ref = _attn_train_ref(qkv, lengths, heads, mask=mask, keep=keep)
    err_f = ulp_bf16_error(fwd.astype(jnp.float32), fwd_ref)
    gk = jax.grad(
        lambda x: jnp.vdot(mha_train(x, lengths, seed, heads=heads, dropout_rate=rate).astype(jnp.float32),
                           ct.astype(jnp.float32))
    )(qkv)
    gr = jax.grad(
        lambda x: jnp.vdot(_attn_train_ref(x, lengths, heads, mask=mask, keep=keep),
                           ct.astype(jnp.float32))
    )(qkv.astype(jnp.float32))
    err_g = ulp_bf16_error(gk.astype(jnp.float32), gr)
    return max(err_f, err_g)


def _check_add_ln_train() -> float:
    """Fused train add+dropout+LayerNorm (custom_vjp) vs an f32 reference
    applying the kernel's own recovered mask (``dropout_keep_mask`` runs the
    same PRNG stream), bf16-ULP units over fwd + dx/dy (dscale/dbias are
    f32 accumulations, checked at a tight absolute-relative bound)."""
    from thunder_tpu.kernels.add_ln_train import add_ln_dropout_train, dropout_keep_mask

    rng = np.random.default_rng(12)
    b, t, d, rate = 2, 512, 768, 0.1
    x = jnp.asarray(rng.standard_normal((b, t, d)) * 2.0, jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((b, t, d)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(d).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    seed = jnp.asarray([20260821], jnp.int32)
    ct = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32), jnp.bfloat16)
    mask = dropout_keep_mask((b, t, d), seed, rate)

    def ref(x, y, scale, bias):
        yd = y.astype(jnp.float32) * mask / (1.0 - rate)
        s = x.astype(jnp.float32) + yd
        mu = jnp.mean(s, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, jnp.mean(s * s, axis=-1, keepdims=True) - mu * mu)
        return (s - mu) * (jax.lax.rsqrt(var + 1e-5) * scale) + bias

    out = add_ln_dropout_train(x, y, scale, bias, seed, dropout_rate=rate)
    want = ref(x, y, scale, bias)
    err = ulp_bf16_error(out.astype(jnp.float32), want)
    gk = jax.grad(
        lambda *a: jnp.vdot(
            add_ln_dropout_train(*a, seed, dropout_rate=rate).astype(jnp.float32),
            ct.astype(jnp.float32),
        ),
        argnums=(0, 1, 2, 3),
    )(x, y, scale, bias)
    gr = jax.grad(
        lambda *a: jnp.vdot(ref(*a), ct.astype(jnp.float32)), argnums=(0, 1, 2, 3)
    )(x.astype(jnp.float32), y.astype(jnp.float32), scale, bias)
    err = max(err, ulp_bf16_error(gk[0].astype(jnp.float32), gr[0]))
    err = max(err, ulp_bf16_error(gk[1].astype(jnp.float32), gr[1]))
    for a, b_ in ((gk[2], gr[2]), (gk[3], gr[3])):  # f32 param grads, relative
        rel = float(jnp.max(jnp.abs(a - b_)) / jnp.maximum(jnp.max(jnp.abs(b_)), 1e-9))
        err = max(err, rel * 100.0)  # 1% rel -> 1.0 in gate units
    return err


def _check_ctc_recursion() -> float:
    """Pallas CTC alpha/beta recursion vs the lax.scan reference, compiled
    on chip at the production training shape (B=16, T=751, V=29): loss must
    match to f32 reduction-order noise and the custom-vjp gradient must
    match the scan's autodiff gradient.  Returns the max of (abs loss
    delta, grad max-abs delta scaled to ~unit gradients)."""
    import os

    from thunder_tpu.ops import ctc as ctc_mod

    rng = np.random.default_rng(11)
    b, t, v, l = 16, 751, 29, 43
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    tl = jnp.asarray(rng.integers(10, l + 1, (b,)), jnp.int32)
    targets = jnp.asarray(rng.integers(1, v, (b, l)), jnp.int32)
    lens = jnp.asarray(rng.integers(t // 2, t + 1, (b,)), jnp.int32)

    def loss_fn(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        lo = ctc_mod.ctc_forward_scores(lp, lens, targets, tl, blank=0)
        lo = jnp.where(jnp.isinf(lo), 0.0, lo)
        return jnp.sum(lo / jnp.maximum(tl, 1))

    prev = os.environ.get("THUNDER_CTC_PALLAS")
    try:
        os.environ["THUNDER_CTC_PALLAS"] = "0"
        l0, g0 = jax.jit(jax.value_and_grad(loss_fn))(logits)
        os.environ["THUNDER_CTC_PALLAS"] = "1"
        l1, g1 = jax.jit(jax.value_and_grad(lambda x: loss_fn(x * 1.0)))(logits)
    finally:
        if prev is None:
            os.environ.pop("THUNDER_CTC_PALLAS", None)
        else:
            os.environ["THUNDER_CTC_PALLAS"] = prev
    dl = float(jnp.abs(l0 - l1))
    dg = float(jnp.max(jnp.abs(g0 - g1)) / jnp.maximum(jnp.max(jnp.abs(g0)), 1e-9))
    return max(dl, dg)


def _check_add_ln() -> float:
    """Fused add+LayerNorm kernel vs an f32-add + f32-statistics reference,
    bf16-ULP units.

    The kernel's documented deviation from flax (kernels/add_ln.py) is that
    the residual add happens in f32 — so the principled reference also adds
    in f32; the remaining deviation is the single bf16 output rounding plus
    f32 reduction-order noise (<= ~1 ULP), NOT the bf16-add rounding that
    dominated the old fitted comparison.  Production shape/magnitude:
    wav2vec2-base rows (B*T=8*768) x d=768, residual-stream std ~3.
    """
    from thunder_tpu.kernels.add_ln import add_layer_norm

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 768, 768)) * 3.0, jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((8, 768, 768)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(768).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.standard_normal(768).astype(np.float32))
    got = add_layer_norm(x, y, scale, bias, eps=1e-5).astype(jnp.float32)
    s = x.astype(jnp.float32) + y.astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(s * s, axis=-1, keepdims=True) - mu * mu)
    want = (s - mu) * (jax.lax.rsqrt(var + 1e-5) * scale) + bias
    return ulp_bf16_error(got, want)


KERNEL_CHECKS: Dict[str, tuple[Callable[[], float], float]] = {
    # name -> (check fn, tolerance).  Units: absolute for f32-reference
    # checks (frontend), exact-agreement for beam, bf16 ULPs at the
    # reference's max magnitude for everything bf16-storage-bound.
    "frontend_log_mel": (_check_frontend, 2e-3),  # abs, log-mel units; ~250x headroom
    "frontend_log_mel_serving": (_check_frontend_serving, 2e-2),  # abs; 3-pass bf16 serving split
    "separable_conv": (_check_separable_conv, 8.0),  # ULPs: bf16-compute reduction order
    "beam_device": (_check_beam, 0.5),  # exact agreement (0 or inf), production shape
    "repeat_tm": (_check_repeat_tm, 8.0),  # ULPs
    "attn_onepanel": (_check_attn_onepanel, 4.0),  # ULPs: one output rounding + softmax order
    "attn_onepanel_1536": (_check_attn_onepanel_1536, 4.0),  # ULPs, 30 s serving shape
    "attn_train_grad": (_check_attn_train_grad, 8.0),  # ULPs: bf16 ds/prob panels in the bwd matmuls
    "attn_train_dropout": (_check_attn_train_dropout, 8.0),  # ULPs vs recovered-mask reference (inf = mask/determinism failure)
    "attn_train_dropout_1536": (lambda: _check_attn_train_dropout(t=1536), 8.0),  # same gate where fwd (bq=256) and bwd (bq=128) tile q differently
    "ctc_recursion": (_check_ctc_recursion, 0.01),  # abs loss delta / rel grad delta vs the scan (measured ~2e-3; f32 order + different bwd algorithm)
    "add_ln_train": (_check_add_ln_train, 8.0),  # ULPs (fwd, dx, dy) / percent-rel (dscale, dbias) vs recovered-mask f32 reference
    "add_ln": (_check_add_ln, 2.0),  # ULPs: one output rounding + f32 reduction order
}


def run_selftests(names: List[str] | None = None) -> List[dict]:
    """Run each kernel check compiled on the current backend.

    Returns a list of ``{"name", "max_err", "tol", "ok"}`` dicts; callers
    decide whether to raise.  On CPU the kernels would need interpret mode —
    these checks are meant for real hardware (the CPU-tier equivalents live
    in tests/ with ``interpret=True``).
    """
    out = []
    for name, (fn, tol) in KERNEL_CHECKS.items():
        if names is not None and name not in names:
            continue
        try:
            err = fn()
            out.append({"name": name, "max_err": err, "tol": tol, "ok": bool(err <= tol)})
        except Exception as e:  # a crash is a failure, not a skip
            out.append({"name": name, "max_err": float("inf"), "tol": tol, "ok": False, "error": repr(e)[:200]})
    return out
