"""Compiled-on-TPU numerics smoke checks for every Pallas kernel.

CI runs the kernels only under the Pallas *interpreter* (tests force CPU);
this module is the on-hardware tier: each check runs the kernel COMPILED on
the current backend against its XLA reference on tiny shapes and reports the
max deviation.  Two consumers:

- ``tests_tpu/`` — a ``pytest tests_tpu`` run on a TPU host (auto-skips
  elsewhere);
- ``bench.py`` — the driver's per-round bench invokes :func:`run_selftests`
  before reporting RTF, so every recorded number is backed by same-session
  kernel-numerics validation on the same chip.

(The reference validates its exported graphs with script-vs-eager parity
tests, `/root/reference/tests/quartznet/test_transform_qn.py:62-72`; this is
the analogous compiled-vs-reference discipline for Pallas.)
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["run_selftests", "KERNEL_CHECKS"]


def _check_frontend() -> float:
    from thunder_tpu.kernels.frontend_pallas import fused_log_mel
    from thunder_tpu.ops.stft import mel_features, preemphasis

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.2)
    got = fused_log_mel(audio, dft_precision="highest")
    want = mel_features(preemphasis(audio, 0.97), 16000, 512, 160, 320, 64)
    return float(jnp.max(jnp.abs(got - want)))


def _check_separable_conv() -> float:
    from thunder_tpu.kernels.separable_conv import fused_separable_conv
    from thunder_tpu.ops.conv import conv1d

    rng = np.random.default_rng(1)
    b, t, c, co, k = 4, 256, 128, 128, 33
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32) * 0.1)
    dw = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32) * 0.1)
    pw = jnp.asarray(rng.standard_normal((c, co)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    got = fused_separable_conv(x, dw, pw, scale, bias, kernel_size=k, relu=True)
    y = conv1d(x, dw[:, None, :], padding=k // 2, groups=c)
    want = jnp.maximum(jnp.matmul(y, pw) * scale + bias, 0.0)
    return float(jnp.max(jnp.abs(got - want)))


def _check_repeat_tm() -> float:
    from thunder_tpu.kernels.repeat_tm import fused_repeat_tm
    from thunder_tpu.ops.conv import conv1d

    rng = np.random.default_rng(2)
    t, b, c, co, k = 256, 16, 128, 128, 33
    x_bt = rng.standard_normal((b, t, c)).astype(np.float32) * 0.1
    lengths = np.full((b,), t, np.int32)
    dw = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32) * 0.1)
    pw = jnp.asarray(rng.standard_normal((c, co)).astype(np.float32) * 0.1)
    scale = jnp.ones((co,), jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)
    x_tm = jnp.asarray(np.transpose(x_bt, (1, 0, 2)))
    got = fused_repeat_tm(x_tm, jnp.asarray(lengths), dw, pw, scale, bias, kernel_size=k)
    got = jnp.transpose(got, (1, 0, 2))
    y = conv1d(jnp.asarray(x_bt), dw[:, None, :], padding=k // 2, groups=c)
    want = jnp.maximum(jnp.matmul(y, pw), 0.0)
    return float(jnp.max(jnp.abs(got - want)))


def _check_beam() -> float:
    """Device Pallas beam vs the XLA scan path: exact hypothesis agreement
    (returns 0.0 on agreement, inf on any sequence mismatch)."""
    from thunder_tpu.ops.ctc_beam_device import beam_search_device

    rng = np.random.default_rng(3)
    b, t, v = 8, 64, 29
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    logits[:, :, 0] += 2.0  # blank-dominated, like real CTC posteriors
    lengths = np.linspace(t // 2, t, b).astype(np.int32)
    kw = dict(blank=0, beam_width=8)
    pallas_hyps = beam_search_device(jnp.asarray(logits), jnp.asarray(lengths), use_pallas=True, **kw)
    scan_hyps = beam_search_device(jnp.asarray(logits), jnp.asarray(lengths), use_pallas=False, **kw)
    agree = all(h.tolist() == s.tolist() for h, s in zip(pallas_hyps, scan_hyps))
    return 0.0 if agree else float("inf")


def _check_attn_onepanel() -> float:
    """One-panel MHA kernel vs unfused bf16 attention (same storage dtypes)."""
    from thunder_tpu.kernels.attn_onepanel import mha_from_qkv

    rng = np.random.default_rng(4)
    b, t, heads, dh = 2, 256, 4, 64
    h = heads * dh
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h)).astype(np.float32) * 0.3, jnp.bfloat16)
    lengths = jnp.asarray([t, t - 57], jnp.int32)
    got = mha_from_qkv(qkv, lengths, heads=heads, block_q=128)
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
    split = lambda a: a.reshape(b, t, heads, dh)
    q, k, v = split(q) * dh**-0.5, split(k), split(v)
    scores = jnp.einsum("bthd,bshd->bhts", q, k)
    valid = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    probs = jax.nn.softmax(jnp.where(valid, scores, -jnp.inf), axis=-1)
    want = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, h)
    # compare on valid query rows only (padded queries attend uniformly)
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, :, None]
    diff = jnp.where(mask, got.astype(jnp.float32) - want, 0.0)
    return float(jnp.max(jnp.abs(diff)))


def _check_add_ln() -> float:
    """Fused add+LayerNorm kernel vs flax ``nn.LayerNorm(x + y)``."""
    import flax.linen as nn

    from thunder_tpu.kernels.add_ln import add_layer_norm

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 128, 256)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((4, 128, 256)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(256).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    got = add_layer_norm(x, y, scale, bias, eps=1e-5).astype(jnp.float32)
    ref = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    want = ref.apply({"params": {"scale": scale, "bias": bias}}, x + y).astype(jnp.float32)
    return float(jnp.max(jnp.abs(got - want)))


KERNEL_CHECKS: Dict[str, tuple[Callable[[], float], float]] = {
    # name -> (check fn returning max abs deviation, tolerance)
    "frontend_log_mel": (_check_frontend, 2e-3),  # log-mel units
    "separable_conv": (_check_separable_conv, 2e-3),
    "repeat_tm": (_check_repeat_tm, 2e-3),
    "beam_device": (_check_beam, 0.5),  # exact agreement (0 or inf)
    "attn_onepanel": (_check_attn_onepanel, 2e-2),  # bf16 q/k/v storage
    "add_ln": (_check_add_ln, 8e-2),  # bf16 residual add in the reference
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
