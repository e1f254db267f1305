"""CPU (interpret-mode) tests for the fused train add+dropout+LayerNorm.

The dropout path needs the Mosaic PRNG (no interpreter lowering in this
jax version) — its on-chip validation recovers the kernel's own mask via
``dropout_keep_mask`` in the ``add_ln_train`` selftest.  Here: rate=0
fwd + full custom_vjp gradient parity (x, y, scale, bias) against the
unfused reference, argument validation, and gate semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.kernels.add_ln_train import add_ln_dropout_train

EPS = 1e-5


def _reference(x, y, scale, bias):
    s = x + y
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(s * s, axis=-1, keepdims=True) - mu * mu)
    return (s - mu) * (jax.lax.rsqrt(var + EPS) * scale) + bias


@pytest.fixture()
def case():
    rng = np.random.default_rng(0)
    b, t, d = 2, 256, 256
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 2.0)
    y = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(d).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    return x, y, scale, bias, ct


def test_forward_matches_reference(case):
    x, y, scale, bias, _ = case
    seed = jnp.zeros((1,), jnp.int32)
    out = add_ln_dropout_train(x, y, scale, bias, seed, interpret=True)
    err = float(jnp.max(jnp.abs(out - _reference(x, y, scale, bias))))
    assert err < 1e-5


def test_custom_vjp_all_grads_match_autodiff(case):
    x, y, scale, bias, ct = case
    seed = jnp.zeros((1,), jnp.int32)
    gk = jax.grad(
        lambda *a: jnp.vdot(add_ln_dropout_train(*a, seed, interpret=True), ct),
        argnums=(0, 1, 2, 3),
    )(x, y, scale, bias)
    gr = jax.grad(
        lambda *a: jnp.vdot(_reference(*a), ct), argnums=(0, 1, 2, 3)
    )(x, y, scale, bias)
    for name, a, b in zip(("dx", "dy", "dscale", "dbias"), gk, gr):
        scale_b = float(jnp.max(jnp.abs(b)))
        assert scale_b > 1e-3, name  # non-degenerate
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * max(scale_b, 1.0), name


def test_argument_validation(case):
    x, y, scale, bias, _ = case
    seed = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="rows"):
        add_ln_dropout_train(x[:, :100], y[:, :100], scale, bias, seed, interpret=True)
    with pytest.raises(ValueError, match="dropout_rate"):
        add_ln_dropout_train(x, y, scale, bias, seed, dropout_rate=1.5, interpret=True)


def test_gate_semantics(monkeypatch):
    from thunder_tpu.models.wav2vec2 import _use_fused_add_ln_train

    monkeypatch.delenv("THUNDER_FUSED_ADDLN_TRAIN", raising=False)
    on_tpu = jax.default_backend() == "tpu"
    assert _use_fused_add_ln_train(jnp.bfloat16, True, 12288, 768) is on_tpu
    # eval never routes here (the eval kernel owns serving)
    assert _use_fused_add_ln_train(jnp.bfloat16, False, 12288, 768) is False
    # shape misfits and f32 stay unfused
    assert _use_fused_add_ln_train(jnp.bfloat16, True, 12289, 768) is False
    assert _use_fused_add_ln_train(jnp.float32, True, 12288, 768) is False
    monkeypatch.setenv("THUNDER_FUSED_ADDLN_TRAIN", "0")
    assert _use_fused_add_ln_train(jnp.bfloat16, True, 12288, 768) is False


def test_model_add_ln_dropout_semantics_cpu(case):
    """The _AddLayerNorm module with dropout_rate>0 on the CPU path must
    equal dropout-then-plain-add-LN (the previous external-drop semantics)."""
    from thunder_tpu.models.wav2vec2 import _AddLayerNorm

    x, y, scale, bias, _ = case
    m = _AddLayerNorm(epsilon=EPS, dtype=jnp.float32)
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, y, True, 0.5,
    )
    rng = jax.random.PRNGKey(7)
    out = m.apply(variables, x, y, True, 0.5, rngs={"dropout": rng})
    out2 = m.apply(variables, x, y, True, 0.5, rngs={"dropout": rng})
    out3 = m.apply(variables, x, y, True, 0.5, rngs={"dropout": jax.random.PRNGKey(8)})
    ones = variables["params"]["scale"]
    zeros = variables["params"]["bias"]
    no_drop = _reference(x, y, ones, zeros)
    # deterministic per rng, varies across rngs, and differs from the
    # no-dropout output (dropout is active on this path)
    assert bool(jnp.all(out == out2))
    assert bool(jnp.any(out != out3))
    assert float(jnp.max(jnp.abs(out - no_drop))) > 1e-2
    # eval mode: dropout off, exact plain add+LN
    out_eval = m.apply(variables, x, y, False, 0.5)
    assert float(jnp.max(jnp.abs(out_eval - no_drop))) < 1e-5
