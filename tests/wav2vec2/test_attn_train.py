"""CPU (interpret-mode) tests for the one-panel TRAIN attention kernel.

The dropout path needs the Mosaic PRNG, which has no interpreter lowering in
this jax version — dropout correctness (determinism, kept fraction, grads vs
a recovered-mask reference) runs compiled on hardware in
``kernels/selftest.py`` / ``tests_tpu``.  Here: fwd+bwd parity at rate=0
against the unfused reference (the same discipline as the reference's
script-vs-eager tests, `/root/reference/tests/quartznet/test_transform_qn.py:62-72`),
plus gate semantics and argument validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.kernels.attn_train import mha_train


def _reference(qkv, lengths, heads):
    b, t, h3 = qkv.shape
    h = h3 // 3
    dh = h // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda a: a.reshape(b, t, heads, dh)
    q = split(q) * dh**-0.5
    s = jnp.einsum("bthd,bshd->bhts", q, split(k))
    valid = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, split(v)).reshape(b, t, h)


@pytest.fixture()
def case():
    b, t, heads = 2, 256, 4
    h = heads * 64
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h)).astype(np.float32) * 0.3)
    lengths = jnp.asarray([t, t - 57], jnp.int32)
    qmask = (jnp.arange(t)[None, :] < lengths[:, None])[:, :, None]
    ct = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32)) * jnp.where(qmask, 1.0, 0.0)
    return qkv, lengths, heads, qmask, ct


def test_forward_matches_reference(case):
    qkv, lengths, heads, qmask, _ = case
    seed = jnp.zeros((1,), jnp.int32)
    out = mha_train(qkv, lengths, seed, heads=heads, interpret=True)
    want = _reference(qkv, lengths, heads)
    err = jnp.max(jnp.abs(jnp.where(qmask, out - want, 0.0)))
    assert float(err) < 1e-5


def test_custom_vjp_matches_autodiff_of_reference(case):
    # cotangent zero at padded query rows, as in any length-masked loss
    qkv, lengths, heads, _, ct = case
    seed = jnp.zeros((1,), jnp.int32)
    gk = jax.grad(lambda x: jnp.vdot(mha_train(x, lengths, seed, heads=heads, interpret=True), ct))(qkv)
    gr = jax.grad(lambda x: jnp.vdot(_reference(x, lengths, heads), ct))(qkv)
    assert float(jnp.max(jnp.abs(gk - gr))) < 1e-5
    assert float(jnp.max(jnp.abs(gr))) > 1e-3  # non-degenerate check


def test_block_q_variants_agree(case):
    qkv, lengths, heads, qmask, _ = case
    seed = jnp.zeros((1,), jnp.int32)
    a = mha_train(qkv, lengths, seed, heads=heads, block_q=128, interpret=True)
    b = mha_train(qkv, lengths, seed, heads=heads, block_q=256, interpret=True)
    err = jnp.max(jnp.abs(jnp.where(qmask, a - b, 0.0)))
    assert float(err) < 1e-5


def test_block_q_bwd_variants_agree(case):
    # the backward may tile q differently than the forward (at t > 1024 its
    # VMEM cap is 128 while the forward runs 256); the custom-vjp gradients
    # must be invariant to that tiling choice
    qkv, lengths, heads, _, ct = case
    seed = jnp.zeros((1,), jnp.int32)

    def g(bqb):
        return jax.grad(
            lambda x: jnp.vdot(
                mha_train(x, lengths, seed, heads=heads, block_q_bwd=bqb, interpret=True), ct
            )
        )(qkv)

    a, b = g(128), g(256)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-5
    assert float(jnp.max(jnp.abs(a))) > 1e-3


def test_argument_validation(case):
    qkv, lengths, heads, _, _ = case
    seed = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="dh==64"):
        mha_train(qkv, lengths, seed, heads=heads * 2, interpret=True)
    with pytest.raises(ValueError, match="multiple of 128"):
        mha_train(qkv[:, :200], lengths, seed, heads=heads, interpret=True)
    with pytest.raises(ValueError, match="dropout_rate"):
        mha_train(qkv, lengths, seed, heads=heads, dropout_rate=1.0, interpret=True)


def test_train_attn_gate_semantics(monkeypatch):
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, _use_train_attn

    monkeypatch.delenv("THUNDER_FLASH_MIN_SEQ", raising=False)
    monkeypatch.delenv("THUNDER_TRAIN_ATTN", raising=False)
    cfg = Wav2Vec2Config()  # dh=64, 12 heads, attention_dropout=0.1
    on_tpu = jax.default_backend() == "tpu"
    # eval mode never routes here (the serving kernel owns inference)
    assert _use_train_attn(jnp.bfloat16, False, 768, cfg) is False
    # train mode: gated by dtype/backend/shape — on CPU always False
    got = _use_train_attn(jnp.bfloat16, True, 768, cfg)
    assert got is on_tpu
    # short sequences stay ON (round-5 crossover sweep: the kernel wins at
    # every length down to T=256); beyond the VMEM bound: off
    assert _use_train_attn(jnp.bfloat16, True, 512, cfg) is on_tpu
    assert _use_train_attn(jnp.bfloat16, True, 2048, cfg) is False
    # f32 path: off
    assert _use_train_attn(jnp.float32, True, 768, cfg) is False
    # odd head count / dh != 64: off
    cfg_odd = Wav2Vec2Config(hidden_size=320, num_attention_heads=5)
    assert _use_train_attn(jnp.bfloat16, True, 768, cfg_odd) is False
    # kill switch
    monkeypatch.setenv("THUNDER_TRAIN_ATTN", "0")
    assert _use_train_attn(jnp.bfloat16, True, 768, cfg) is False
