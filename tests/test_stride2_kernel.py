"""Fused Pallas stride-2 conv+gelu kernel (wav2vec2 extractor fast path).

Interpreter-mode correctness against the XLA conv reference, the padding/
chaining contract, and the integrated `_FeatureExtractor` fused path
(identical param tree + numerics vs the unfused path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.kernels.stride2_conv import pick_bm, stride2_conv_gelu, stride2_out_length
from thunder_tpu.models import wav2vec2 as w2v


def _poly_gelu_f32(y):
    # compare against the same polynomial the kernel fuses (exact-erf parity
    # is covered by the model-level HF tests; here we isolate kernel math)
    return np.asarray(w2v._fast_gelu(jnp.asarray(y, jnp.float32)))


@pytest.mark.parametrize(
    "k,t,c,co,bias_on",
    [
        (3, 1024, 512, 512, False),
        (2, 1024, 512, 512, False),
        (3, 512, 128, 256, True),
        (2, 16, 128, 128, True),
        (3, 4096, 256, 256, False),
    ],
)
def test_kernel_matches_conv_reference(k, t, c, co, bias_on):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, c)) * 0.3, jnp.float32)
    kern = jnp.asarray(rng.standard_normal((k, c, co)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32) if bias_on else None

    ref = jax.lax.conv_general_dilated(x, kern, (2,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"))
    if b is not None:
        ref = ref + b
    ref = _poly_gelu_f32(ref)

    got = stride2_conv_gelu(x, kern, b, interpret=True)
    tout = stride2_out_length(t, k)
    assert got.shape == (2, t // 2, co)
    np.testing.assert_allclose(np.asarray(got[:, :tout], np.float32), ref[:, :tout], atol=2e-5)


def test_kernel_garbage_rows_do_not_contaminate():
    # rows beyond the valid input length may be garbage; valid output rows
    # must not depend on them (the chaining contract)
    rng = np.random.default_rng(1)
    t, c = 1024, 128
    base = rng.standard_normal((1, t, c)).astype(np.float32)
    kern = jnp.asarray(rng.standard_normal((3, c, c)) * 0.05, jnp.float32)
    valid_in = 900  # rows >= 900 are "pad"
    a = base.copy()
    bmod = base.copy()
    bmod[:, valid_in:] = 1e6  # wildly different garbage
    out_a = stride2_conv_gelu(jnp.asarray(a), kern, interpret=True)
    out_b = stride2_conv_gelu(jnp.asarray(bmod), kern, interpret=True)
    valid_out = stride2_out_length(valid_in, 3)
    np.testing.assert_array_equal(np.asarray(out_a[:, :valid_out]), np.asarray(out_b[:, :valid_out]))


def test_pick_bm_and_divisibility_errors():
    assert pick_bm(48128 // 2) in (256, 128, 64, 32, 16, 8)
    assert pick_bm(256) == 256
    assert pick_bm(24) == 8
    with pytest.raises(ValueError, match="k in"):
        stride2_conv_gelu(jnp.zeros((1, 64, 8)), jnp.zeros((5, 8, 8)), interpret=True)
    with pytest.raises(ValueError, match="tile grid"):
        stride2_conv_gelu(jnp.zeros((1, 30, 8)), jnp.zeros((3, 8, 8)), interpret=True)


def test_fused_extractor_matches_unfused():
    cfg = w2v.Wav2Vec2Config()  # base layout: k=(10,3,3,3,3,2,2), s=(5,2,...)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 32000)) * 0.1, jnp.float32)
    lengths = jnp.array([32000, 24000], jnp.int32)

    ref_mod = w2v._FeatureExtractor(cfg, dtype=jnp.bfloat16, fused_stride2=False)
    fus_mod = w2v._FeatureExtractor(cfg, dtype=jnp.bfloat16, fused_stride2=True)
    p_ref = ref_mod.init(jax.random.PRNGKey(0), audio, lengths)
    p_fus = fus_mod.init(jax.random.PRNGKey(0), audio, lengths)

    # identical param tree: paths, shapes, and same-seed values
    leaves_ref = jax.tree_util.tree_leaves_with_path(p_ref)
    leaves_fus = dict(jax.tree_util.tree_leaves_with_path(p_fus))
    assert set(leaves_fus) == {k for k, _ in leaves_ref}
    for key, v in leaves_ref:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(leaves_fus[key]))

    y_ref = ref_mod.apply(p_ref, audio, lengths)
    y_fus = fus_mod.apply(p_ref, audio, lengths)
    assert y_ref.shape == y_fus.shape  # the final slice restores exact length
    d = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32) - y_fus.astype(jnp.float32))))
    assert d < 0.01, d  # bf16 rounding through 7 layers; same gelu polynomial


def test_fused_encoder_end_to_end_and_length_invariance():
    cfg = w2v.Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=2, intermediate_size=128
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 16000)) * 0.1, jnp.float32)
    lengths = jnp.array([16000, 12000], jnp.int32)
    enc_ref = w2v.Wav2Vec2Encoder(cfg, dtype=jnp.bfloat16, fused_stride2=False)
    enc_fus = w2v.Wav2Vec2Encoder(cfg, dtype=jnp.bfloat16, fused_stride2=True)
    params = enc_ref.init(jax.random.PRNGKey(0), audio, lengths)
    h_ref, l_ref = enc_ref.apply(params, audio, lengths)
    h_fus, l_fus = enc_fus.apply(params, audio, lengths)
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_fus))
    assert h_ref.shape == h_fus.shape
    n = int(l_ref[1])
    d = float(jnp.max(jnp.abs(h_ref[1, :n].astype(jnp.float32) - h_fus[1, :n].astype(jnp.float32))))
    assert d < 0.1, d


def test_fused_path_falls_back_for_layer_norm_config():
    # the "layer" norm variant interleaves LN between conv and gelu — the
    # fused path must decline (param tree gains ln{i}, outputs match XLA)
    cfg = w2v.Wav2Vec2Config(feat_extract_norm="layer", conv_bias=True)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((1, 16000)) * 0.1, jnp.float32)
    lengths = jnp.array([16000], jnp.int32)
    mod = w2v._FeatureExtractor(cfg, dtype=jnp.bfloat16, fused_stride2=True)
    params = mod.init(jax.random.PRNGKey(0), audio, lengths)
    assert any("ln1" in str(k) for k, _ in jax.tree_util.tree_leaves_with_path(params))
    ref = w2v._FeatureExtractor(cfg, dtype=jnp.bfloat16, fused_stride2=False)
    np.testing.assert_array_equal(
        np.asarray(mod.apply(params, audio, lengths)), np.asarray(ref.apply(params, audio, lengths))
    )
