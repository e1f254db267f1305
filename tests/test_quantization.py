import jax
import numpy as np

from thunder_tpu.audio import Wav2Vec2Preprocess
from thunder_tpu.models import LinearDecoder
from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from thunder_tpu.module import CTCModule
from thunder_tpu.quantization import dequantize_variables, quantization_summary, quantize_variables
from thunder_tpu.text import BatchTextTransformer


def _tiny_w2v2_module():
    tt = BatchTextTransformer(tokens=list("abc "))
    cfg = Wav2Vec2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
    )
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(),
        encoder=Wav2Vec2Encoder(config=cfg),
        decoder=LinearDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )


def test_quantize_dequantize_roundtrip_accuracy():
    module = _tiny_w2v2_module()
    q = quantize_variables(module.variables)
    summary = quantization_summary(q)
    assert summary["quantized_bytes"] > 0

    restored = dequantize_variables(q)
    audio = np.random.default_rng(0).standard_normal((1, 4000)).astype(np.float32)
    base, _ = module.forward(audio, np.array([4000]))
    qmod = module.with_variables(restored)
    quant, _ = qmod.forward(audio, np.array([4000]))
    # int8 weight-only: outputs close but not identical
    err = np.abs(np.asarray(base) - np.asarray(quant)).max()
    assert 0 < err < 0.1, err


def test_quantized_predictions_usually_match():
    module = _tiny_w2v2_module()
    restored = dequantize_variables(quantize_variables(module.variables))
    qmod = module.with_variables(restored)
    audio = np.random.default_rng(1).standard_normal((2, 4000)).astype(np.float32)
    ids_a = np.asarray(module._eval_fn()(module.variables, audio, np.array([4000, 4000]))[1])
    ids_b = np.asarray(qmod._eval_fn()(qmod.variables, audio, np.array([4000, 4000]))[1])
    agreement = (ids_a == ids_b).mean()
    assert agreement > 0.9, agreement


def test_quantization_reduces_bytes():
    module = _tiny_w2v2_module()
    import flax

    before = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(module.variables["params"]))
    q = quantize_variables(module.variables)
    after = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(q["params"]))
    assert after < before * 0.55  # most weights are transformer matmuls


# ---------------------------------------------------------------------------
# runtime int8 serving (engine consumes int8 weights directly)
# ---------------------------------------------------------------------------


def _tiny_quartznet_module():
    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder

    tt = BatchTextTransformer(tokens=list("abc "))
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(dither=0.0),
        encoder=QuartznetEncoder(repeat=2, filters=(64, 64), kernel_sizes=(33, 39)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )


def test_engine_int8_wav2vec2_parity_and_footprint():
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine

    module = _tiny_w2v2_module()
    audio = np.random.default_rng(2).standard_normal((2, 8000)).astype(np.float32) * 0.3
    lengths = np.array([8000, 6000], np.int32)

    f32 = InferenceEngine(module, compute_dtype=jnp.float32)
    q8 = InferenceEngine(module, compute_dtype=jnp.float32, int8_weights=True)
    lo, pa, _ = f32._infer(*f32._place(audio, lengths))
    lq, pb, _ = q8._infer(*q8._place(audio, lengths))
    # int8 weight rounding only: logits close; argmax agrees except at
    # near-ties (random-weight fixture logits sit close together)
    assert np.abs(np.asarray(lo) - np.asarray(lq)).max() < 0.15
    assert (np.asarray(pa) == np.asarray(pb)).mean() > 0.95
    # serving footprint: on this tiny fixture the pos-conv/feature convs are
    # proportionally large; production-size models approach 4x (bench on chip)
    assert q8.weight_bytes() < f32.weight_bytes() * 0.6


def test_dynamic_int8_matmul_close_to_float():
    import jax.numpy as jnp

    from thunder_tpu.quantization import dynamic_int8_matmul, quantize_array

    rng = np.random.default_rng(4)
    x = rng.standard_normal((5, 7, 64)).astype(np.float32)
    w = (rng.standard_normal((64, 48)) * 0.1).astype(np.float32)
    q, scale = quantize_array(w)
    got = np.asarray(dynamic_int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(scale.reshape(-1))))
    want = x.reshape(-1, 64) @ w
    rel = np.abs(got.reshape(-1, 48) - want).max() / np.abs(want).max()
    # W8A8: weight rounding (<=0.4%) + per-row activation rounding (<=0.4%)
    assert rel < 0.03, rel


def test_engine_int8_compute_wav2vec2_parity():
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine

    module = _tiny_w2v2_module()
    audio = np.random.default_rng(5).standard_normal((2, 8000)).astype(np.float32) * 0.3
    lengths = np.array([8000, 6000], np.int32)

    f32 = InferenceEngine(module, compute_dtype=jnp.float32)
    w8a8 = InferenceEngine(module, compute_dtype=jnp.float32, int8_compute=True)
    lo, pa, _ = f32._infer(*f32._place(audio, lengths))
    lq, pb, _ = w8a8._infer(*w8a8._place(audio, lengths))
    assert np.abs(np.asarray(lo) - np.asarray(lq)).max() < 0.2
    assert (np.asarray(pa) == np.asarray(pb)).mean() > 0.95

    # composes with int8_weights (remaining kernels storage-quantized)
    both = InferenceEngine(module, compute_dtype=jnp.float32, int8_weights=True, int8_compute=True)
    lb, pc, _ = both._infer(*both._place(audio, lengths))
    assert np.abs(np.asarray(lo) - np.asarray(lb)).max() < 0.3
    assert (np.asarray(pa) == np.asarray(pc)).mean() > 0.9
    assert both.weight_bytes() < f32.weight_bytes() * 0.6


def test_int8_compute_rejects_conv_models():
    import jax.numpy as jnp
    import pytest

    from thunder_tpu.engine import InferenceEngine

    with pytest.raises(ValueError, match="wav2vec2"):
        InferenceEngine(_tiny_quartznet_module(), compute_dtype=jnp.float32, int8_compute=True)


def test_engine_int8_conv_model_parity_and_footprint():
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine

    module = _tiny_quartznet_module()
    audio = np.random.default_rng(3).standard_normal((2, 8000)).astype(np.float32) * 0.3
    lengths = np.array([8000, 5000], np.int32)

    f32 = InferenceEngine(module, compute_dtype=jnp.float32)
    q8 = InferenceEngine(module, compute_dtype=jnp.float32, int8_weights=True)
    lo, pa, _ = f32._infer(*f32._place(audio, lengths))
    lq, pb, _ = q8._infer(*q8._place(audio, lengths))
    assert np.abs(np.asarray(lo) - np.asarray(lq)).max() < 0.2
    assert (np.asarray(pa) == np.asarray(pb)).mean() > 0.95
    # pointwise convs carry most of the separable blocks' weights
    assert q8.weight_bytes() < f32.weight_bytes() * 0.6


def test_dynamic_int8_conv_close_to_float():
    import jax.numpy as jnp

    from thunder_tpu.quantization import dynamic_int8_conv, quantize_array

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 50, 64)).astype(np.float32)
    w = (rng.standard_normal((3, 64, 48)) * 0.1).astype(np.float32)
    q, scale = quantize_array(w)
    got = np.asarray(
        dynamic_int8_conv(jnp.asarray(x), jnp.asarray(q), jnp.asarray(scale.reshape(-1)), stride=2)
    )
    want = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (2,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
    )
    rel = np.abs(got - want).max() / np.abs(want).max()
    # per-sample activation scale + per-channel weight scale rounding
    assert rel < 0.03, rel


def test_engine_int8_compute_quantizes_extractor_convs():
    """Extractor convs with cin >= 64 run int8 under int8_compute; logits stay close."""
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine
    from thunder_tpu.quantization import quantize_tree_compute

    tt = BatchTextTransformer(tokens=list("abc "))
    cfg = Wav2Vec2Config(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(64, 64, 64),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
    )
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(),
        encoder=Wav2Vec2Encoder(config=cfg),
        decoder=LinearDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    q = quantize_tree_compute(module.variables["params"]["encoder"])
    fx = q["feature_extractor"]
    assert "kernel" in fx["conv0"]  # cin=1 stays float
    assert "kernel_q8" in fx["conv1"] and "kernel_scale" in fx["conv1"]
    assert "kernel_q8" in fx["conv2"]

    audio = np.random.default_rng(7).standard_normal((2, 8000)).astype(np.float32) * 0.3
    lengths = np.array([8000, 6000], np.int32)
    f32 = InferenceEngine(module, compute_dtype=jnp.float32)
    w8a8 = InferenceEngine(module, compute_dtype=jnp.float32, int8_compute=True)
    lo, pa, _ = f32._infer(*f32._place(audio, lengths))
    lq, pb, _ = w8a8._infer(*w8a8._place(audio, lengths))
    assert np.abs(np.asarray(lo) - np.asarray(lq)).max() < 0.25
    assert (np.asarray(pa) == np.asarray(pb)).mean() > 0.95
