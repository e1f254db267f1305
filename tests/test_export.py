import jax
import numpy as np
import pytest

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.export import aot_export, aot_load, load_inference_bundle, save_inference_bundle
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text import BatchTextTransformer


@pytest.fixture()
def tiny_module():
    tt = BatchTextTransformer(tokens=list("abc "))
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat=1, filters=(32,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )


def test_aot_export_roundtrip(tiny_module, tmp_path):
    path = tmp_path / "predict.stablehlo"
    blob = aot_export(tiny_module, batch_size=2, num_samples=8000, path=str(path))
    assert path.exists() and len(blob) > 0

    exported = aot_load(str(path))
    audio = np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32)
    lengths = np.array([8000, 5000], dtype=np.int32)
    preds, out_lens = exported.call(audio, lengths)

    # must match the live module exactly
    _, live_preds, live_lens = tiny_module._eval_fn()(tiny_module.variables, audio, lengths)
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(live_preds))
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(live_lens))


def test_inference_bundle_roundtrip(tiny_module, tmp_path):
    d = save_inference_bundle(str(tmp_path / "bundle"), tiny_module)
    restored = load_inference_bundle(d)
    audio = np.random.default_rng(1).standard_normal((1, 8000)).astype(np.float32)
    a = tiny_module.predict(audio)
    b = restored.predict(audio)
    assert a == b
    logits_a, _ = tiny_module.forward(audio, np.array([8000]))
    logits_b, _ = restored.forward(audio, np.array([8000]))
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b), atol=1e-6)


def test_bundle_preserves_sentencepiece(tmp_path):
    from thunder_tpu.text import train_sentencepiece_model

    corpus = tmp_path / "c.txt"
    corpus.write_text("the cat sat on the mat\n" * 10)
    out = train_sentencepiece_model(str(corpus), 40, str(tmp_path / "sp"))
    tt = BatchTextTransformer.from_sentencepiece(out)
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat=1, filters=(32,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    d = save_inference_bundle(str(tmp_path / "bundle"), module)
    restored = load_inference_bundle(d)
    ids, _ = restored.text_transform.encode(["the cat"])
    want, _ = tt.encode(["the cat"])
    np.testing.assert_array_equal(ids, want)


def test_aot_export_wav2vec2(tmp_path):
    """The serving-export parity item for wav2vec2 (the reference's
    prepare_scriptable_wav2vec path, `huggingface/compatibility.py:115-135`)."""
    from thunder_tpu.audio import Wav2Vec2Preprocess
    from thunder_tpu.models import LinearDecoder
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    tt = BatchTextTransformer(tokens=list("ab "))
    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16,), conv_kernel=(10,), conv_stride=(5,),
    )
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(mask_input=True),
        encoder=Wav2Vec2Encoder(config=cfg),
        decoder=LinearDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    blob = aot_export(module, batch_size=1, num_samples=4000)
    exported = aot_load(blob)
    audio = np.random.default_rng(0).standard_normal((1, 4000)).astype(np.float32)
    preds, lens = exported.call(audio, np.array([4000], dtype=np.int32))
    _, live_preds, live_lens = module._eval_fn()(module.variables, audio, np.array([4000], dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(live_preds))


def test_step_timer():
    from thunder_tpu.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        with t.step(16000):
            pass
    s = t.summary()
    assert s["steps"] == 2.0  # warmup skipped
    assert "rtf" in s
