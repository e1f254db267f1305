"""InferenceEngine parity vs the flax apply path (f32, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.engine import InferenceEngine
from thunder_tpu.models import CitrinetEncoder, Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text import BatchTextTransformer


def _randomized(module, seed=0):
    """Give BN stats non-trivial values so folding is actually tested."""
    import flax

    rng = np.random.default_rng(seed)
    flat = flax.traverse_util.flatten_dict(module.variables)
    for k, v in flat.items():
        if k[-1] == "var":
            flat[k] = jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
        elif k[-1] in ("mean",) or (k[-1] in ("scale", "bias") and "bn" in k):
            flat[k] = jnp.asarray((rng.standard_normal(v.shape) * 0.3).astype(np.float32))
    return module.with_variables(flax.traverse_util.unflatten_dict(flat))


@pytest.fixture()
def qn_module():
    tt = BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '"))
    m = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat=2, filters=(256,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    return _randomized(m)


@pytest.fixture()
def cn_module():
    tt = BatchTextTransformer(tokens=list("abc '"))
    m = CTCModule.create(
        jax.random.PRNGKey(1),
        audio_transform=FilterbankFeatures(nfilt=80),
        encoder=CitrinetEncoder(filters=(256,), kernel_sizes=(13,), strides=(2,), repeat=2, feat_in=80),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    return _randomized(m, seed=1)


def _compare(module, engine, seed=0):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal((2, 16000)) * 0.2).astype(np.float32)
    lengths = np.array([16000, 9000], dtype=np.int32)
    want_logits, want_lens = module.forward(audio, lengths)
    got_logits, got_lens = engine(audio, lengths)
    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(want_lens))
    for i, l in enumerate(np.asarray(want_lens)):
        np.testing.assert_allclose(
            np.asarray(got_logits)[i, :l], np.asarray(want_logits)[i, :l], atol=2e-3, rtol=1e-3
        )


def test_engine_matches_module_quartznet(qn_module):
    engine = InferenceEngine(qn_module, compute_dtype=jnp.float32, use_pallas=False)
    _compare(qn_module, engine)


def test_engine_matches_module_citrinet(cn_module):
    engine = InferenceEngine(cn_module, compute_dtype=jnp.float32, use_pallas=False)
    _compare(cn_module, engine, seed=2)


def test_engine_predict_matches_module(qn_module):
    engine = InferenceEngine(qn_module, compute_dtype=jnp.float32, use_pallas=False)
    audio = (np.random.default_rng(3).standard_normal(12000) * 0.2).astype(np.float32)
    assert engine.predict(audio) == qn_module.predict(audio)


def test_engine_wav2vec2_matches_module():
    from thunder_tpu.audio import Wav2Vec2Preprocess
    from thunder_tpu.models import LinearDecoder
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    tt = BatchTextTransformer(tokens=list("ab "))
    cfg = Wav2Vec2Config(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2))
    m = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(mask_input=True),
        encoder=Wav2Vec2Encoder(config=cfg),
        decoder=LinearDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    engine = InferenceEngine(m, compute_dtype=jnp.float32)
    audio = (np.random.default_rng(5).standard_normal((2, 4000)) * 0.3).astype(np.float32)
    lengths = np.array([4000, 2500], dtype=np.int32)
    want_logits, want_lens = m.forward(audio, lengths)
    got_logits, got_lens = engine(audio, lengths)
    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(want_lens))
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(want_logits), atol=2e-4)
    assert engine.predict(audio, lengths) == m.predict(audio, lengths)


def test_engine_generic_encoder_fallback():
    """Any (x, lengths, train)-contract encoder gets the jitted fallback path."""
    import flax.linen as nn

    from thunder_tpu.models import LinearDecoder

    class TinyEncoder(nn.Module):
        features: int = 16

        @nn.compact
        def __call__(self, x, lengths, train=False):
            y = nn.Dense(self.features)(x)
            return nn.relu(y), lengths

    tt = BatchTextTransformer(tokens=list("ab "))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=TinyEncoder(),
        decoder=LinearDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=1600,
    )
    engine = InferenceEngine(module)
    wav = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.1
    lengths = np.array([16000, 9000], np.int32)
    got = engine.predict(wav, lengths)
    want = module.predict(wav, lengths)
    assert got == want


def test_engine_bf16_sub128_interior_channels():
    """Lane padding must apply only to the stem repeat: interior sub-128
    repeats take previous outputs at the true channel count (a padded plan
    there computed silently wrong results on the TPU bf16 path)."""
    tt = BatchTextTransformer(tokens=list("ab "))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(filters=(64, 64), kernel_sizes=(11, 13), repeat=3, repeat_blocks=1),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=1600,
    )
    engine = InferenceEngine(module, compute_dtype=jnp.bfloat16)  # padding active
    wav = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.2
    lengths = np.array([16000, 9000], np.int32)
    logits_bf16, _, _ = engine._infer(jnp.asarray(wav), jnp.asarray(lengths))
    logits_f32, _ = module.forward(wav, lengths)
    a = np.asarray(logits_bf16, np.float32).ravel()
    b = np.asarray(logits_f32, np.float32).ravel()
    # bf16 noise is small; the padding bug scrambled channels entirely
    denom = np.abs(b).max()
    assert np.abs(a - b).max() / denom < 0.1


def test_engine_posconv_dense_fold_matches_grouped():
    """Block-diagonal dense pos-conv fold == grouped conv outputs."""
    import jax.numpy as jnp

    from thunder_tpu.audio import Wav2Vec2Preprocess
    from thunder_tpu.models import LinearDecoder
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("abc "))
    cfg = Wav2Vec2Config(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        num_conv_pos_embeddings=8,
        num_conv_pos_embedding_groups=4,
    )
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(),
        encoder=Wav2Vec2Encoder(config=cfg),
        decoder=LinearDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    audio = np.random.default_rng(3).standard_normal((2, 8000)).astype(np.float32) * 0.3
    lengths = np.array([8000, 6000], np.int32)
    grouped = InferenceEngine(module, compute_dtype=jnp.float32, posconv_dense=False)
    dense = InferenceEngine(module, compute_dtype=jnp.float32, posconv_dense=True)
    lg, pg, _ = grouped._infer(*grouped._place(audio, lengths))
    ld, pd, _ = dense._infer(*dense._place(audio, lengths))
    assert np.abs(np.asarray(lg) - np.asarray(ld)).max() < 2e-4
    assert (np.asarray(pg) == np.asarray(pd)).all()
