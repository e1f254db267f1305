"""wav2vec2: golden parity against real HF torch models built locally.

Constructs tiny random ``Wav2Vec2ForCTC`` models (both base-style and
stable-layer-norm variants) with a real CTC tokenizer, saves them with
``save_pretrained``, loads through our HF importer, and compares logits —
the offline analogue of the reference's wav2vec2 golden test
(`tests/huggingface/test_module_huggingface.py:57-67`).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

transformers = pytest.importorskip("transformers")

from thunder_tpu.audio import Wav2Vec2Preprocess  # noqa: E402
from thunder_tpu.compat.hf import load_huggingface_checkpoint, tokenizer_to_transform  # noqa: E402
from thunder_tpu.models.wav2vec2 import feat_extract_output_lengths  # noqa: E402

VOCAB = {
    "<pad>": 0,
    "<s>": 1,
    "</s>": 2,
    "<unk>": 3,
    "|": 4,
    "a": 5,
    "b": 6,
    "c": 7,
    "d": 8,
    "e": 9,
    "t": 10,
    "h": 11,
}


def _tiny_hf_dir(tmp_path, do_stable_layer_norm=False, feat_extract_norm="group", return_attention_mask=False):
    from transformers import Wav2Vec2Config, Wav2Vec2CTCTokenizer, Wav2Vec2FeatureExtractor, Wav2Vec2ForCTC

    cfg = Wav2Vec2Config(
        vocab_size=len(VOCAB),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16, 16),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        conv_bias=feat_extract_norm == "layer",
        feat_extract_norm=feat_extract_norm,
        do_stable_layer_norm=do_stable_layer_norm,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    model = Wav2Vec2ForCTC(cfg).eval()
    d = tmp_path / f"hf_{feat_extract_norm}_{do_stable_layer_norm}"
    model.save_pretrained(d)
    vocab_file = d / "vocab.json"
    vocab_file.write_text(json.dumps(VOCAB))
    tok = Wav2Vec2CTCTokenizer(str(vocab_file), pad_token="<pad>", unk_token="<unk>", word_delimiter_token="|")
    tok.save_pretrained(d)
    fe = Wav2Vec2FeatureExtractor(do_normalize=True, return_attention_mask=return_attention_mask)
    fe.save_pretrained(d)
    return str(d), model


@pytest.mark.parametrize(
    "stable,fe_norm,attn_mask",
    [(False, "group", False), (True, "layer", True)],
    ids=["base-style", "large-style"],
)
def test_hf_import_logit_parity(tmp_path, stable, fe_norm, attn_mask):
    d, ref = _tiny_hf_dir(
        tmp_path, do_stable_layer_norm=stable, feat_extract_norm=fe_norm, return_attention_mask=attn_mask
    )
    module = load_huggingface_checkpoint(d)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 4000)).astype(np.float32)
    lengths = np.array([4000, 4000], dtype=np.int32)

    # HF path: normalize like its feature extractor, then forward
    audio_t = torch.tensor(audio)
    normed = (audio_t - audio_t.mean(-1, keepdim=True)) / (audio_t.var(-1, keepdim=True, unbiased=True) + 1e-7).sqrt()
    with torch.no_grad():
        want = ref(normed).logits.numpy()

    logits, out_lens = module.forward(audio, lengths)
    got = np.asarray(logits)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    # length formula parity
    hf_lens = ref._get_feat_extract_output_lengths(torch.tensor(lengths)).numpy()
    np.testing.assert_array_equal(np.asarray(out_lens), hf_lens)


def test_hf_import_variable_lengths(tmp_path):
    d, ref = _tiny_hf_dir(tmp_path, do_stable_layer_norm=True, feat_extract_norm="layer", return_attention_mask=True)
    module = load_huggingface_checkpoint(d)
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 4000)).astype(np.float32)
    audio[1, 2500:] = 0.0
    lengths = np.array([4000, 2500], dtype=np.int32)

    logits, out_lens = module.forward(audio, lengths)

    # HF with attention mask
    from transformers import Wav2Vec2FeatureExtractor

    fe = Wav2Vec2FeatureExtractor.from_pretrained(d)
    batch = fe(
        [audio[0], audio[1, :2500]],
        sampling_rate=16000,
        return_tensors="pt",
        padding="max_length",
        max_length=4000,
        return_attention_mask=True,
    )
    with torch.no_grad():
        want = ref(batch.input_values, attention_mask=batch.attention_mask).logits.numpy()

    got = np.asarray(logits)
    for i, l in enumerate(np.asarray(out_lens)):
        np.testing.assert_allclose(got[i, :l], want[i, :l], atol=2e-3, rtol=1e-3)


def test_wav2vec2_preprocess_matches_hf_extractor():
    from transformers import Wav2Vec2FeatureExtractor

    fe = Wav2Vec2FeatureExtractor(do_normalize=True, return_attention_mask=True)
    rng = np.random.default_rng(2)
    a = rng.standard_normal(3000).astype(np.float32)
    b = rng.standard_normal(2000).astype(np.float32)
    batch = fe([a, b], sampling_rate=16000, return_tensors="np", padding="max_length", max_length=3000)

    pre = Wav2Vec2Preprocess(mask_input=True)
    audio = np.zeros((2, 3000), dtype=np.float32)
    audio[0], audio[1, :2000] = a, b
    out, _ = pre.apply({}, jnp.asarray(audio), jnp.array([3000, 2000]))
    np.testing.assert_allclose(np.asarray(out), batch.input_values, atol=1e-3)


def test_wav2vec2_bucket_invariance():
    """Same clip in different padding buckets -> identical valid outputs,
    even for mask_input=False (base-960h-style) models.  Covers the masked
    waveform normalization, masked GroupNorm and always-on attention masking
    (deliberate deviations documented in audio/frontend.py + models/wav2vec2.py)."""
    import jax as _jax

    from thunder_tpu.audio import Wav2Vec2Preprocess
    from thunder_tpu.models import LinearDecoder
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config as Cfg
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Encoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("abcd "))
    cfg = Cfg(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
              intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2))
    mod = CTCModule.create(
        _jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(mask_input=False),
        encoder=Wav2Vec2Encoder(config=cfg, mask_input=False),
        decoder=LinearDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    wav = (0.3 * np.random.default_rng(0).standard_normal(5000)).astype(np.float32)
    narrow = np.pad(wav[None], ((0, 0), (0, 11000)))
    wide = np.pad(wav[None], ((0, 0), (0, 27000)))
    l16, ol = mod.forward(narrow, np.array([5000]))
    l32, _ = mod.forward(wide, np.array([5000]))
    v = int(np.asarray(ol)[0])
    np.testing.assert_allclose(np.asarray(l16)[0, :v], np.asarray(l32)[0, :v], atol=1e-5)


def test_tokenizer_to_transform(tmp_path):
    from transformers import Wav2Vec2CTCTokenizer

    vocab_file = tmp_path / "vocab.json"
    vocab_file.write_text(json.dumps(VOCAB))
    tok = Wav2Vec2CTCTokenizer(str(vocab_file), pad_token="<pad>", unk_token="<unk>", word_delimiter_token="|")
    tt = tokenizer_to_transform(tok)
    # blank == pad at id 0, "|" became a space
    assert tt.vocab.blank_idx == 0
    assert tt.vocab.itos[4] == " "
    decoded = tt.decode_prediction(np.array([[10, 11, 9, 4, 7, 5, 10]]), remove_repeated=False)
    assert decoded == ["the cat"]


def test_feat_extract_output_lengths():
    lens = feat_extract_output_lengths(np.array([4000, 2500]), (10, 3, 3), (5, 2, 2))
    np.testing.assert_array_equal(lens, [(((4000 - 10) // 5 + 1 - 3) // 2 + 1 - 3) // 2 + 1,
                                         (((2500 - 10) // 5 + 1 - 3) // 2 + 1 - 3) // 2 + 1])


def test_flash_mha_matches_reference_attention():
    """The long-sequence flash path (segment-id masking, tuned blocks) must
    match unfused masked attention on the valid region; interpret mode makes
    jax's Pallas kernel runnable on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    from thunder_tpu.models.wav2vec2 import _flash_mha

    B, T, H, D = 2, 1024, 2, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.1, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.1, jnp.float32)
    lengths = np.array([1024, 700])
    key_mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])

    with pltpu.force_tpu_interpret_mode():
        out = _flash_mha(q, k, v, key_mask)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    scores = jnp.where(key_mask[:, None, None, :], scores, jnp.finfo(jnp.float32).min)
    want = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(scores, axis=-1), v)
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(out)[b, :L], np.asarray(want)[b, :L], atol=1e-5
        )


def test_encoder_frame_padding_is_transparent(monkeypatch):
    """The one-time 128-multiple frame pad applied on the flash path must not
    change any valid-frame output: padded frames carry key_mask=False, so
    masked attention / per-frame LN / FFN ignore them and the pad is sliced
    off after the layer stack."""
    import thunder_tpu.models.wav2vec2 as w2v

    cfg = w2v.Wav2Vec2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
    )
    enc = w2v.Wav2Vec2Encoder(config=cfg, mask_input=True, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 4000)) * 0.2, jnp.float32)
    lengths = jnp.asarray(np.array([4000, 2500], np.int32))
    params = enc.init({"params": jax.random.PRNGKey(0)}, audio, lengths)["params"]

    base, base_lens = enc.apply({"params": params}, audio, lengths, train=False)
    assert base.shape[1] % 128 != 0  # the pad branch below is actually exercised

    def fake_flash(q, k, v, key_mask):
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        scores = jnp.where(key_mask[:, None, None, :], scores, jnp.finfo(jnp.float32).min)
        return jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(scores, axis=-1), v)

    monkeypatch.setattr(w2v, "_use_flash_attention", lambda *a, **k: True)
    monkeypatch.setattr(w2v, "_flash_mha", fake_flash)
    padded, padded_lens = enc.apply({"params": params}, audio, lengths, train=False)

    assert padded.shape == base.shape
    np.testing.assert_array_equal(np.asarray(base_lens), np.asarray(padded_lens))
    for b, L in enumerate(np.asarray(base_lens)):
        np.testing.assert_allclose(
            np.asarray(padded)[b, :L], np.asarray(base)[b, :L], atol=1e-5
        )


def test_flash_train_gate_semantics(monkeypatch):
    """Train-mode flash routing (round-4 training path): attention-prob
    dropout forces the unfused path (the materialized probabilities are what
    dropout masks), zero attention-dropout trains on the flash kernel's
    custom_vjp.  Eval is gated only by dtype/length/backend."""
    import thunder_tpu.models.wav2vec2 as w2v

    # the 512/768 assertions below assume the default crossover (640)
    monkeypatch.delenv("THUNDER_FLASH_MIN_SEQ", raising=False)
    monkeypatch.setattr(w2v.jax, "default_backend", lambda: "tpu")
    gate = w2v._use_flash_attention
    # eval: long bf16 sequences on TPU -> flash
    assert gate(jnp.bfloat16, False, 768, 0.1)
    # train + attention dropout -> unfused (dropout needs the probs)
    assert not gate(jnp.bfloat16, True, 768, 0.1)
    # train + zero attention dropout -> flash (custom_vjp, no score tensor)
    assert gate(jnp.bfloat16, True, 768, 0.0)
    # short sequences stay unfused either way (crossover threshold 640)
    assert not gate(jnp.bfloat16, True, 512, 0.0)
    # f32 compute never routes to the bf16 kernel
    assert not gate(jnp.float32, True, 768, 0.0)
