"""HF model-family breadth: HuBERT / data2vec-audio / WavLM logit parity.

The reference reaches these through ``AutoModelForCTC``
(`/root/reference/src/thunder/huggingface/compatibility.py:65-112` — any hub
checkpoint with a CTC head).  Tiny random torch models are built locally,
saved with ``save_pretrained``, loaded through our importer, and compared
logit-for-logit — the same offline golden scheme as test_wav2vec2.py.
"""

import json

import numpy as np
import pytest
import torch

transformers = pytest.importorskip("transformers")

from thunder_tpu.compat.hf import load_huggingface_checkpoint  # noqa: E402

VOCAB = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4, "a": 5, "b": 6, "c": 7, "e": 8, "t": 9}

_COMMON = dict(
    vocab_size=len(VOCAB),
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    conv_dim=(16, 16, 16),
    conv_kernel=(10, 3, 3),
    conv_stride=(5, 2, 2),
    hidden_dropout=0.0,
    attention_dropout=0.0,
    feat_proj_dropout=0.0,
    final_dropout=0.0,
    layerdrop=0.0,
    apply_spec_augment=False,
)


def _save_dir(tmp_path, model, name, return_attention_mask=False):
    from transformers import Wav2Vec2CTCTokenizer, Wav2Vec2FeatureExtractor

    d = tmp_path / name
    model.save_pretrained(d)
    (d / "vocab.json").write_text(json.dumps(VOCAB))
    tok = Wav2Vec2CTCTokenizer(str(d / "vocab.json"), pad_token="<pad>", unk_token="<unk>", word_delimiter_token="|")
    tok.save_pretrained(d)
    fe = Wav2Vec2FeatureExtractor(do_normalize=True, return_attention_mask=return_attention_mask)
    fe.save_pretrained(d)
    return str(d)


def _assert_logit_parity(d, ref, atol=2e-3):
    module = load_huggingface_checkpoint(d)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 4000)).astype(np.float32)
    lengths = np.array([4000, 4000], dtype=np.int32)

    audio_t = torch.tensor(audio)
    normed = (audio_t - audio_t.mean(-1, keepdim=True)) / (
        audio_t.var(-1, keepdim=True, unbiased=True) + 1e-7
    ).sqrt()
    with torch.no_grad():
        want = ref(normed).logits.numpy()

    logits, out_lens = module.forward(audio, lengths)
    got = np.asarray(logits)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)
    hf_lens = ref._get_feat_extract_output_lengths(torch.tensor(lengths)).numpy()
    np.testing.assert_array_equal(np.asarray(out_lens), hf_lens)
    return module


@pytest.mark.parametrize("feat_proj_layer_norm", [True, False])
def test_hubert_logit_parity(tmp_path, feat_proj_layer_norm):
    from transformers import HubertConfig, HubertForCTC

    cfg = HubertConfig(
        **_COMMON,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        conv_bias=False,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        feat_proj_layer_norm=feat_proj_layer_norm,
    )
    torch.manual_seed(0)
    ref = HubertForCTC(cfg).eval()
    d = _save_dir(tmp_path, ref, f"hubert_{feat_proj_layer_norm}")
    _assert_logit_parity(d, ref)


def test_hubert_large_style_logit_parity(tmp_path):
    # hubert-large-ls960-ft shape: layer-norm extractor + stable layer norm
    from transformers import HubertConfig, HubertForCTC

    cfg = HubertConfig(
        **_COMMON,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    torch.manual_seed(1)
    ref = HubertForCTC(cfg).eval()
    d = _save_dir(tmp_path, ref, "hubert_large", return_attention_mask=True)
    _assert_logit_parity(d, ref)


def test_data2vec_audio_logit_parity(tmp_path):
    from transformers import Data2VecAudioConfig, Data2VecAudioForCTC

    cfg = Data2VecAudioConfig(
        **_COMMON,
        conv_bias=False,
        num_conv_pos_embeddings=3,
        num_conv_pos_embedding_groups=4,
        conv_pos_kernel_size=7,
    )
    torch.manual_seed(2)
    ref = Data2VecAudioForCTC(cfg).eval()
    d = _save_dir(tmp_path, ref, "d2v", return_attention_mask=True)
    _assert_logit_parity(d, ref)


def test_wavlm_logit_parity(tmp_path):
    from transformers import WavLMConfig, WavLMForCTC

    cfg = WavLMConfig(
        **_COMMON,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        conv_bias=False,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_buckets=32,
        max_bucket_distance=40,
    )
    torch.manual_seed(3)
    ref = WavLMForCTC(cfg).eval()
    d = _save_dir(tmp_path, ref, "wavlm")
    _assert_logit_parity(d, ref)


def test_wavlm_stable_layer_norm_logit_parity(tmp_path):
    from transformers import WavLMConfig, WavLMForCTC

    cfg = WavLMConfig(
        **_COMMON,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_buckets=32,
        max_bucket_distance=40,
    )
    torch.manual_seed(4)
    ref = WavLMForCTC(cfg).eval()
    d = _save_dir(tmp_path, ref, "wavlm_sln")
    _assert_logit_parity(d, ref)


def test_family_predict_roundtrip(tmp_path):
    # the imported module drives the full predict path (greedy + device beam)
    from transformers import HubertConfig, HubertForCTC

    cfg = HubertConfig(
        **_COMMON,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        conv_bias=False,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    torch.manual_seed(5)
    ref = HubertForCTC(cfg).eval()
    d = _save_dir(tmp_path, ref, "hubert_predict")
    module = load_huggingface_checkpoint(d)
    audio = np.random.default_rng(1).standard_normal((1, 4000)).astype(np.float32)
    greedy = module.predict(audio)
    beam = module.predict(audio, beam_width=4, beam_backend="device")
    assert isinstance(greedy[0], str) and isinstance(beam[0], str)


@pytest.mark.parametrize("cls_name", ["UniSpeechForCTC", "UniSpeechSatForCTC"])
def test_unispeech_logit_parity(tmp_path, cls_name):
    # UniSpeech / UniSpeechSat share wav2vec2's base-model layout exactly —
    # the importer handles them with no special casing (AutoModelForCTC
    # family breadth, reference huggingface/compatibility.py:65-112)
    import transformers as tr

    cls = getattr(tr, cls_name)
    cfg_cls = getattr(tr, cls_name.replace("ForCTC", "Config"))
    cfg = cfg_cls(
        **_COMMON,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        conv_bias=False,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    torch.manual_seed(6)
    ref = cls(cfg).eval()
    d = _save_dir(tmp_path, ref, cls_name)
    _assert_logit_parity(d, ref)


@pytest.mark.parametrize("output_hidden_size", [32, 24])
def test_wav2vec2_conv_adapter_logit_parity(tmp_path, output_hidden_size):
    # add_adapter=True (SpeechEncoderDecoder/MMS shape): strided GLU convs
    # after the transformer; the CTC head runs at the adapter frame rate and
    # at output_hidden_size (projection present only when dims differ)
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    cfg = Wav2Vec2Config(
        **_COMMON,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        add_adapter=True,
        output_hidden_size=output_hidden_size,
        num_adapter_layers=2,
    )
    torch.manual_seed(8)
    ref = Wav2Vec2ForCTC(cfg).eval()
    d = _save_dir(tmp_path, ref, f"w2v2_adapter_{output_hidden_size}", return_attention_mask=True)
    _assert_logit_parity(d, ref)


def test_wav2vec2_mms_attn_adapter_logit_parity(tmp_path):
    # MMS-style per-language attention adapters: LayerNorm'd bottleneck
    # (hidden -> adapter_attn_dim -> hidden) residual at every layer tail
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    cfg = Wav2Vec2Config(
        **_COMMON,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        adapter_attn_dim=8,
    )
    torch.manual_seed(9)
    ref = Wav2Vec2ForCTC(cfg).eval()
    d = _save_dir(tmp_path, ref, "w2v2_mms", return_attention_mask=True)
    _assert_logit_parity(d, ref)


@pytest.mark.parametrize("conv_last,squeeze", [(16, 2), (32, 4)])
def test_sew_logit_parity(tmp_path, conv_last, squeeze):
    # SEW: avg-pool squeeze + strided positional conv + linear upsample;
    # the projection Linear exists only when conv_dim[-1] != hidden_size
    from transformers import SEWConfig, SEWForCTC

    common = dict(_COMMON)
    common["conv_dim"] = (16, 16, conv_last)
    cfg = SEWConfig(
        **common,
        feat_extract_norm="group",
        conv_bias=False,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        squeeze_factor=squeeze,
    )
    torch.manual_seed(7)
    ref = SEWForCTC(cfg).eval()
    d = _save_dir(tmp_path, ref, f"sew_{conv_last}_{squeeze}")
    _assert_logit_parity(d, ref)
