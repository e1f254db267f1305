"""FULL-MODULE parity: the actual reference ``BaseCTCModule`` vs thunder_tpu.

The strongest WER-parity evidence attainable offline (VERDICT round-3 item 2):
both frameworks load THE SAME checkpoint file through their own complete
loading stacks and transcribe THE SAME waveforms through their own complete
predict pipelines —

  reference (torch):  load_*_checkpoint -> BaseCTCModule.predict
                      (audio_transform -> encoder -> decoder -> argmax ->
                      decode_prediction, `/root/reference/src/thunder/module.py:74-100`)
  thunder_tpu (jax):  compat loaders -> CTCModule.predict

— and every transcription string must be identical, hence equal corpus WER.
Reference code imports via tests/ref_shims.py (missing heavy deps stubbed;
the mel matrix comes from HF transformers' independent implementation, so
the comparison stays non-circular).

Covers QuartzNet, Citrinet (strided, SqueezeExcite, BPE vocab) and a
wav2vec2 config (HF tiny-random checkpoint through both HF loaders).
"""

import io
import json
import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
from ref_shims import HAS_REF, install_reference_shims  # noqa: E402

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference source unavailable")

if HAS_REF:
    install_reference_shims()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from thunder_tpu.training.metrics import wer as corpus_wer  # noqa: E402


# ----- synthetic "speech" + ground-truth texts ------------------------------

WORDS = "the quick brown fox jumps over a lazy dog near red hill".split()


def _utterances(n, rng, buckets=(16000, 24000, 32000)):
    """n waveforms in len(buckets) equal-length groups + random texts."""
    groups = []
    for b, samples in enumerate(buckets):
        size = n // len(buckets)
        wavs = []
        for i in range(size):
            t = np.arange(samples) / 16000.0
            f0 = 120 + 60 * rng.random()
            wav = (
                0.3 * np.sin(2 * np.pi * f0 * t)
                + 0.2 * np.sin(2 * np.pi * 3.1 * f0 * t)
                + 0.1 * rng.standard_normal(samples)
            ).astype(np.float32)
            wavs.append(wav)
        texts = [
            " ".join(rng.choice(WORDS, size=rng.integers(2, 6)))
            for _ in range(size)
        ]
        groups.append((np.stack(wavs), texts))
    return groups


def _predict_reference(ref_module, wavs):
    with torch.no_grad():
        return ref_module.predict(torch.from_numpy(wavs))


def _assert_transcriptions_equal(ref_module, our_module, groups):
    all_ref, all_ours, all_truth = [], [], []
    for wavs, texts in groups:
        ref_out = _predict_reference(ref_module, wavs)
        our_out = our_module.predict(jnp.asarray(wavs))
        assert list(ref_out) == list(our_out), (
            f"transcriptions diverge: ref={ref_out} ours={our_out}"
        )
        all_ref.extend(ref_out)
        all_ours.extend(our_out)
        all_truth.extend(texts)
    # identical strings -> identical corpus WER, computed explicitly
    assert corpus_wer(all_ref, all_truth) == corpus_wer(all_ours, all_truth)
    return all_ours


# ----- shared .nemo builder (raw NeMo key layout) ---------------------------


def _thunder_key_to_nemo(key: str) -> str:
    key = key.replace("layer.0.", "")
    key = key.replace(".res.", ".res.0.")
    return "encoder.encoder." + key


def _make_nemo_tar(path, config, state_dict, extra_files=None):
    weights_buf = io.BytesIO()
    torch.save(state_dict, weights_buf)
    weights_buf.seek(0)
    import yaml

    cfg_bytes = yaml.safe_dump(config).encode()
    with tarfile.open(path, "w") as tar:
        info = tarfile.TarInfo("model_config.yaml")
        info.size = len(cfg_bytes)
        tar.addfile(info, io.BytesIO(cfg_bytes))
        winfo = tarfile.TarInfo("model_weights.ckpt")
        data = weights_buf.getvalue()
        winfo.size = len(data)
        tar.addfile(winfo, io.BytesIO(data))
        for name, payload in (extra_files or {}).items():
            i = tarfile.TarInfo(name)
            i.size = len(payload)
            tar.addfile(i, io.BytesIO(payload))


def _randomize_torch_bn(module):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


QN_LABELS = list("abcdefghijklmnopqrstuvwxyz '")


def test_quartznet_full_module_parity(tmp_path):
    """48 synthetic utterances through both frameworks' complete QuartzNet
    stacks (same .nemo through both loaders) -> identical transcriptions."""
    torch.manual_seed(0)
    from thunder.blocks import conv1d_decoder
    from thunder.quartznet.blocks import QuartznetEncoder as RefEncoder
    from thunder.quartznet.compatibility import (
        load_quartznet_checkpoint as ref_load_quartznet,
    )

    from thunder_tpu.compat.nemo import load_quartznet_checkpoint

    filters, kernels = [256], [33]
    ref_enc = RefEncoder(feat_in=64, filters=filters, kernel_sizes=kernels)
    ref_dec = conv1d_decoder(1024, len(QN_LABELS) + 1)
    _randomize_torch_bn(ref_enc)

    state = {_thunder_key_to_nemo(k): v for k, v in ref_enc.state_dict().items()}
    state.update(
        {f"decoder.decoder_layers.0.{k}": v for k, v in ref_dec.state_dict().items()}
    )
    jasper = [
        {"filters": 256, "repeat": 1, "kernel": [33], "stride": [2], "separable": True},
        {"filters": 256, "repeat": 5, "kernel": [33], "stride": [1], "separable": True},
        {"filters": 512, "repeat": 1, "kernel": [87], "dilation": [2], "separable": True},
        {"filters": 1024, "repeat": 1, "kernel": [1], "separable": False},
    ]
    config = {
        "labels": QN_LABELS,
        "preprocessor": {
            "params": {
                "sample_rate": 16000,
                "window_size": 0.02,
                "window_stride": 0.01,
                "n_fft": 512,
                "features": 64,
                "dither": 1e-5,
            }
        },
        "encoder": {"params": {"jasper": jasper}},
    }
    nemo_path = tmp_path / "model.nemo"
    _make_nemo_tar(nemo_path, config, state)

    ref_module = ref_load_quartznet(str(nemo_path))
    our_module = load_quartznet_checkpoint(str(nemo_path))

    groups = _utterances(48, np.random.default_rng(0))
    outs = _assert_transcriptions_equal(ref_module, our_module, groups)
    assert len(outs) == 48


CN_LABELS = ["ab", "cd", "##e", "fg", "hi", "jk", "##l", "mn"]


def test_citrinet_full_module_parity(tmp_path):
    """Citrinet (strided blocks + SqueezeExcite + sentencepiece-style vocab)
    through both frameworks' loaders -> identical transcriptions."""
    torch.manual_seed(3)
    from thunder.blocks import conv1d_decoder
    from thunder.citrinet.blocks import CitrinetEncoder as RefCitrinet
    from thunder.citrinet.compatibility import (
        load_citrinet_checkpoint as ref_load_citrinet,
    )

    from thunder_tpu.compat.nemo import load_citrinet_checkpoint

    filters, kernels, strides = [256, 256], [13, 15], [1, 2]
    ref_enc = RefCitrinet(filters=filters, kernel_sizes=kernels, strides=strides, feat_in=80)
    ref_dec = conv1d_decoder(640, len(CN_LABELS) + 1)
    _randomize_torch_bn(ref_enc)

    state = {_thunder_key_to_nemo(k): v for k, v in ref_enc.state_dict().items()}
    state.update(
        {f"decoder.decoder_layers.0.{k}": v for k, v in ref_dec.state_dict().items()}
    )
    jasper = [
        {"filters": 256, "repeat": 1, "kernel": [5], "stride": [1], "separable": True}
    ]
    for f, k, s in zip(filters, kernels, strides):
        jasper.append(
            {"filters": f, "repeat": 5, "kernel": [k], "stride": [s], "separable": True}
        )
    jasper.append(
        {"filters": 640, "repeat": 1, "kernel": [41], "stride": [1], "separable": True}
    )
    config = {
        "labels": CN_LABELS,
        "preprocessor": {
            "sample_rate": 16000,
            "window_size": 0.025,
            "window_stride": 0.01,
            "n_fft": 512,
            "features": 80,
            "dither": 1e-5,
        },
        "encoder": {"jasper": jasper},
    }
    sp_model = Path(
        "/root/reference/tests/nemo_config_samples/example_tokenizer.model"
    ).read_bytes()
    nemo_path = tmp_path / "model.nemo"
    _make_nemo_tar(nemo_path, config, state, extra_files={"tokenizer.model": sp_model})

    ref_module = ref_load_citrinet(str(nemo_path))
    our_module = load_citrinet_checkpoint(str(nemo_path))

    groups = _utterances(12, np.random.default_rng(1))
    outs = _assert_transcriptions_equal(ref_module, our_module, groups)
    assert len(outs) == 12


def _tiny_hf_checkpoint(tmp_path):
    """Save a tiny-random HF wav2vec2 CTC checkpoint (model + feature
    extractor + tokenizer) to disk — both HF loaders then read it offline."""
    from transformers import (
        Wav2Vec2Config,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2ForCTC,
    )

    vocab = {c: i for i, c in enumerate(["<pad>", "<s>", "</s>", "<unk>", "|"] + list("abcdefgh"))}
    vdir = tmp_path / "ckpt"
    vdir.mkdir()
    (vdir / "vocab.json").write_text(json.dumps(vocab))
    tok = Wav2Vec2CTCTokenizer(
        str(vdir / "vocab.json"), pad_token="<pad>", unk_token="<unk>",
        bos_token="<s>", eos_token="</s>", word_delimiter_token="|",
    )
    cfg = Wav2Vec2Config(
        vocab_size=len(vocab),
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        conv_dim=(32, 32, 64),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        apply_spec_augment=False,
    )
    torch.manual_seed(5)
    model = Wav2Vec2ForCTC(cfg)
    model.eval()
    # sharpen argmax margins: a random tiny model's logit gaps (~1e-3) sit
    # below the accepted cross-framework numeric noise (atol 2e-3 in the
    # logit-parity tests); scaling the head makes transcription equality
    # test pipeline semantics instead of f32 summation order
    with torch.no_grad():
        model.lm_head.weight.mul_(20.0)
        model.lm_head.bias.mul_(20.0)
    fe = Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False,
    )
    model.save_pretrained(vdir)
    fe.save_pretrained(vdir)
    tok.save_pretrained(vdir)
    # save_pretrained writes vocab.json sorted alphabetically; real hub
    # checkpoints (e.g. facebook/wav2vec2-base-960h) are id-ordered, and the
    # reference's _tok_to_transform relies on get_vocab() key order being id
    # order (`huggingface/compatibility.py:53`) — restore the hub layout
    saved = json.loads((vdir / "vocab.json").read_text())
    id_ordered = dict(sorted(saved.items(), key=lambda kv: kv[1]))
    (vdir / "vocab.json").write_text(json.dumps(id_ordered))
    return str(vdir)


def test_wav2vec2_full_module_parity(tmp_path):
    """The same local HF checkpoint through the reference's
    load_huggingface_checkpoint and ours -> identical transcriptions."""
    from thunder.huggingface.compatibility import (
        load_huggingface_checkpoint as ref_load_hf,
    )

    from thunder_tpu.compat.hf import load_huggingface_checkpoint

    ckpt = _tiny_hf_checkpoint(tmp_path)
    ref_module = ref_load_hf(ckpt)
    ref_module.eval()
    our_module = load_huggingface_checkpoint(ckpt)

    groups = _utterances(12, np.random.default_rng(2))
    outs = _assert_transcriptions_equal(ref_module, our_module, groups)
    assert len(outs) == 12
