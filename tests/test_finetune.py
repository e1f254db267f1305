"""finetune_ctc_module: checkpoint reuse + head/vocab swap (reference
`tests/test_finetune.py` behaviors, offline via a local HF dir)."""

import json

import flax
import jax
import numpy as np
import pytest
import torch

transformers = pytest.importorskip("transformers")

from thunder_tpu.finetune import finetune_ctc_module  # noqa: E402
from thunder_tpu.models import LinearDecoder  # noqa: E402

VOCAB = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4, "a": 5, "b": 6, "c": 7}


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from transformers import Wav2Vec2Config, Wav2Vec2CTCTokenizer, Wav2Vec2FeatureExtractor, Wav2Vec2ForCTC

    d = tmp_path_factory.mktemp("hf") / "tiny"
    cfg = Wav2Vec2Config(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0, final_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False,
    )
    torch.manual_seed(0)
    Wav2Vec2ForCTC(cfg).eval().save_pretrained(d)
    (d / "vocab.json").write_text(json.dumps(VOCAB))
    Wav2Vec2CTCTokenizer(str(d / "vocab.json"), pad_token="<pad>", unk_token="<unk>", word_delimiter_token="|").save_pretrained(d)
    Wav2Vec2FeatureExtractor(do_normalize=True).save_pretrained(d)
    return str(d)


def test_finetune_keeps_original_head(hf_dir):
    module = finetune_ctc_module(hf_dir)
    assert module.text_transform is not None
    assert module.hparams["checkpoint_name"] == hf_dir


def test_finetune_swaps_head_and_keeps_encoder(hf_dir):
    base = finetune_ctc_module(hf_dir)
    new = finetune_ctc_module(hf_dir, tokens=list("xyz "), decoder_builder=LinearDecoder)

    # encoder weights preserved exactly
    enc_a = flax.traverse_util.flatten_dict(base.variables["params"]["encoder"])
    enc_b = flax.traverse_util.flatten_dict(new.variables["params"]["encoder"])
    for k in enc_a:
        np.testing.assert_array_equal(np.asarray(enc_a[k]), np.asarray(enc_b[k]))

    # new head sized for the new vocab
    assert new.text_transform.num_tokens == len("xyz ") + 1  # + blank
    assert new.variables["params"]["decoder"]["dense"]["kernel"].shape[-1] == new.text_transform.num_tokens

    audio = np.random.default_rng(0).standard_normal((1, 4000)).astype(np.float32)
    logits, _ = new.forward(audio, np.array([4000]))
    assert logits.shape[-1] == new.text_transform.num_tokens


def test_finetune_tokens_without_decoder_raises(hf_dir):
    with pytest.raises(ValueError, match="decoder class"):
        finetune_ctc_module(hf_dir, tokens=list("ab"))


def test_finetune_decoder_without_tokens_raises(hf_dir):
    with pytest.raises(ValueError, match="tokens"):
        finetune_ctc_module(hf_dir, decoder_builder=LinearDecoder)


def test_hf_feature_extractor_frozen_during_training(hf_dir, tmp_path):
    """The reference freezes the wav2vec2 conv feature extractor on load
    (`huggingface/compatibility.py:27-28`); the Trainer must honor it."""
    import wave

    from thunder_tpu.data import ManifestDatamodule
    from thunder_tpu.training import Trainer

    module = finetune_ctc_module(hf_dir, tokens=list("abc "), decoder_builder=LinearDecoder)
    assert module.frozen_paths == [("encoder", "feature_extractor")]

    items = []
    for i in range(2):
        p = tmp_path / f"f{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((np.sin(np.arange(8000) / 15) * 9000).astype(np.int16).tobytes())
        items.append({"audio_filepath": str(p), "text": "abc", "duration": 0.5})
    m = tmp_path / "fz.json"
    m.write_text("\n".join(json.dumps(it) for it in items))
    dm = ManifestDatamodule(str(m), str(m), str(m), batch_size=2, num_workers=1)
    dm.setup("fit")

    before = flax.traverse_util.flatten_dict(module.variables["params"]["encoder"]["feature_extractor"])
    before_tr = flax.traverse_util.flatten_dict(module.variables["params"]["encoder"]["layer0"])
    trainer = Trainer(max_epochs=2, optimizer_kwargs={"learning_rate": 1e-3}, log_every=1)
    out = trainer.fit(module, train_loader=dm.train_dataloader())
    after = flax.traverse_util.flatten_dict(out.variables["params"]["encoder"]["feature_extractor"])
    after_tr = flax.traverse_util.flatten_dict(out.variables["params"]["encoder"]["layer0"])

    for k in before:
        np.testing.assert_array_equal(np.asarray(before[k]), np.asarray(after[k]))
    assert any(not np.array_equal(np.asarray(before_tr[k]), np.asarray(after_tr[k])) for k in before_tr)


def test_finetune_then_fast_dev_run(hf_dir, tmp_path):
    import wave

    from thunder_tpu.data import ManifestDatamodule
    from thunder_tpu.training import Trainer

    module = finetune_ctc_module(hf_dir, tokens=list("abc "), decoder_builder=LinearDecoder)
    items = []
    for i in range(2):
        p = tmp_path / f"w{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((np.sin(np.arange(8000) / 20) * 10000).astype(np.int16).tobytes())
        items.append({"audio_filepath": str(p), "text": "abc", "duration": 0.5})
    m = tmp_path / "m.json"
    m.write_text("\n".join(json.dumps(it) for it in items))
    dm = ManifestDatamodule(str(m), str(m), str(m), batch_size=2, num_workers=1)
    trainer = Trainer(fast_dev_run=True, optimizer_kwargs={"learning_rate": 1e-5})
    out = trainer.fit(module, datamodule=dm)
    assert np.isfinite([l["loss/train_loss"] for l in trainer.logs if "loss/train_loss" in l][0])
