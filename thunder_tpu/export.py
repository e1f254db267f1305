"""Model export: the TPU-native replacement for TorchScript serving.

The reference's deployment story is ``module.to_torchscript()`` + a scripted
``AudioFileLoader`` (`/root/reference/src/thunder/module.py:88`,
`README.md:50-72`; SURVEY.md §3.5).  Here the equivalents are:

- :func:`aot_export` / :func:`aot_load`: ``jax.export`` serializes the whole
  jitted predict graph (StableHLO) for fixed padded shapes — loadable in a
  process with no model code at all, and AOT-compilable on the serving TPU.
- :func:`save_inference_bundle` / :func:`load_inference_bundle`: params
  (orbax) + architecture/vocab config (json) — rebuilds a full ``CTCModule``
  (including host-side text decode) from disk.

Length-masked bucket batching replaces TorchScript's dynamic shapes.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from thunder_tpu.audio.frontend import FilterbankFeatures, Wav2Vec2Preprocess
from thunder_tpu.models.citrinet import CitrinetEncoder
from thunder_tpu.models.decoders import Conv1dDecoder, LinearDecoder
from thunder_tpu.models.quartznet import QuartznetEncoder
from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text.transform import BatchTextTransformer

__all__ = ["aot_export", "aot_load", "save_inference_bundle", "load_inference_bundle"]


# ---------------------------------------------------------------------------
# AOT (StableHLO) export of the jitted predict function
# ---------------------------------------------------------------------------


def aot_export(module: CTCModule, batch_size: int, num_samples: int, path: Optional[str] = None) -> bytes:
    """Serialize the full predict graph (logits + argmax) for fixed shapes.

    Returns the serialized bytes (also written to ``path`` if given).  The
    artifact embeds the weights as constants — a pure serving payload.
    """
    variables = module.variables

    def predict_fn(audio, lengths):
        logits, out_lengths = module.model.apply(variables, audio, lengths, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), out_lengths

    args = (
        jax.ShapeDtypeStruct((batch_size, num_samples), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    exported = jax.export.export(jax.jit(predict_fn))(*args)
    blob = exported.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def aot_load(blob_or_path) -> "jax.export.Exported":
    """Deserialize an exported predict graph; run it via ``.call(audio, lengths)``."""
    if isinstance(blob_or_path, (str, Path)):
        blob_or_path = Path(blob_or_path).read_bytes()
    return jax.export.deserialize(bytearray(blob_or_path))


# ---------------------------------------------------------------------------
# Rebuildable inference bundle (params + config + vocab)
# ---------------------------------------------------------------------------


def _encoder_config(encoder) -> dict:
    if isinstance(encoder, QuartznetEncoder):
        return {
            "family": "quartznet",
            "feat_in": encoder.feat_in,
            "filters": list(encoder.filters),
            "kernel_sizes": list(encoder.kernel_sizes),
            "repeat_blocks": encoder.repeat_blocks,
            "repeat": encoder.repeat,
            "dropout": encoder.dropout,
        }
    if isinstance(encoder, CitrinetEncoder):
        return {
            "family": "citrinet",
            "feat_in": encoder.feat_in,
            "filters": list(encoder.filters),
            "kernel_sizes": list(encoder.kernel_sizes),
            "strides": list(encoder.strides),
            "repeat": encoder.repeat,
            "dropout": encoder.dropout,
        }
    if isinstance(encoder, Wav2Vec2Encoder):
        cfg = encoder.config
        return {
            "family": "wav2vec2",
            "mask_input": encoder.mask_input,
            "config": {
                k: (list(v) if isinstance(v, tuple) else v) for k, v in vars(cfg).items()
            },
        }
    raise ValueError(f"unsupported encoder type for export: {type(encoder)}")


def _frontend_config(frontend) -> dict:
    if isinstance(frontend, FilterbankFeatures):
        return {
            "kind": "filterbank",
            "sample_rate": frontend.sample_rate,
            "n_window_size": frontend.n_window_size,
            "n_window_stride": frontend.n_window_stride,
            "n_fft": frontend.n_fft,
            "preemph": frontend.preemph,
            "nfilt": frontend.nfilt,
            "dither": frontend.dither,
        }
    if isinstance(frontend, Wav2Vec2Preprocess):
        return {"kind": "wav2vec2", "div_guard": frontend.div_guard, "mask_input": frontend.mask_input}
    raise ValueError(f"unsupported frontend type for export: {type(frontend)}")


def _decoder_config(decoder) -> Optional[dict]:
    if decoder is None:
        return None
    if isinstance(decoder, Conv1dDecoder):
        return {"kind": "conv1d", "num_classes": decoder.num_classes}
    if isinstance(decoder, LinearDecoder):
        return {"kind": "linear", "num_classes": decoder.num_classes, "dropout": decoder.dropout}
    raise ValueError(f"unsupported decoder type for export: {type(decoder)}")


def _text_config(tt: Optional[BatchTextTransformer]) -> Optional[dict]:
    if tt is None:
        return None
    v = tt.vocab
    base = [t for t in v.itos]
    cfg = {
        "tokens": base,
        "blank_token": v.blank_token,
        "pad_token": v.pad_token,
        "unknown_token": v.unknown_token,
        "start_token": v.start_token,
        "end_token": v.end_token,
        "tokenizer": "char",
    }
    from thunder_tpu.text.tokenizer import BPETokenizer

    if isinstance(tt.tokenizer, BPETokenizer):
        cfg["tokenizer"] = "sentencepiece"
    return cfg


def save_inference_bundle(directory: str, module: CTCModule) -> str:
    """Write params + architecture/vocab config; returns the directory."""
    from thunder_tpu.training.checkpointing import save_module

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    config = {
        "encoder": _encoder_config(module.model.encoder),
        "frontend": _frontend_config(module.model.audio_transform),
        "decoder": _decoder_config(module.model.decoder),
        "text": _text_config(module.text_transform),
        "encoder_final_dimension": module.encoder_final_dimension,
    }
    (directory / "config.json").write_text(json.dumps(config, indent=2))
    from thunder_tpu.text.tokenizer import BPETokenizer

    if module.text_transform is not None and isinstance(module.text_transform.tokenizer, BPETokenizer):
        module.text_transform.tokenizer.model.save(str(directory / "tokenizer.model"))
    save_module(str(directory), module)
    return str(directory)


def load_inference_bundle(directory: str) -> CTCModule:
    """Rebuild a CTCModule from :func:`save_inference_bundle` output."""
    directory = Path(directory)
    config = json.loads((directory / "config.json").read_text())

    enc_cfg = dict(config["encoder"])
    family = enc_cfg.pop("family")
    if family == "quartznet":
        encoder = QuartznetEncoder(**{**enc_cfg, "filters": tuple(enc_cfg.pop("filters")), "kernel_sizes": tuple(enc_cfg.pop("kernel_sizes"))})
    elif family == "citrinet":
        encoder = CitrinetEncoder(
            filters=tuple(enc_cfg.pop("filters")),
            kernel_sizes=tuple(enc_cfg.pop("kernel_sizes")),
            strides=tuple(enc_cfg.pop("strides")),
            **enc_cfg,
        )
    elif family == "wav2vec2":
        encoder = Wav2Vec2Encoder(
            config=Wav2Vec2Config(**config["encoder"]["config"]), mask_input=enc_cfg.get("mask_input", True)
        )
    else:
        raise ValueError(f"unknown encoder family {family}")

    f_cfg = dict(config["frontend"])
    kind = f_cfg.pop("kind")
    frontend = FilterbankFeatures(**f_cfg) if kind == "filterbank" else Wav2Vec2Preprocess(**f_cfg)

    d_cfg = config["decoder"]
    if d_cfg is None:
        decoder = None
    elif d_cfg["kind"] == "conv1d":
        decoder = Conv1dDecoder(num_classes=d_cfg["num_classes"])
    else:
        decoder = LinearDecoder(num_classes=d_cfg["num_classes"], dropout=d_cfg.get("dropout", 0.0))

    t_cfg = config["text"]
    text_transform = None
    if t_cfg is not None:
        sp = directory / "tokenizer.model"
        text_transform = BatchTextTransformer(
            tokens=t_cfg["tokens"],
            blank_token=t_cfg["blank_token"],
            pad_token=t_cfg["pad_token"],
            unknown_token=t_cfg["unknown_token"],
            start_token=t_cfg["start_token"],
            end_token=t_cfg["end_token"],
            sentencepiece_model=str(sp) if sp.exists() else None,
        )

    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=frontend,
        encoder=encoder,
        decoder=decoder,
        text_transform=text_transform,
        encoder_final_dimension=config.get("encoder_final_dimension"),
        sample_len=4000,
    )
    from thunder_tpu.training.checkpointing import restore_module_variables

    return restore_module_variables(str(directory / "module"), module)
