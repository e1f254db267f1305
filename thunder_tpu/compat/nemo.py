"""NeMo ``.nemo`` checkpoint import for QuartzNet and Citrinet.

Rebuild of the reference compatibility layer
(`/root/reference/src/thunder/quartznet/compatibility.py:71-201`,
`/root/reference/src/thunder/citrinet/compatibility.py:54-176`):

- extract the ``.nemo`` tar (model_config.yaml + model_weights.ckpt
  [+ tokenizer.model]);
- parse the NeMo yaml into encoder/frontend/text configs;
- remap the torch state dict onto the flax param/batch_stats pytrees.

The key mapping goes straight from the *original NeMo keys*
(``encoder.encoder.{block}.mconv.{idx}...``, ``...res.0.{idx}...``,
``decoder.decoder_layers.0.*``) to this framework's tree — documented at
:func:`nemo_key_map`.
"""

from __future__ import annotations

import tarfile
from pathlib import Path
from tempfile import TemporaryDirectory
from typing import Dict, Optional, Tuple, Union

import jax
import numpy as np
import yaml

from thunder_tpu.audio.frontend import FilterbankFeatures
from thunder_tpu.models.citrinet import CitrinetEncoder
from thunder_tpu.models.decoders import Conv1dDecoder
from thunder_tpu.models.quartznet import QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.compat.torch_reader import load_torch_checkpoint
from thunder_tpu.text.transform import BatchTextTransformer
from thunder_tpu.utils import BaseCheckpoint, download_checkpoint

__all__ = [
    "QuartznetCheckpoint",
    "CitrinetCheckpoint",
    "load_quartznet_checkpoint",
    "load_citrinet_checkpoint",
    "load_components_from_quartznet_config",
    "load_components_from_citrinet_config",
    "load_nemo_weights",
    "fix_vocab",
]


# fmt: off
class QuartznetCheckpoint(BaseCheckpoint):
    """NGC-hosted QuartzNet checkpoints (same set the reference registers,
    `quartznet/compatibility.py:34-59`)."""
    QuartzNet15x5Base_En = "https://api.ngc.nvidia.com/v2/models/nvidia/nemospeechmodels/versions/1.0.0a5/files/QuartzNet15x5Base-En.nemo"
    QuartzNet15x5Base_Zh = "https://api.ngc.nvidia.com/v2/models/nvidia/nemospeechmodels/versions/1.0.0a5/files/QuartzNet15x5Base-Zh.nemo"
    QuartzNet5x5LS_En = "https://api.ngc.nvidia.com/v2/models/nvidia/nemospeechmodels/versions/1.0.0a5/files/QuartzNet5x5LS-En.nemo"
    QuartzNet15x5NR_En = "https://api.ngc.nvidia.com/v2/models/nvidia/nemospeechmodels/versions/1.0.0a5/files/QuartzNet15x5NR-En.nemo"

    stt_ca_quartznet15x5 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_ca_quartznet15x5/versions/1.0.0rc1/files/stt_ca_quartznet15x5.nemo"
    stt_it_quartznet15x5 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_it_quartznet15x5/versions/1.0.0rc1/files/stt_it_quartznet15x5.nemo"
    stt_fr_quartznet15x5 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_fr_quartznet15x5/versions/1.0.0rc1/files/stt_fr_quartznet15x5.nemo"
    stt_es_quartznet15x5 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_es_quartznet15x5/versions/1.0.0rc1/files/stt_es_quartznet15x5.nemo"
    stt_de_quartznet15x5 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_de_quartznet15x5/versions/1.0.0rc1/files/stt_de_quartznet15x5.nemo"
    stt_pl_quartznet15x5 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_pl_quartznet15x5/versions/1.0.0rc1/files/stt_pl_quartznet15x5.nemo"
    stt_ru_quartznet15x5 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_ru_quartznet15x5/versions/1.0.0rc1/files/stt_ru_quartznet15x5.nemo"
    stt_en_quartznet15x5 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_en_quartznet15x5/versions/1.0.0rc1/files/stt_en_quartznet15x5.nemo"
    stt_zh_quartznet15x5 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_zh_quartznet15x5/versions/1.0.0rc1/files/stt_zh_quartznet15x5.nemo"


class CitrinetCheckpoint(BaseCheckpoint):
    """NGC-hosted Citrinet checkpoints (`citrinet/compatibility.py:30-42`)."""
    stt_en_citrinet_256 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_en_citrinet_256/versions/1.0.0rc1/files/stt_en_citrinet_256.nemo"
    stt_en_citrinet_512 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_en_citrinet_512/versions/1.0.0rc1/files/stt_en_citrinet_512.nemo"
    stt_en_citrinet_1024 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_en_citrinet_1024/versions/1.0.0rc1/files/stt_en_citrinet_1024.nemo"
    stt_es_citrinet_512 = "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_es_citrinet_512/versions/1.0.0/files/stt_es_citrinet_512.nemo"
# fmt: on


def _extract_nemo(nemo_path: str, dest: str):
    with tarfile.open(nemo_path) as tar:
        try:
            tar.extractall(dest, filter="data")
        except TypeError:  # filter= needs >= 3.12 (or late 3.10/3.11 backports)
            tar.extractall(dest)


def _cfg_section(conf: dict, key: str) -> dict:
    """NeMo configs nest hyperparameters under 'params' in old versions."""
    section = conf[key]
    return section.get("params", section)


def _preprocess_cfg(preprocess: dict, augment_params: Optional[dict]) -> dict:
    augment_params = dict(augment_params or {})
    augment_params.pop("dropout", None)
    return dict(
        sample_rate=preprocess["sample_rate"],
        n_window_size=int(preprocess["window_size"] * preprocess["sample_rate"]),
        n_window_stride=int(preprocess["window_stride"] * preprocess["sample_rate"]),
        n_fft=preprocess["n_fft"],
        nfilt=preprocess["features"],
        dither=preprocess["dither"],
        **augment_params,
    )


def load_components_from_quartznet_config(
    config_path: Union[str, Path], augment_params: Optional[dict] = None
) -> Tuple[QuartznetEncoder, FilterbankFeatures, BatchTextTransformer]:
    """NeMo model_config.yaml -> (encoder, audio_transform, text_transform).

    Follows the reference parse (`quartznet/compatibility.py:71-124`): body
    blocks are ``jasper[1:-2]``; labels come from ``labels`` or the decoder
    vocabulary.
    """
    augment_params = dict(augment_params or {})
    with open(config_path) as f:
        conf = yaml.safe_load(f)
    encoder_cfg = _cfg_section(conf, "encoder")
    jasper = encoder_cfg["jasper"]
    body = jasper[1:-2]
    filters = [b["filters"] for b in body]
    kernel_sizes = [b["kernel"][0] for b in body]
    repeat = jasper[1]["repeat"] if body else 5
    dropout = augment_params.pop("dropout", 0.0)

    preprocess = _preprocess_cfg(_cfg_section(conf, "preprocessor"), augment_params)

    labels = conf["labels"] if "labels" in conf else _cfg_section(conf, "decoder")["vocabulary"]

    # NeMo configs list every body block explicitly (15x5 = 15 entries), which
    # is the same architecture as repeat_blocks=1 over the full list.
    encoder = QuartznetEncoder(
        feat_in=preprocess["nfilt"],
        filters=tuple(filters),
        kernel_sizes=tuple(kernel_sizes),
        repeat_blocks=1,
        repeat=repeat,
        dropout=dropout,
    )
    audio_transform = FilterbankFeatures(**preprocess)
    text_transform = BatchTextTransformer(tokens=list(labels))
    return encoder, audio_transform, text_transform


def load_components_from_citrinet_config(
    config_path: Union[str, Path],
    sentencepiece_path: Union[str, Path],
    augment_params: Optional[dict] = None,
) -> Tuple[CitrinetEncoder, FilterbankFeatures, BatchTextTransformer]:
    """NeMo Citrinet yaml -> components (`citrinet/compatibility.py:54-111`);
    body blocks are ``jasper[1:-1]`` and carry per-block strides."""
    augment_params = dict(augment_params or {})
    with open(config_path) as f:
        conf = yaml.safe_load(f)
    encoder_cfg = _cfg_section(conf, "encoder")
    jasper = encoder_cfg["jasper"]
    body = jasper[1:-1]
    dropout = augment_params.pop("dropout", 0.0)
    preprocess = _preprocess_cfg(_cfg_section(conf, "preprocessor"), augment_params)
    labels = conf["labels"] if "labels" in conf else _cfg_section(conf, "decoder")["vocabulary"]

    encoder = CitrinetEncoder(
        filters=tuple(b["filters"] for b in body),
        kernel_sizes=tuple(b["kernel"][0] for b in body),
        strides=tuple(b["stride"][0] for b in body),
        feat_in=preprocess["nfilt"],
        repeat=body[0]["repeat"] if body else 5,
        dropout=dropout,
    )
    text_transform = BatchTextTransformer(
        tokens=fix_vocab(list(labels)), sentencepiece_model=str(sentencepiece_path)
    )
    audio_transform = FilterbankFeatures(**preprocess)
    return encoder, audio_transform, text_transform


def fix_vocab(vocab_tokens):
    """NeMo wordpiece-style labels back to sentencepiece style:
    ``##x`` -> ``x``, else prefix with ``▁`` (`citrinet/compatibility.py:114-130`)."""
    out = []
    for token in vocab_tokens:
        out.append(token[2:] if token.startswith("##") else "▁" + token)
    return out


# ---------------------------------------------------------------------------
# weight remapping
# ---------------------------------------------------------------------------


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    # torch conv (out, in/groups, k) -> flax (k, in/groups, out)
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def nemo_key_map(key: str, separable_blocks: Dict[int, bool]):
    """Map one NeMo state-dict key to (collection, flax path tuple, transform).

    NeMo layout (torch ModuleList indices; act/drop layers hold no params):

    ==========================================  =============================
    NeMo key                                    flax path
    ==========================================  =============================
    encoder.encoder.B.mconv.I.conv.weight       encoder/blockB/repR/{depthwise|pointwise|conv→conv}/conv/kernel
    encoder.encoder.B.mconv.I.{weight,bias}     encoder/blockB/repR/bn/{scale,bias}
    encoder.encoder.B.mconv.I.running_{mean,var} batch_stats .../bn/{mean,var}
    encoder.encoder.B.mconv.SE.fc.{0,2}.weight  encoder/blockB/se/fc{1,2}/kernel
    encoder.encoder.B.res.0.0.conv.weight       encoder/blockB/res/conv/conv/kernel
    encoder.encoder.B.res.0.1.*                 encoder/blockB/res/bn/*
    decoder.decoder_layers.0.{weight,bias}      decoder/conv/{kernel,bias}
    ==========================================  =============================

    where I groups into repeats of 5 (separable: dw, pw, bn, act, drop) or 4
    (dense: conv, bn, act, drop).
    """
    parts = key.split(".")
    if parts[0] == "decoder":
        # decoder.decoder_layers.0.weight / bias
        leaf = parts[-1]
        if leaf == "weight":
            return "params", ("decoder", "conv", "kernel"), _conv_to_flax
        return "params", ("decoder", "conv", "bias"), None

    if parts[0] == "encoder":
        # encoder.encoder.B....
        block = int(parts[2])
        rest = parts[3:]
        prefix = ("encoder", f"block{block}")
        separable = separable_blocks.get(block, True)
        group = 5 if separable else 4

        if rest[0] == "mconv":
            idx = int(rest[1])
            leaf = rest[-1]
            if leaf == "num_batches_tracked":
                return None, None, None
            if rest[2] == "fc":  # squeeze-excite: mconv.I.fc.{0|2}.weight
                fc = "fc1" if rest[3] == "0" else "fc2"
                return "params", prefix + ("se", fc, "kernel"), lambda w: np.ascontiguousarray(w.T)
            r = idx // group
            slot = idx % group
            rep = f"rep{r}"
            if rest[2] == "conv":  # masked conv layer
                if separable:
                    sub = "depthwise" if slot == 0 else "pointwise"
                else:
                    sub = "conv"
                return "params", prefix + (rep, sub, "conv", "kernel"), _conv_to_flax
            # batchnorm layer
            target = {
                "weight": ("params", "scale"),
                "bias": ("params", "bias"),
                "running_mean": ("batch_stats", "mean"),
                "running_var": ("batch_stats", "var"),
            }[leaf]
            return target[0], prefix + (rep, "bn", target[1]), None

        if rest[0] == "res":
            # res.0.{0|1}.<...>
            sub_idx = rest[2]
            leaf = rest[-1]
            if leaf == "num_batches_tracked":
                return None, None, None
            if sub_idx == "0":
                return "params", prefix + ("res", "conv", "conv", "kernel"), _conv_to_flax
            target = {
                "weight": ("params", "scale"),
                "bias": ("params", "bias"),
                "running_mean": ("batch_stats", "mean"),
                "running_var": ("batch_stats", "var"),
            }[leaf]
            return target[0], prefix + ("res", "bn", target[1]), None

    raise KeyError(f"unrecognized NeMo checkpoint key: {key}")


def load_nemo_weights(variables: dict, weights: Dict[str, np.ndarray], separable_blocks: Dict[int, bool]) -> dict:
    """Merge a NeMo state dict into freshly-initialized flax variables.

    Strict: every checkpoint tensor must land on an existing tree leaf with a
    matching shape (mirrors the reference's ``strict=True`` load,
    `quartznet/compatibility.py:148`).
    """
    import flax

    flat = {
        "params": flax.traverse_util.flatten_dict(variables["params"]),
        "batch_stats": flax.traverse_util.flatten_dict(variables.get("batch_stats", {})),
    }
    touched = set()
    for key, value in weights.items():
        coll, path, transform = nemo_key_map(key, separable_blocks)
        if coll is None:
            continue
        value = np.asarray(value, dtype=np.float32)
        if transform is not None:
            value = transform(value)
        if path not in flat[coll]:
            raise KeyError(f"{key} -> {coll}/{'/'.join(path)} not present in model tree")
        expected = flat[coll][path].shape
        if tuple(value.shape) != tuple(expected):
            raise ValueError(f"{key}: shape {value.shape} != model {expected}")
        flat[coll][path] = value.astype(flat[coll][path].dtype)
        touched.add((coll, path))
    missing = [
        (c, p)
        for c in ("params", "batch_stats")
        for p in flat[c]
        if (c, p) not in touched
    ]
    if missing:
        raise KeyError(f"model leaves not covered by checkpoint: {missing[:5]} (+{max(0, len(missing)-5)} more)")
    return {
        "params": flax.traverse_util.unflatten_dict(flat["params"]),
        "batch_stats": flax.traverse_util.unflatten_dict(flat["batch_stats"]),
    }


def _block_layout(encoder) -> Dict[int, bool]:
    """separable? per block index, mirroring the encoder builders (the key
    map derives repeat indices from the ModuleList position itself)."""
    separable: Dict[int, bool] = {}
    if isinstance(encoder, QuartznetEncoder):
        n_body = len(encoder.filters) * encoder.repeat_blocks
        blocks = 1 + n_body + 2
        for b in range(blocks):
            separable[b] = b != blocks - 1  # final 1x1 block is dense
    else:  # Citrinet
        blocks = 1 + len(encoder.filters) + 1
        for b in range(blocks):
            separable[b] = True
    return separable


def _load_nemo_module(
    checkpoint,
    checkpoint_enum_cls,
    components_fn,
    decoder_dim: int,
    save_folder=None,
    augment_params=None,
    needs_tokenizer=False,
) -> CTCModule:
    if isinstance(checkpoint, BaseCheckpoint):
        nemo_filepath = download_checkpoint(checkpoint, save_folder)
    else:
        nemo_filepath = Path(checkpoint)

    with TemporaryDirectory() as extract_folder:
        _extract_nemo(str(nemo_filepath), extract_folder)
        extract_path = Path(extract_folder)
        config_path = extract_path / "model_config.yaml"
        if needs_tokenizer:
            sp_candidates = list(extract_path.glob("*.model"))
            sp_path = extract_path / "tokenizer.model"
            if not sp_path.exists() and sp_candidates:
                sp_path = sp_candidates[0]
            encoder, audio_transform, text_transform = components_fn(config_path, sp_path, augment_params)
        else:
            encoder, audio_transform, text_transform = components_fn(config_path, augment_params)

        decoder = Conv1dDecoder(num_classes=text_transform.num_tokens)
        module = CTCModule.create(
            jax.random.PRNGKey(0),
            audio_transform=audio_transform,
            encoder=encoder,
            decoder=decoder,
            text_transform=text_transform,
            encoder_final_dimension=decoder_dim,
            sample_len=4000,
        )
        weights = load_torch_checkpoint(str(extract_path / "model_weights.ckpt"))
        variables = load_nemo_weights(module.variables, weights, _block_layout(encoder))
        return module.with_variables(variables)


def load_quartznet_checkpoint(
    checkpoint: Union[str, QuartznetCheckpoint], save_folder=None, augment_params=None
) -> CTCModule:
    """Local ``.nemo`` path or checkpoint enum -> ready-to-predict CTCModule."""
    return _load_nemo_module(
        checkpoint,
        QuartznetCheckpoint,
        load_components_from_quartznet_config,
        decoder_dim=1024,
        save_folder=save_folder,
        augment_params=augment_params,
    )


def load_citrinet_checkpoint(
    checkpoint: Union[str, CitrinetCheckpoint], save_folder=None, augment_params=None
) -> CTCModule:
    """Local ``.nemo`` path or checkpoint enum -> ready-to-predict CTCModule."""
    return _load_nemo_module(
        checkpoint,
        CitrinetCheckpoint,
        load_components_from_citrinet_config,
        decoder_dim=640,
        save_folder=save_folder,
        augment_params=augment_params,
        needs_tokenizer=True,
    )
