"""HuggingFace checkpoint import for the wav2vec2 model family.

Rebuild of `/root/reference/src/thunder/huggingface/compatibility.py:23-135`:
``load_huggingface_checkpoint(name)`` pulls a torch ``AutoModelForCTC`` (hub
id or local directory), converts its weights onto the flax
:class:`~thunder_tpu.models.wav2vec2.Wav2Vec2Encoder`, builds the text
transform from the tokenizer vocab, and copies ``lm_head`` into a
``LinearDecoder`` — returning a ready ``CTCModule``.

Covered architectures (everything ``AutoModelForCTC`` accepts that shares
the conv-frontend + transformer shape): **wav2vec2** (both norm variants),
**HuBERT** (optional feature-projection LayerNorm), **data2vec-audio**
(stacked positional convs, per-layer conv LayerNorms), and **WavLM** (gated
bucketed relative position bias).  Logit parity with the torch models is
pinned in tests/wav2vec2/.

Weight-norm on the positional conv (``weight_g``/``weight_v`` or the newer
``parametrizations.weight.original{0,1}``) is folded into a plain kernel at
import time.
"""

from __future__ import annotations

from typing import Any, Dict, Optional
from warnings import warn

import jax
import numpy as np

from thunder_tpu.audio.frontend import Wav2Vec2Preprocess
from thunder_tpu.models.decoders import LinearDecoder
from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text.transform import BatchTextTransformer

__all__ = ["load_huggingface_checkpoint", "hf_state_to_variables", "tokenizer_to_transform"]


def _get_special_token(tokenizer, token_name: str) -> Optional[str]:
    token = getattr(tokenizer, token_name)
    if token in tokenizer.additional_special_tokens:
        return None
    return token


def tokenizer_to_transform(tokenizer) -> BatchTextTransformer:
    """HF CTC tokenizer -> BatchTextTransformer (reference ``_tok_to_transform``).

    Vocab is ordered by token id (the decoder's output axis), "|" maps to
    space, and post-hoc ``additional_special_tokens`` are dropped.
    """
    by_id = sorted(tokenizer.get_vocab().items(), key=lambda kv: kv[1])
    extras = set(tokenizer.additional_special_tokens)
    vocab = [(" " if tok == "|" else tok) for tok, _ in by_id if tok not in extras]
    return BatchTextTransformer(
        tokens=vocab,
        blank_token=_get_special_token(tokenizer, "pad_token"),
        pad_token=_get_special_token(tokenizer, "pad_token"),
        unknown_token=_get_special_token(tokenizer, "unk_token"),
    )


def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """weight = g * v / ||v|| with the norm over the dims where g is size-1."""
    reduce_dims = tuple(i for i in range(v.ndim) if g.shape[i] == 1)
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=reduce_dims, keepdims=True))
    return (g * v / norm).astype(np.float32)


def _conv_t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def hf_state_to_variables(state: Dict[str, np.ndarray], config: Wav2Vec2Config) -> Dict[str, Any]:
    """HF Wav2Vec2Model state dict (numpy) -> flax params for Wav2Vec2Encoder."""
    import flax

    p: Dict[tuple, np.ndarray] = {}

    def dense(src: str, dst: tuple):
        p[dst + ("kernel",)] = np.ascontiguousarray(state[src + ".weight"].T)
        if src + ".bias" in state:
            p[dst + ("bias",)] = state[src + ".bias"]

    def norm(src: str, dst: tuple):
        p[dst + ("scale",)] = state[src + ".weight"]
        p[dst + ("bias",)] = state[src + ".bias"]

    for i in range(len(config.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        p[("feature_extractor", f"conv{i}", "kernel")] = _conv_t(state[f"{base}.conv.weight"])
        if f"{base}.conv.bias" in state:
            p[("feature_extractor", f"conv{i}", "bias")] = state[f"{base}.conv.bias"]
        if config.feat_extract_norm == "group" and i == 0:
            norm(f"{base}.layer_norm", ("feature_extractor", "gn"))
        elif config.feat_extract_norm == "layer":
            norm(f"{base}.layer_norm", ("feature_extractor", f"ln{i}"))

    if config.sew_style:
        # SEW: LayerNorm on the extractor output + a bare projection Linear
        # (only when conv_dim[-1] != hidden), plus the post-transformer
        # upsample projection
        norm("layer_norm", ("sew_extract_ln",))
        if "feature_projection.weight" in state:
            dense("feature_projection", ("fp_projection",))
        dense("encoder.upsample.projection", ("upsample_projection",))
    else:
        if config.feat_proj_layer_norm:
            norm("feature_projection.layer_norm", ("fp_layer_norm",))
        dense("feature_projection.projection", ("fp_projection",))

    if config.pos_conv_stack:
        # data2vec-audio: a stack of plain (un-normed) grouped convs
        for i in range(config.num_conv_pos_embeddings):
            base = f"encoder.pos_conv_embed.layers.{i}.conv"
            p[(f"pos_conv{i}", "kernel")] = _conv_t(state[f"{base}.weight"])
            p[(f"pos_conv{i}", "bias")] = state[f"{base}.bias"]
    else:
        pc = "encoder.pos_conv_embed.conv"
        if f"{pc}.weight_g" in state:
            g, v = state[f"{pc}.weight_g"], state[f"{pc}.weight_v"]
        else:
            g = state[f"{pc}.parametrizations.weight.original0"]
            v = state[f"{pc}.parametrizations.weight.original1"]
        p[("pos_conv", "kernel")] = _conv_t(_fold_weight_norm(np.asarray(g), np.asarray(v)))
        p[("pos_conv", "bias")] = state[f"{pc}.bias"]

    if config.rel_pos_buckets:
        # WavLM: the bucketed bias table lives on layer 0 only (later layers
        # reuse the computed bias); the flax encoder owns it at top level
        p[("rel_attn_embed",)] = state["encoder.layers.0.attention.rel_attn_embed.weight"]

    norm("encoder.layer_norm", ("enc_layer_norm",))
    for i in range(config.num_hidden_layers):
        base = f"encoder.layers.{i}"
        dst = (f"layer{i}",)
        # q/k/v concatenate into the encoder's fused qkv projection (one
        # (h, 3h) matmul; see models/wav2vec2.py _Attention)
        p[dst + ("attention", "qkv_proj", "kernel")] = np.ascontiguousarray(
            np.concatenate(
                [state[f"{base}.attention.{proj}.weight"].T for proj in ("q_proj", "k_proj", "v_proj")],
                axis=1,
            )
        )
        p[dst + ("attention", "qkv_proj", "bias")] = np.concatenate(
            [state[f"{base}.attention.{proj}.bias"] for proj in ("q_proj", "k_proj", "v_proj")]
        )
        dense(f"{base}.attention.out_proj", dst + ("attention", "out_proj"))
        if config.rel_pos_buckets:
            dense(f"{base}.attention.gru_rel_pos_linear", dst + ("attention", "gru_rel_pos_linear"))
            p[dst + ("attention", "gru_rel_pos_const")] = state[f"{base}.attention.gru_rel_pos_const"]
        norm(f"{base}.layer_norm", dst + ("layer_norm",))
        dense(f"{base}.feed_forward.intermediate_dense", dst + ("intermediate_dense",))
        dense(f"{base}.feed_forward.output_dense", dst + ("output_dense",))
        norm(f"{base}.final_layer_norm", dst + ("final_layer_norm",))
        if config.adapter_attn_dim and f"{base}.adapter_layer.norm.weight" in state:
            # MMS per-language attention adapter (Wav2Vec2AttnAdapterLayer)
            norm(f"{base}.adapter_layer.norm", dst + ("adapter_norm",))
            dense(f"{base}.adapter_layer.linear_1", dst + ("adapter_dense1",))
            dense(f"{base}.adapter_layer.linear_2", dst + ("adapter_dense2",))

    if config.add_adapter:
        # post-transformer conv adapter (Wav2Vec2Adapter): optional
        # down-projection + num_adapter_layers strided GLU convs
        if "adapter.proj.weight" in state:
            dense("adapter.proj", ("adapter_proj",))
            norm("adapter.proj_layer_norm", ("adapter_proj_ln",))
        for i in range(config.num_adapter_layers):
            p[(f"adapter_conv{i}", "kernel")] = _conv_t(state[f"adapter.layers.{i}.conv.weight"])
            p[(f"adapter_conv{i}", "bias")] = state[f"adapter.layers.{i}.conv.bias"]

    return flax.traverse_util.unflatten_dict(p)


def load_huggingface_checkpoint(model_name: str, **model_kwargs) -> CTCModule:
    """HF hub id (or local save_pretrained dir) -> ready CTCModule."""
    from transformers import AutoFeatureExtractor, AutoModelForCTC, AutoTokenizer

    model = AutoModelForCTC.from_pretrained(model_name, **model_kwargs)
    feature_extractor = AutoFeatureExtractor.from_pretrained(model_name)
    config = Wav2Vec2Config.from_hf(model.config)

    state = {k: v.detach().cpu().float().numpy() for k, v in model.base_model.state_dict().items()}
    mask_input = bool(getattr(feature_extractor, "return_attention_mask", False))
    # stop-gradient at the extractor output: functional form of the
    # unconditional freeze_feature_encoder() call in the reference adapter
    # (`huggingface/compatibility.py:27-28`).  Identity in forward; in
    # training it lets XLA drop the extractor backward entirely (measured
    # in docs/benchmarks.md).  ``frozen_paths`` below still masks the
    # optimizer so moments/weight-decay never touch the frozen leaves.
    encoder = Wav2Vec2Encoder(
        config=config, mask_input=mask_input, freeze_feature_extractor=True
    )

    text_transform = None
    decoder = None
    try:
        tokenizer = AutoTokenizer.from_pretrained(model_name)
        text_transform = tokenizer_to_transform(tokenizer)
        decoder = LinearDecoder(num_classes=text_transform.num_tokens, dropout=0.0)
    except (OSError, KeyError, TypeError, ValueError):
        # modern transformers raises TypeError/ValueError for a missing
        # tokenizer where older versions raised OSError
        warn(
            UserWarning(
                "Huggingface model is missing the tokenizer! decoder and "
                "text_transform were not initialized"
            )
        )

    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(mask_input=mask_input),
        encoder=encoder,
        decoder=decoder,
        text_transform=text_transform,
        encoder_final_dimension=encoder.final_dimension,
        sample_len=4000,
    )

    params = dict(module.variables["params"])
    params["encoder"] = hf_state_to_variables(state, config)
    if decoder is not None and hasattr(model, "lm_head"):
        lm_kernel = np.ascontiguousarray(model.lm_head.weight.detach().numpy().T)
        if lm_kernel.shape[-1] != text_transform.num_tokens:
            # fail loudly like the reference's strict load_state_dict
            # (`huggingface/compatibility.py:90`) instead of installing a
            # head misaligned with the tokenizer-derived vocabulary
            raise ValueError(
                f"lm_head emits {lm_kernel.shape[-1]} classes but the tokenizer "
                f"vocabulary has {text_transform.num_tokens}; refusing to "
                "install a misaligned CTC head"
            )
        params["decoder"] = {
            "dense": {
                "kernel": lm_kernel,
                "bias": model.lm_head.bias.detach().numpy(),
            }
        }
    variables = {"params": params}
    if "batch_stats" in module.variables:
        variables["batch_stats"] = module.variables["batch_stats"]
    module = module.with_variables(variables)
    # the reference adapter calls freeze_feature_encoder() on load
    # (`huggingface/compatibility.py:27-28`); the Trainer honors this
    # metadata by zeroing updates for the conv feature extractor
    module.frozen_paths = [("encoder", "feature_extractor")]
    return module
