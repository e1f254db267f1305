"""Finetune module: load any registered checkpoint, optionally swap the head.

Behavioral parity with the reference ``FinetuneCTCModule``
(`/root/reference/src/thunder/finetune.py:19-88`):

- loads the base checkpoint through the registry;
- ``tokens`` + ``decoder_builder`` must be given together (same two
  ValueErrors);
- with new tokens, a fresh text transform is built and a new decoder head is
  created as ``decoder_builder(num_classes=...)`` over the encoder's final
  dimension, while encoder/frontend weights are kept;
- hyperparameters are recorded on the module for checkpoint reconstruction
  (the reference's ``save_hyperparameters``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax

from thunder_tpu.module import CTCModule
from thunder_tpu.registry import load_pretrained
from thunder_tpu.text.transform import BatchTextTransformer

__all__ = ["finetune_ctc_module"]


def finetune_ctc_module(
    checkpoint_name: str,
    checkpoint_kwargs: Optional[Dict[str, Any]] = None,
    decoder_builder: Optional[Callable] = None,
    decoder_kwargs: Optional[Dict[str, Any]] = None,
    tokens: Optional[List[str]] = None,
    text_kwargs: Optional[Dict[str, Any]] = None,
    seed: int = 0,
) -> CTCModule:
    """Build a finetuning-ready CTCModule from a pretrained checkpoint."""
    checkpoint_kwargs = checkpoint_kwargs or {}
    decoder_kwargs = decoder_kwargs or {}
    text_kwargs = text_kwargs or {}

    if tokens is not None and decoder_builder is None:
        raise ValueError(
            "New tokens were specified, but the module also needs to know the "
            "decoder class to initialize properly."
        )
    if tokens is None and decoder_builder is not None:
        raise ValueError(
            "A new decoder was specified, but the module also needs to know the "
            "tokens to initialize properly."
        )

    base = load_pretrained(checkpoint_name, **checkpoint_kwargs)
    if tokens is None:
        module = base
    else:
        text_transform = BatchTextTransformer(tokens, **text_kwargs)
        decoder = decoder_builder(num_classes=text_transform.num_tokens, **decoder_kwargs)
        fresh = CTCModule.create(
            jax.random.PRNGKey(seed),
            audio_transform=base.model.audio_transform,
            encoder=base.model.encoder,
            decoder=decoder,
            text_transform=text_transform,
            encoder_final_dimension=base.encoder_final_dimension,
            sample_len=4000,
        )
        # keep pretrained encoder (params + running stats); fresh decoder head
        variables = {
            "params": dict(fresh.variables["params"], encoder=base.variables["params"]["encoder"]),
        }
        if "batch_stats" in base.variables:
            variables["batch_stats"] = base.variables["batch_stats"]
        module = fresh.with_variables(variables)
        if getattr(base, "frozen_paths", None):
            module.frozen_paths = base.frozen_paths
    module.hparams = {
        "checkpoint_name": checkpoint_name,
        "checkpoint_kwargs": checkpoint_kwargs,
        "tokens": tokens,
        "decoder_kwargs": decoder_kwargs,
        "text_kwargs": text_kwargs,
    }
    return module
