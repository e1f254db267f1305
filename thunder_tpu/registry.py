"""Unified checkpoint registry + ``load_pretrained``.

API parity with `/root/reference/src/thunder/registry.py:25-66`:

- every member of a checkpoint enum registers a loader partial;
- ``load_pretrained(name)`` dispatches: names containing "/" go to the
  HuggingFace loader, everything else through the registry.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Callable, Dict, Type, Union

from thunder_tpu.compat.nemo import (
    CitrinetCheckpoint,
    QuartznetCheckpoint,
    load_citrinet_checkpoint,
    load_quartznet_checkpoint,
)
from thunder_tpu.module import CTCModule
from thunder_tpu.utils import BaseCheckpoint

__all__ = ["CHECKPOINT_REGISTRY", "register_checkpoint_enum", "load_pretrained"]

CHECKPOINT_LOAD_FUNC_TYPE = Callable[..., CTCModule]

CHECKPOINT_REGISTRY: Dict[str, CHECKPOINT_LOAD_FUNC_TYPE] = {}


def register_checkpoint_enum(checkpoints: Type[BaseCheckpoint], load_function: CHECKPOINT_LOAD_FUNC_TYPE):
    """Register every member of a checkpoint enum with its loading function."""
    for checkpoint in checkpoints:
        CHECKPOINT_REGISTRY[checkpoint.name] = partial(load_function, checkpoint)


register_checkpoint_enum(QuartznetCheckpoint, load_quartznet_checkpoint)
register_checkpoint_enum(CitrinetCheckpoint, load_citrinet_checkpoint)


def load_pretrained(checkpoint_name: Union[str, BaseCheckpoint], **load_kwargs) -> CTCModule:
    """Load any checkpoint: registry name, local ``.nemo`` path, or HF id.

    Dispatch: local ``.nemo`` files go to the NeMo loaders (Citrinet when the
    archive ships a sentencepiece model, QuartzNet otherwise); names with "/"
    go to HuggingFace (hub id or local ``save_pretrained`` dir); everything
    else through the registry (reference semantics, `registry.py:47-66`).
    """
    if isinstance(checkpoint_name, BaseCheckpoint):
        checkpoint_name = checkpoint_name.name
    name = str(checkpoint_name)
    if name.endswith(".nemo"):
        if not Path(name).exists():
            raise FileNotFoundError(f"checkpoint file not found: {name}")
        import tarfile

        with tarfile.open(name) as tar:
            has_tokenizer = any(member.endswith(".model") for member in tar.getnames())
        if has_tokenizer:
            return load_citrinet_checkpoint(name, **load_kwargs)
        return load_quartznet_checkpoint(name, **load_kwargs)
    if "/" in name:
        from thunder_tpu.compat.hf import load_huggingface_checkpoint

        return load_huggingface_checkpoint(name, **load_kwargs)
    return CHECKPOINT_REGISTRY[name](**load_kwargs)
