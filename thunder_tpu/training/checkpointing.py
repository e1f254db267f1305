"""Orbax checkpoint save/restore for train state and modules.

The reference delegates training checkpoints to Lightning
(`SURVEY.md §5.4`); here orbax handles them: async-capable, sharding-aware
saves of ``{params, batch_stats, opt_state, step}``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "save_module",
    "restore_module_variables",
    "migrate_fused_qkv",
]


def migrate_fused_qkv(tree):
    """Fuse pre-round-2 wav2vec2 attention trees (separate q/k/v projections)
    into the current ``qkv_proj`` layout.  Returns ``(tree, changed)``.

    Applies to any nested dict level holding all three ``{q,k,v}_proj``
    subtrees — params and optimizer-moment trees alike (Adam's mu/nu mirror
    the param structure, so their kernels concatenate identically).
    """
    changed = False

    def walk(d):
        nonlocal changed
        if hasattr(d, "_fields"):  # namedtuple (optax states)
            return type(d)(*(walk(v) for v in d))
        if isinstance(d, (list, tuple)):
            seq = [walk(v) for v in d]
            return seq if isinstance(d, list) else tuple(seq)
        if not isinstance(d, dict):
            return d
        out = {k: walk(v) for k, v in d.items()}
        if {"q_proj", "k_proj", "v_proj"} <= set(out) and "qkv_proj" not in out:
            q, k, v = out.pop("q_proj"), out.pop("k_proj"), out.pop("v_proj")
            fused = {
                name: np.concatenate([np.asarray(q[name]), np.asarray(k[name]), np.asarray(v[name])], axis=-1)
                for name in q
                if name in k and name in v
            }
            out["qkv_proj"] = fused
            changed = True
        return out

    return walk(tree), changed


def _state_payload(state) -> dict:
    payload = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    if state.batch_stats is not None:
        payload["batch_stats"] = state.batch_stats
    return payload


def save_checkpoint(directory: str, state, step: Optional[int] = None):
    """Save a TrainState under ``directory/step_N``."""
    path = Path(directory).absolute() / f"step_{int(step if step is not None else state.step)}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _state_payload(state), force=True)
    return str(path)


def restore_checkpoint(path: str, target_state=None) -> Any:
    """Restore a payload dict (optionally matching a TrainState template).

    Checkpoints written before the fused-QKV change hold separate
    ``{q,k,v}_proj`` attention trees; when a templated restore fails on that
    structural mismatch the raw payload is migrated via
    :func:`migrate_fused_qkv` and re-shaped against the template.
    """
    with ocp.StandardCheckpointer() as ckptr:
        if target_state is None:
            return ckptr.restore(Path(path).absolute())
        try:
            return ckptr.restore(Path(path).absolute(), _state_payload(target_state))
        except Exception:
            raw = ckptr.restore(Path(path).absolute())
            migrated, changed = migrate_fused_qkv(raw)
            if not changed:
                raise
            return _graft(_state_payload(target_state), migrated)


def _graft(template, raw):
    """Re-shape a raw (dict/list) orbax restore onto a template's containers."""
    if isinstance(template, dict):
        return {k: _graft(template[k], raw[k]) for k in template}
    if hasattr(template, "_fields"):  # namedtuple (optax states)
        get = (lambda i, f: raw[f]) if isinstance(raw, dict) else (lambda i, f: raw[i])
        return type(template)(*(_graft(getattr(template, f), get(i, f)) for i, f in enumerate(template._fields)))
    if isinstance(template, (list, tuple)):
        if isinstance(raw, dict):  # orbax may key sequence items "0", "1", ...
            raw = [raw[str(i)] for i in range(len(template))]
        seq = [_graft(t, raw[i]) for i, t in enumerate(template)]
        return seq if isinstance(template, list) else type(template)(seq)
    return raw


def save_module(directory: str, module) -> str:
    """Save a CTCModule's variables (inference checkpoint)."""
    path = Path(directory).absolute() / "module"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, dict(module.variables), force=True)
    return str(path)


def restore_module_variables(path: str, module):
    """Load saved variables into an existing module structure.

    Pre-fusion wav2vec2 saves (separate q/k/v projections) are migrated to
    the fused ``qkv_proj`` layout on the fly (see :func:`migrate_fused_qkv`).
    """
    with ocp.StandardCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(Path(path).absolute(), dict(module.variables))
        except Exception:
            raw = ckptr.restore(Path(path).absolute())
            migrated, changed = migrate_fused_qkv(raw)
            if not changed:
                raise
            restored = _graft(dict(module.variables), migrated)
    return module.with_variables(restored)
