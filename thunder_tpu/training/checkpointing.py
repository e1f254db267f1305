"""Orbax checkpoint save/restore for train state and modules.

The reference delegates training checkpoints to Lightning
(`SURVEY.md §5.4`); here orbax handles them: async-capable, sharding-aware
saves of ``{params, batch_stats, opt_state, step}``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "save_module", "restore_module_variables"]


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
    """Restore a payload dict (optionally matching a TrainState template)."""
    with ocp.StandardCheckpointer() as ckptr:
        if target_state is not None:
            return ckptr.restore(Path(path).absolute(), _state_payload(target_state))
        return ckptr.restore(Path(path).absolute())


def save_module(directory: str, module) -> str:
    """Save a CTCModule's variables (inference checkpoint)."""
    path = Path(directory).absolute() / "module"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, dict(module.variables), force=True)
    return str(path)


def restore_module_variables(path: str, module):
    """Load saved variables into an existing module structure."""
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(Path(path).absolute(), dict(module.variables))
    return module.with_variables(restored)
