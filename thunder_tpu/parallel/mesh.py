"""Device mesh + sharding rules: the distribution story of the framework.

The reference delegates distribution entirely to Lightning DDP/NCCL
(`SURVEY.md §2c/§5.8`); here it is first-class and TPU-native:

- a ``(data, model)`` ``jax.sharding.Mesh`` over all devices (ICI within a
  slice; put ``data`` on the slower axis when spanning DCN);
- batches shard along ``data`` (pure DP parity with the reference), and
  parameters may additionally shard along ``model`` (tensor parallelism over
  the channel dimension — depthwise convs are elementwise in channels, and
  pointwise convs contract over them, so XLA/GSPMD inserts the one psum per
  block that TP requires);
- gradient all-reduce falls out of jit + sharded batch: no NCCL calls to
  port.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code runs across processes (SPMD).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "stacked_batch_sharding",
    "replicated",
    "param_shardings",
    "shard_variables",
    "DATA_AXIS",
    "MODEL_AXIS",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(model_parallel: int = 1, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over all (or given) devices: data axis x model axis.

    ``model_parallel`` devices form the model axis (fast ICI neighbors); the
    remainder is data-parallel.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 (batch) of a (steps, batch, ...) stack over the data axis
    — the layout Trainer(steps_per_execution=K) scan chunks use."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path, x, model_size: int, min_channels: int) -> P:
    """Channel-TP rule: shard the trailing (output-channel) dim when large.

    Conv kernels are (k, in/groups, out) and Dense kernels (in, out) — in both
    cases the last dim is the output channels, which is the natural TP axis
    for this model family.  Biases/BN vectors shard along their only dim.
    """
    if x.ndim == 0:
        return P()
    last = x.shape[-1]
    if model_size > 1 and last >= min_channels and last % model_size == 0:
        return P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
    return P()


def param_shardings(variables: Any, mesh: Mesh, min_channels: int = 256):
    """Pytree of NamedShardings for a variables dict under the channel-TP rule."""
    model_size = mesh.shape[MODEL_AXIS]

    def to_sharding(path, x):
        return NamedSharding(mesh, _spec_for_param(path, x, model_size, min_channels))

    return jax.tree_util.tree_map_with_path(to_sharding, variables)


def shard_variables(variables: Any, mesh: Mesh, min_channels: int = 256):
    """Place a variables pytree onto the mesh according to the TP rules."""
    shardings = param_shardings(variables, mesh, min_channels)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)
