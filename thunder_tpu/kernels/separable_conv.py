"""Fused time-channel-separable conv block kernel (inference fast path).

QuartzNet/Citrinet spend ~80% of inference in repeats of

    depthwise conv(k) -> pointwise conv(1x1) -> batchnorm -> relu

(`/root/reference/src/thunder/quartznet/blocks.py:185-228`).  XLA runs the
depthwise conv on the VPU and round-trips each intermediate through HBM.
This kernel computes one whole repeat per (batch, 128-frame) tile in VMEM:

    DMA x tile + (k-1) halo  ->  depthwise as k shifted multiply-adds (VPU)
      -> pointwise matmul (MXU, f32 accumulate)
      -> folded-BN scale/bias + optional ReLU (VPU epilogue)

Batchnorm is pre-folded into the pointwise kernel's output scale/bias by the
caller (inference only — the training path keeps the standard flax ops).

Constraints: stride 1, dilation 1, same padding, channels % 128 == 0 — i.e.
every body repeat of QuartzNet 5x5/15x5 and Citrinet; the strided/dilated
stem and tail blocks stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_separable_conv"]

T_TILE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(tile_ref, dw_ref, pw_ref, scale_ref, bias_ref, out_ref, *, k, relu, out_dtype):
    # depthwise: k shifted multiply-accumulates over the (T_TILE, C) window
    acc = tile_ref[0, 0, 0:T_TILE, :] * dw_ref[0, :]
    for j in range(1, k):
        acc = acc + tile_ref[0, 0, j : j + T_TILE, :] * dw_ref[j, :]

    # pointwise matmul with f32 accumulation, then folded BN + ReLU epilogue
    y = jnp.dot(acc, pw_ref[:, :], preferred_element_type=jnp.float32)
    y = y * scale_ref[0, :] + bias_ref[0, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0, :, :] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("kernel_size", "relu", "interpret"))
def fused_separable_conv(
    x: jax.Array,
    dw_kernel: jax.Array,
    pw_kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    kernel_size: int,
    relu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """One separable conv repeat, BN pre-folded.

    Args:
        x: ``(batch, time, channels)`` (pre-masked by the caller).
        dw_kernel: ``(kernel_size, channels)`` depthwise taps.
        pw_kernel: ``(channels, out_channels)`` pointwise weights (already
            multiplied by the folded BN scale if desired — ``scale`` then 1s).
        scale, bias: ``(out_channels,)`` output affine (folded batchnorm).
        kernel_size: depthwise width (odd; same padding k//2).

    Returns:
        ``(batch, time, out_channels)`` in ``x.dtype``.
    """
    batch, time, channels = x.shape
    k = kernel_size
    pad = k // 2
    out_channels = pw_kernel.shape[-1]
    time_padded = _round_up(time, T_TILE)
    halo_rows = T_TILE + k - 1

    # left same-padding + right padding to cover the last tile's halo
    right = (time_padded - time) + (halo_rows - T_TILE) - pad
    xp = jnp.pad(x, ((0, 0), (pad, max(right, 0)), (0, 0)))

    # materialize overlapping tiles so pallas double-buffers the input
    # (manual in-kernel DMA serializes compute behind copies)
    n_tiles = time_padded // T_TILE
    tiles = jnp.stack(
        [xp[:, i * T_TILE : i * T_TILE + halo_rows, :] for i in range(n_tiles)], axis=1
    )  # (B, n_tiles, halo_rows, C)

    dw = dw_kernel.astype(x.dtype)
    pw = pw_kernel.astype(x.dtype)
    scale = scale.astype(jnp.float32).reshape(1, -1)
    bias = bias.astype(jnp.float32).reshape(1, -1)

    grid = (batch, n_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, relu=relu, out_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((batch, time_padded, out_channels), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, halo_rows, channels), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, channels), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, out_channels), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_channels), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_channels), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_TILE, out_channels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tiles, dw, pw, scale, bias)
    return out[:, :time, :]
