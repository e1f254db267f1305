"""Time-major fused separable-conv repeat kernel (inference fast path, v2).

One QuartzNet/Citrinet repeat is ``depthwise conv(k) -> pointwise 1x1 ->
folded-BN scale/bias -> ReLU -> zero-beyond-length mask``
(`/root/reference/src/thunder/quartznet/blocks.py:185-228` plus the
MaskedConv1d contract of `blocks.py:93-182`).  Measured on v5e, XLA runs the
depthwise conv on the VPU at ~55% efficiency and spends separate HBM passes
on the matmul epilogue and the mask (ablation: ~38 ms of a 58 ms
QuartzNet15x5 batch in the depthwise emitter alone).

This kernel computes the whole repeat in one pass over **time-major**
activations ``(T, B, C)``.  Measured outcome (v5e, B=64, T=768): it *ties*
XLA's emitter (e.g. 1.02 vs 1.00 ms at C=512/k=75 — both ~50% of VPU peak;
Mosaic emits separate multiply/add per tap, same as XLA), so the engine keeps
the XLA conv path and instead fuses the epilogue+mask there.  The kernel is
kept as the measured reference point for the depthwise design space — the
batched-matmul (Toeplitz/MXU) alternative benches at 3.5 TFLOPS under
Mosaic's batched ``dot_general`` and is a dead end.  Design:

- time tiles stream through a 3-tile VMEM shift register (manual DMA, so
  input HBM traffic stays 1x and halo reads are VMEM-local);
- with time as the *major* dimension, the k shifted reads of the depthwise
  conv are tile-aligned (no sublane rotations — the failure mode of the
  earlier (B, T, C) kernel in ``separable_conv.py``);
- the pointwise conv is an MXU matmul over the VMEM-resident depthwise
  output, f32 accumulation;
- folded-BN scale/bias, optional ReLU, and the zero-beyond-``lengths`` mask
  run as the epilogue before a single output DMA.

Contract: ``T`` is padded to a multiple of ``T_TILE`` (128); rows beyond each
sample's length are zero on input (the engine maintains this invariant) and
are written back as exact zeros.  Stride/dilation other than 1 stay on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_repeat_tm", "T_TILE"]

T_TILE = 128
_LANE = 128


def _kernel(
    mask_ref,  # (T_pad, B_BLK, 1) compute-dtype 0/1 mask block, VMEM
    x_hbm,  # (T_pad, B, C_in) HBM
    dw_f32_ref,  # (1, k*C_in) f32 VMEM (flat, lane-sliceable per tap)
    pw_ref,  # (C_in, C_out) VMEM
    scale_ref,  # (1, C_out) f32 VMEM
    bias_ref,  # (1, C_out) f32 VMEM
    out_hbm,  # (T_pad, B, C_out) HBM
    xx,  # scratch (3*T_TILE, B_BLK, C_in) f32 VMEM shift register
    stage,  # scratch (T_TILE, B_BLK, C_in) compute-dtype DMA landing slot
    out_buf,  # scratch (T_TILE, B_BLK, C_out) compute dtype VMEM
    in_sem,
    out_sem,
    *,
    k: int,
    relu: bool,
    b_blk: int,
    n_tiles: int,
    out_dtype,
):
    pad = k // 2
    b0 = pl.program_id(0) * b_blk
    c_in = xx.shape[-1]
    c_out = out_buf.shape[-1]

    def in_dma(tile_idx):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile_idx * T_TILE, T_TILE), pl.ds(b0, b_blk), :],
            stage,
            in_sem,
        )

    def load_tile(tile_idx, slot):
        in_dma(tile_idx).start()
        in_dma(tile_idx).wait()
        # convert once on load: the tap loop then runs pure-f32 FMAs instead
        # of paying a bf16->f32 upconvert per tap
        xx[pl.ds(slot * T_TILE, T_TILE), :, :] = stage[:, :, :].astype(jnp.float32)

    def out_dma(tile_idx):
        return pltpu.make_async_copy(
            out_buf,
            out_hbm.at[pl.ds(tile_idx * T_TILE, T_TILE), pl.ds(b0, b_blk), :],
            out_sem,
        )

    # prologue: xx = [zeros (tile -1) | tile 0 | tile 1-or-zeros]
    xx[pl.ds(0, T_TILE), :, :] = jnp.zeros((T_TILE, b_blk, c_in), jnp.float32)
    load_tile(0, 1)
    if n_tiles > 1:
        load_tile(1, 2)
    else:
        xx[pl.ds(2 * T_TILE, T_TILE), :, :] = jnp.zeros((T_TILE, b_blk, c_in), jnp.float32)

    def step(n, _):
        # compute tile n from xx rows [T_TILE - pad, 2*T_TILE + pad)
        base = T_TILE - pad
        acc = jnp.zeros((T_TILE * b_blk, c_out), jnp.float32)
        for ci in range(c_in // _LANE):
            cs = ci * _LANE
            dw_acc = jnp.zeros((T_TILE, b_blk, _LANE), jnp.float32)
            for j in range(k):
                tap = xx[pl.ds(base + j, T_TILE), :, pl.ds(cs, _LANE)]
                w = dw_f32_ref[0, pl.ds(j * c_in + cs, _LANE)].reshape(1, 1, _LANE)
                dw_acc += tap * w
            acc += jax.lax.dot_general(
                dw_acc.astype(out_dtype).reshape(T_TILE * b_blk, _LANE),
                pw_ref[pl.ds(cs, _LANE), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y = acc * scale_ref[0, :] + bias_ref[0, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        y = y.reshape(T_TILE, b_blk, c_out)
        m = mask_ref[pl.ds(n * T_TILE, T_TILE), :, :].astype(jnp.float32)
        y = y * m

        @pl.when(n > 0)
        def _():
            out_dma(n - 1).wait()  # out_buf free again

        out_buf[:, :, :] = y.astype(out_dtype)
        out_dma(n).start()

        # advance the shift register: xx <- tiles [n, n+1, n+2]
        @pl.when(n + 1 < n_tiles)
        def _():
            # two non-overlapping copies (an overlapped 2-tile move would
            # depend on Mosaic's copy order)
            xx[pl.ds(0, T_TILE), :, :] = xx[pl.ds(T_TILE, T_TILE), :, :]
            xx[pl.ds(T_TILE, T_TILE), :, :] = xx[pl.ds(2 * T_TILE, T_TILE), :, :]

            @pl.when(n + 2 < n_tiles)
            def _():
                load_tile(n + 2, 2)

            @pl.when(n + 2 >= n_tiles)
            def _():
                xx[pl.ds(2 * T_TILE, T_TILE), :, :] = jnp.zeros(
                    (T_TILE, b_blk, c_in), jnp.float32
                )

        return 0

    jax.lax.fori_loop(0, n_tiles, step, 0, unroll=False)
    out_dma(n_tiles - 1).wait()


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "relu", "b_blk", "interpret")
)
def fused_repeat_tm(
    x: jax.Array,
    lengths: jax.Array,
    dw_kernel: jax.Array,
    pw_kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    kernel_size: int,
    relu: bool = True,
    b_blk: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """One separable repeat over time-major activations, BN pre-folded.

    Args:
        x: ``(T_pad, B, C_in)`` with ``T_pad % 128 == 0``, zero beyond
            ``lengths`` per sample.
        lengths: ``(B,)`` int32 valid frame counts.
        dw_kernel: ``(k, C_in)`` depthwise taps.
        pw_kernel: ``(C_in, C_out)`` pointwise weights (BN scale pre-folded).
        scale, bias: ``(C_out,)`` f32 output affine (folded batchnorm).
        kernel_size: odd depthwise width; stride/dilation must be 1.
        b_blk: batch tile (B % b_blk == 0; 16 matches the bf16 sublane tile).

    Returns:
        ``(T_pad, B, C_out)`` in ``x.dtype``, zero beyond ``lengths``.
    """
    t_pad, batch, c_in = x.shape
    c_out = pw_kernel.shape[-1]
    k = kernel_size
    if t_pad % T_TILE:
        raise ValueError(f"T ({t_pad}) must be a multiple of {T_TILE}")
    if batch % b_blk:
        raise ValueError(f"B ({batch}) must be a multiple of b_blk ({b_blk})")
    if c_in % _LANE or c_out % _LANE:
        raise ValueError("channels must be multiples of 128")
    if k // 2 >= T_TILE:
        raise ValueError("kernel_size too large for the 3-tile window")
    n_tiles = t_pad // T_TILE

    from thunder_tpu.ops.masking import lengths_to_mask

    mask = lengths_to_mask(lengths, t_pad).T[:, :, None].astype(x.dtype)
    dw = dw_kernel.astype(jnp.float32).reshape(1, k * c_in)
    pw = pw_kernel.astype(x.dtype)
    scale2d = scale.astype(jnp.float32).reshape(1, c_out)
    bias2d = bias.astype(jnp.float32).reshape(1, c_out)

    grid = (batch // b_blk,)
    kernel = functools.partial(
        _kernel,
        k=k,
        relu=relu,
        b_blk=b_blk,
        n_tiles=n_tiles,
        out_dtype=x.dtype,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, c_out), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_pad, b_blk, 1), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, k * c_in), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((3 * T_TILE, b_blk, c_in), jnp.float32),
            pltpu.VMEM((T_TILE, b_blk, c_in), x.dtype),
            pltpu.VMEM((T_TILE, b_blk, c_out), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mask, x, dw, pw, scale2d, bias2d)
