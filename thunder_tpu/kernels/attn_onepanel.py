"""One-panel MHA Pallas kernel reading q/k/v straight from the fused qkv GEMM.

Serving attention for wav2vec2-style encoders (reference reaches this through
HF ``AutoModelForCTC`` — `/root/reference/src/thunder/huggingface/
compatibility.py:65-112`).  Design, from the v5e measurements in
docs/benchmarks.md and scripts/bench_attn_layout.py:

- The (h, 3h) qkv projection writes ``(B, T, 3H)``; jax's flash kernel wants
  ``(B, H, T, dh)``, and the split + 3 pads + 4 transposes around it cost
  ~0.5 ms/layer at (B=16, T=768) — more than the attention math itself.
- This kernel instead BlockSpec-slices q/k/v panels directly out of the
  ``(B, T, 3H)`` GEMM output and writes ``(B, T, H)`` the same way: the
  layout work disappears into the kernel's DMAs.
- Mosaic requires block last dims of 128, but dh is 64 for every wav2vec2/
  HuBERT family member.  So each grid step processes a *pair* of adjacent
  heads as one 128-lane panel and separates them by lane masking: scores are
  ``s_lo = q @ (k·lane<64)^T`` and ``s_hi = q @ (k·lane>=64)^T`` (the masked
  half contributes zero), and the two PV products recombine with a lane
  select.  This costs no extra MXU time — a dh=64 contraction half-idles the
  128-wide systolic array, so two full-width matmuls take the cycles two
  half-width ones would.
- Serving masks are contiguous valid-prefix masks, so instead of streaming
  flash (running max + renormalize) the whole key panel sits in VMEM
  (``(T, 128)`` bf16 = 384 KB at T=1536) and softmax is exact in one shot.
  Valid while ``2 * bq * T * 4`` f32 score bytes fit VMEM — true through
  minutes of audio; callers fall back to flash beyond that.

Numerics match the unfused bf16 path: bf16 q (pre-scaled) x bf16 k with f32
accumulation, f32 softmax, bf16 probs x bf16 v with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mha_from_qkv"]


def _kernel_pair(lens_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale, t):
    b = pl.program_id(0)
    q = q_ref[0] * jnp.bfloat16(sm_scale)  # (bq, 128) = heads (2h, 2h+1)
    k = k_ref[0]  # (T, 128)
    v = v_ref[0]  # (T, 128)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k_lo = jnp.where(lane_k < 64, k, jnp.zeros_like(k))
    k_hi = jnp.where(lane_k >= 64, k, jnp.zeros_like(k))
    dot_nt = lambda a, bm: jax.lax.dot_general(
        a, bm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_lo = dot_nt(q, k_lo)  # (bq, T) head 2h scores (hi lanes of k are zero)
    s_hi = dot_nt(q, k_hi)  # head 2h+1
    # one additive length mask shared by both heads (cheaper than two
    # compare+selects over the (bq, T) score panels)
    addmask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) < lens_ref[b],
        jnp.zeros((1, t), jnp.float32),
        jnp.full((1, t), jnp.finfo(jnp.float32).min),
    )

    def expm(s):
        s = s + addmask
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        # division deferred to the (bq, 128) output: saves a (bq, T)-wide
        # divide per head (the dominant VPU cost at full-panel softmax)
        return p.astype(jnp.bfloat16), jnp.sum(p, axis=1, keepdims=True)

    dot_nn = lambda a, bm: jax.lax.dot_general(
        a, bm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    p_lo, z_lo = expm(s_lo)
    p_hi, z_hi = expm(s_hi)
    o_lo = dot_nn(p_lo, v) / z_lo  # lanes <64 valid (head 2h)
    o_hi = dot_nn(p_hi, v) / z_hi  # lanes >=64 valid (head 2h+1)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, o_lo.shape, 1)
    o_ref[0] = jnp.where(lane_o < 64, o_lo, o_hi).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "interpret"))
def mha_from_qkv(
    qkv: jax.Array,
    lengths: jax.Array,
    heads: int,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention over a packed ``(B, T, 3H)`` qkv tensor.

    ``qkv``: bf16, the fused projection output laid out ``[q | k | v]`` on the
    last axis (each ``H = heads * dh`` wide, head-major within each third —
    exactly what ``_Dense(3h)`` produces).  ``lengths``: int32 ``(B,)`` valid
    key counts (contiguous prefix). Query scaling (``dh**-0.5``) happens
    inside the kernel.  Returns ``(B, T, H)`` bf16.

    Requires dh == 64 (every wav2vec2/HuBERT/WavLM family member) and an even
    head count; T must be a multiple of 128 (callers hoist the frame pad —
    see ``Wav2Vec2Encoder.__call__``).  Padded queries attend uniformly over
    the masked panel and are sliced/masked downstream like every other pad.
    """
    b, t, h3 = qkv.shape
    h = h3 // 3
    dh = h // heads
    if dh != 64 or heads % 2:
        raise ValueError(f"mha_from_qkv requires dh==64 and even heads, got dh={dh}, heads={heads}")
    if t % 128:
        raise ValueError(f"T={t} must be a multiple of 128 (hoist the frame pad)")
    bq = min(block_q, t)
    while t % bq:
        bq //= 2
    pairs = heads // 2
    grid = (b, pairs, t // bq)
    kernel = functools.partial(_kernel_pair, sm_scale=dh**-0.5, t=t)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # last-axis block index is in units of 128 lanes = head pairs:
                # q pairs start at 0, k at H (= pairs blocks), v at 2H
                pl.BlockSpec((1, bq, 128), lambda b, hp, tq, lens: (b, tq, hp)),
                pl.BlockSpec((1, t, 128), lambda b, hp, tq, lens: (b, 0, pairs + hp)),
                pl.BlockSpec((1, t, 128), lambda b, hp, tq, lens: (b, 0, 2 * pairs + hp)),
            ],
            out_specs=pl.BlockSpec((1, bq, 128), lambda b, hp, tq, lens: (b, tq, hp)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qkv, qkv, qkv)
