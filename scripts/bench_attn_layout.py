"""Attention qkv/out layout shootout around the flash kernel.

jax's Pallas flash kernel wants (B, H, T, dh); the encoder's GEMMs want
(B*T, C).  The current path pays 4 explicit transposes per layer (~18 MB
each at B=16, T=768).  This measures whether XLA fuses the rearrangement
into the projection GEMMs when expressed as einsums with head-major
outputs/inputs instead.

    python scripts/bench_attn_layout.py --batch 16 --frames 768
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def slope(chain, args_, reps=(2, 10), iters=5):
    import jax.numpy as jnp

    res = {}
    for n in reps:
        out = chain(*args_, n=n)
        float(jnp.sum(out.reshape(-1)[:4].astype(jnp.float32)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = chain(*args_, n=n)
            float(jnp.sum(out.reshape(-1)[:4].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        res[n] = best / iters
    ns = sorted(res)
    return (res[ns[-1]] - res[ns[0]]) / (ns[-1] - ns[0]) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from thunder_tpu.models.wav2vec2 import _flash_mha

    B, T, H, heads = args.batch, args.frames, 768, 12
    dh = H // heads
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32) * 0.1, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.02, jnp.bfloat16)
    wout = jnp.asarray(rng.standard_normal((H, H)).astype(np.float32) * 0.02, jnp.bfloat16)
    key_mask = jnp.ones((B, T), bool)

    def mk(fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(x, n):
            y = x
            for _ in range(n):
                y = fn(y * (1 + 1e-6))
            return y
        return chain

    # current: 2D GEMM -> split -> (B,T,h,dh) -> _flash_mha transposes
    def current(y):
        qkv = (y.reshape(-1, H) @ wqkv).reshape(B, T, 3 * H)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q * (dh**-0.5)
        s = lambda t: t.reshape(B, T, heads, dh)
        o = _flash_mha(s(q), s(k), s(v), key_mask)
        return (o.reshape(-1, H) @ wout).reshape(B, T, H)

    # head-major einsum: GEMM output written directly as (3,B,heads,T,dh);
    # out_proj consumes (B,heads,T,dh) without an explicit transpose
    w5 = wqkv.reshape(H, 3, heads, dh)
    wo4 = wout.reshape(heads, dh, H)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    seg = jnp.zeros((B, T), jnp.int32)
    blocks = BlockSizes(
        block_q=256, block_k_major=T, block_k=T, block_b=8,
        block_q_major_dkv=256, block_k_major_dkv=T, block_k_dkv=T, block_q_dkv=256,
        block_k_major_dq=T, block_k_dq=T, block_q_dq=256,
    )

    def flash_bhtd(q, k, v):
        return flash_attention(q, k, v, segment_ids=SegmentIds(q=seg, kv=seg), sm_scale=1.0, block_sizes=blocks)

    def headmajor(y):
        qkv = jnp.einsum("btk,kshd->sbhtd", y, w5)  # (3, B, heads, T, dh)
        q = qkv[0] * (dh**-0.5)
        o = flash_bhtd(q, qkv[1], qkv[2])  # (B, heads, T, dh)
        return jnp.einsum("bhtd,hdk->btk", o, wo4)

    # hybrid: 2D qkv GEMM (fast M-fused GEMM) + single 5D reshape/transpose,
    # out side consumed head-major by einsum
    def hybrid(y):
        qkv = (y.reshape(-1, H) @ wqkv).reshape(B, T, 3, heads, dh)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # one transpose for all three
        q = qkv[0] * (dh**-0.5)
        o = flash_bhtd(q, qkv[1], qkv[2])
        return jnp.einsum("bhtd,hdk->btk", o, wo4)

    # hybrid2: like hybrid, but the out side transposes back to (B,T,H) and
    # uses the plain 2D GEMM — what a checkpoint-compatible _Dense keeps
    def hybrid2(y):
        qkv = (y.reshape(-1, H) @ wqkv).reshape(B, T, 3, heads, dh)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q = qkv[0] * (dh**-0.5)
        o = flash_bhtd(q, qkv[1], qkv[2])
        o = o.transpose(0, 2, 1, 3).reshape(-1, H)
        return (o @ wout).reshape(B, T, H)

    # one-panel Pallas kernel: q/k/v sliced straight out of the (B,T,3H)
    # GEMM output (zero splits/transposes), exact one-shot softmax
    from thunder_tpu.kernels.attn_onepanel import mha_from_qkv

    lens = jnp.full((B,), T, jnp.int32)

    def mk_onepanel(bq):
        def onepanel(y):
            qkv = (y.reshape(-1, H) @ wqkv).reshape(B, T, 3 * H)
            o = mha_from_qkv(qkv, lens, heads=heads, block_q=bq)
            return (o.reshape(-1, H) @ wout).reshape(B, T, H)

        return onepanel

    cases = [("current", current), ("headmajor", headmajor), ("hybrid", hybrid), ("hybrid2", hybrid2)]
    cases += [(f"onepanel_bq{bq}", mk_onepanel(bq)) for bq in (256, 512, 768)]
    for name, fn in cases:
        try:
            ms = slope(mk(fn), (x,))
            print(json.dumps({"case": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
