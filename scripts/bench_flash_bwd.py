"""Flash-attention BACKWARD block-size sweep at wav2vec2 train shapes.

The fwd blocks were tuned in round 3 (bq=256, bb=8 at T=768); the bwd blocks
were simply mirrored from them.  This sweeps the dkv/dq block sizes
independently and also times the unfused bf16 attention fwd+bwd for
comparison, all with chain-dependency timing (best of 2 chains).

    python scripts/bench_flash_bwd.py --batch 16 --frames 768
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=768)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, T, H, dh = args.batch, args.frames, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.1, jnp.bfloat16)
    seg = jnp.zeros((B, T), jnp.int32)
    # fwd+bwd model flops: fwd 2 matmuls + bwd 4 matmuls over (T, T, dh)
    flops = 3 * (2 * 2 * T * T * H * dh * B)

    def chain_time(fn):
        # q/k/v passed as ARGUMENTS (closure-captured tensors are baked into
        # the uploaded HLO — ~56 MB of MLIR constants crashes the remote
        # compile helper); iterations chained through eps, best of 2 chains
        jitted = jax.jit(fn)
        eps = jitted(np.float32(0.0), q, k, v)
        float(eps)
        best = float("inf")
        for _ in range(2):
            e = eps
            start = time.perf_counter()
            for i in range(args.iters):
                e = jitted(e * 1e-30 + np.float32(1e-6 * (i + 1)), q, k, v)
            float(e)
            best = min(best, (time.perf_counter() - start) / args.iters)
        return best * 1000

    def flash_loss(blocks):
        def f(eps, q, k, v):
            # keep bf16: a raw f32 eps would promote qq to f32 and change
            # the kernel's input dtype (VMEM doubles; Mosaic fails)
            qq = (q.astype(jnp.float32) * (1 + eps)).astype(q.dtype)

            def loss(qq, k, v):
                out = flash_attention(
                    qq, k, v, segment_ids=SegmentIds(q=seg, kv=seg),
                    sm_scale=1.0, block_sizes=blocks,
                )
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-10

            g = jax.grad(loss, argnums=(0, 1, 2))(qq, k, v)
            return sum(jnp.vdot(x, x).astype(jnp.float32) for x in g) * 1e-20

        return f

    def unfused(eps, q, k, v):
        qq = (q.astype(jnp.float32) * (1 + eps)).astype(q.dtype)

        def loss(qq, k, v):
            scores = jnp.einsum("bhqd,bhkd->bhqk", qq, k, preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-10

        g = jax.grad(loss, argnums=(0, 1, 2))(qq, k, v)
        return sum(jnp.vdot(x, x).astype(jnp.float32) for x in g) * 1e-20

    ms = chain_time(unfused)
    print(json.dumps({"config": "unfused_bf16", "ms": round(ms, 3),
                      "tflops": round(flops / ms / 1e9, 1)}), flush=True)

    # (fwd bq, fwd bb, dkv q, dkv k, dq q, dq k) — k blocks use
    # block_k_major = T with block_k = the swept value
    combos = [
        (256, 8, 256, 768, 256, 768),   # the in-model mirrored config
        (256, 8, 128, 768, 128, 768),
        (256, 8, 768, 768, 768, 768),
        (256, 8, 256, 256, 256, 256),
        (256, 8, 128, 128, 128, 128),
        (256, 8, 384, 768, 384, 768),
    ]
    for bq, bb, qdkv, kdkv, qdq, kdq in combos:
        try:
            blocks = BlockSizes(
                block_q=bq, block_k_major=T, block_k=T, block_b=bb,
                block_q_major_dkv=qdkv, block_k_major_dkv=T,
                block_k_dkv=kdkv, block_q_dkv=qdkv,
                block_k_major_dq=T, block_k_dq=kdq, block_q_dq=qdq,
            )
            ms = chain_time(flash_loss(blocks))
            print(json.dumps({
                "config": f"bq{bq}bb{bb}_dkv{qdkv}x{kdkv}_dq{qdq}x{kdq}",
                "ms": round(ms, 3),
                "tflops": round(flops / ms / 1e9, 1),
            }), flush=True)
        except Exception as e:  # Mosaic VMEM failures etc.
            print(json.dumps({"config": f"bq{bq}bb{bb}_dkv{qdkv}x{kdkv}_dq{qdq}x{kdq}",
                              "error": str(e)[:1200]}), flush=True)


if __name__ == "__main__":
    main()
