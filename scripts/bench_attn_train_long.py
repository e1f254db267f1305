"""Backward q-block sweep for the one-panel train attention at long T.

The 30 s training point (T=1499 -> 1536 frames) runs the kernel backward at
bq=128 (the conservative VMEM cap for t > 1024); this sweeps block_q_bwd to
check whether larger q blocks fit and win at T=1536 — the per-qb f32 score
panels are (bq, T), so bq=256 roughly doubles live VMEM in the loop body.

    python scripts/bench_attn_train_long.py --batch 8 --frames 1536
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1536)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--block-q", type=int, default=256, help="forward q block")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thunder_tpu.kernels.attn_train import mha_train

    jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, T, H, dh = args.batch, args.frames, 12, 64
    h = H * dh
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * h)).astype(np.float32) * 0.1, jnp.bfloat16)
    lens = jnp.full((B,), T, jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)
    flops = 3 * (2 * 2 * T * T * h * B)  # fwd 2 + bwd 4 matmuls over (T,T,dh)*H

    def timed(bqb):
        def f(eps, qkv):
            qq = (qkv.astype(jnp.float32) * (1 + eps)).astype(qkv.dtype)

            def loss(qq):
                out = mha_train(
                    qq, lens, seed, H, args.dropout,
                    block_q=args.block_q, block_q_bwd=bqb,
                )
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-10

            g = jax.grad(loss)(qq)
            return jnp.vdot(g, g).astype(jnp.float32) * 1e-20

        jitted = jax.jit(f, static_argnums=())
        eps = jitted(np.float32(0.0), qkv)
        float(eps)
        best = float("inf")
        for _ in range(2):
            e = eps
            start = time.perf_counter()
            for i in range(args.iters):
                e = jitted(e * 1e-30 + np.float32(1e-6 * (i + 1)), qkv)
            float(e)
            best = min(best, (time.perf_counter() - start) / args.iters)
        return best * 1000

    for bqb in (128, 192, 256, 384, 512):
        if T % bqb:
            continue
        try:
            ms = timed(bqb)
            print(json.dumps({"block_q_bwd": bqb, "ms": round(ms, 3),
                              "tflops": round(flops / ms / 1e9, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"block_q_bwd": bqb, "error": str(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()
