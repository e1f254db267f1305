"""Flash-attention block-size sweep at a given (batch, frames).

    python scripts/bench_flash_blocks.py --batch 16 --frames 768
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
    ap.add_argument("--bb-sweep", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    B, T, H, dh = args.batch, args.frames, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.1, jnp.bfloat16)
    seg = jnp.zeros((B, T), jnp.int32)
    flops = 2 * 2 * T * T * H * dh * B

    def run_with(bq, bk, bb):
        blocks = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
        )

        import functools

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(q, k, v, n):
            y = q
            for _ in range(n):
                y = flash_attention(
                    y * (1 + 1e-6), k, v,
                    segment_ids=SegmentIds(q=seg, kv=seg), sm_scale=1.0, block_sizes=blocks,
                )
            return jnp.sum(y[:1, :1, :1, :4].astype(jnp.float32))

        res = {}
        for n in (2, 8):
            float(chain(q, k, v, n=n))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(5):
                    out = chain(q, k, v, n=n)
                float(out)
                best = min(best, time.perf_counter() - t0)
            res[n] = best / 5
        return (res[8] - res[2]) / 6 * 1000

    combos = []
    if args.bb_sweep:
        for bq in (256, 384, 512, 768, 1536):
            for bb in (2, 4, 8):
                if T % bq == 0 and args.batch % bb == 0:
                    combos.append((bq, T, bb))
        if T % 512 == 0:
            combos.append((512, T, 1))
        if T % 384 == 0:
            combos.append((384, T, 1))
    else:
        for bq in (128, 256, 384, 768):
            for bk in (128, 256, 384, 768):
                if T % bq == 0 and T % bk == 0:
                    combos.append((bq, bk, 1))
        if T % 384 == 0:
            combos.append((384, 768, 2))
    for bq, bk, bb in combos:
        try:
            ms = run_with(bq, bk, bb)
            print(json.dumps({"bq": bq, "bk": bk, "bb": bb, "ms": round(ms, 3), "tflops": round(flops / ms / 1e9, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"bq": bq, "bk": bk, "bb": bb, "error": repr(e)[:150]}), flush=True)


if __name__ == "__main__":
    main()
