"""Is int8 x int8 -> int32 dot_general actually ~2x bf16 on this chip?

Times the wav2vec2 FFN-up GEMM shape both ways plus the dynamic-quantize
overhead (per-row scale + round) that an int8-compute serving mode would pay.

    python scripts/bench_int8_matmul.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def slope(fn_chain, args, reps=(2, 8), iters=6):
    import jax.numpy as jnp

    res = {}
    for n in reps:
        out = fn_chain(*args, n=n)
        float(jnp.sum(out[:1, :4].astype(jnp.float32)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn_chain(*args, n=n)
            float(jnp.sum(out[:1, :4].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        res[n] = best / iters
    ns = sorted(res)
    return (res[ns[-1]] - res[ns[0]]) / (ns[-1] - ns[0]) * 1000


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    M, K, N = 12288, 768, 3072  # B=16 x T=768 tokens, FFN up
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16)
    w_bf = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05, jnp.bfloat16)
    w_q = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    w_scale = jnp.full((N,), 0.01, jnp.float32)
    flops = 2 * M * K * N

    @functools.partial(jax.jit, static_argnames=("n",))
    def bf16_chain(x, w, n):
        y = x
        for _ in range(n):
            y = jnp.dot(y, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)[:, :K] * (1 + 1e-6)
        return y

    @functools.partial(jax.jit, static_argnames=("n",))
    def int8_chain(x, w, ws, n):
        y = x
        for _ in range(n):
            s = jnp.max(jnp.abs(y), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
            yq = jnp.clip(jnp.round(y.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
            acc = lax.dot_general(
                yq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = (acc.astype(jnp.float32) * s * ws).astype(jnp.bfloat16)[:, :K] * (1 + 1e-6)
        return y

    @functools.partial(jax.jit, static_argnames=("n",))
    def int8_pure_chain(xq0, w, n):
        # pure int8 GEMM rate, no quantize overhead in the loop
        y = xq0
        for _ in range(n):
            acc = lax.dot_general(y, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            y = jnp.clip(acc[:, :K] >> 7, -127, 127).astype(jnp.int8)
        return y

    ms = slope(bf16_chain, (x, w_bf))
    print(json.dumps({"gemm": "bf16", "ms": round(ms, 3), "tflops": round(flops / ms / 1e9, 1)}), flush=True)
    ms = slope(int8_chain, (x, w_q, w_scale))
    print(json.dumps({"gemm": "int8_dynamic", "ms": round(ms, 3), "tflops": round(flops / ms / 1e9, 1)}), flush=True)
    xq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    ms = slope(int8_pure_chain, (xq, w_q))
    print(json.dumps({"gemm": "int8_pure", "ms": round(ms, 3), "tops": round(flops / ms / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
