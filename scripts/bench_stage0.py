"""wav2vec2 extractor stage 0 (conv k=10/s=5/cin=1 + instance-norm + gelu):
isolate where the ~7 ms goes and A/B formulations.

    python scripts/bench_stage0.py --batch 16 --seconds 15
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def timeit(fn, args, iters=8, loops=2):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out[:1, :1, :4].astype(jnp.float32)) if out.ndim == 3 else jnp.sum(out))
    best = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[:1, :1, :4].astype(jnp.float32)) if out.ndim == 3 else jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=15.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from thunder_tpu.models.wav2vec2 import gelu

    B = args.batch
    T = int(args.seconds * 16000)
    T = (T // 5) * 5  # exact multiple for the pairs view
    C = 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((10, 1, C)).astype(np.float32) * 0.1, jnp.bfloat16)
    gam = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    bet = jnp.asarray(rng.standard_normal(C).astype(np.float32))

    P = (T - 10) // 5 + 1

    @jax.jit
    def conv0_xla(x, w):
        return lax.conv_general_dilated(
            x[:, :, None].astype(jnp.bfloat16), w, (5,), [(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    @jax.jit
    def conv0_pairs(x, w):
        xr = x.reshape(B, T // 5, 5)
        pairs = jnp.concatenate([xr[:, :-1], xr[:, 1:]], axis=-1)  # (B, P, 10)
        wm = w[:, 0, :].astype(jnp.bfloat16)  # (10, C)
        return jnp.matmul(pairs.astype(jnp.bfloat16), wm, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def gn_gelu(y):
        xf = y.astype(jnp.float32)
        n = jnp.float32(y.shape[1])
        s1 = jnp.sum(xf, axis=1, keepdims=True)
        s2 = jnp.sum(xf * xf, axis=1, keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        a = gam * lax.rsqrt(var + 1e-5)
        b = bet - mean * a
        return gelu((xf * a + b).astype(jnp.bfloat16), jnp.bfloat16)

    @jax.jit
    def stage0_xla(x, w):
        return gn_gelu(conv0_xla.__wrapped__(x, w))

    @jax.jit
    def stage0_pairs(x, w):
        return gn_gelu(conv0_pairs.__wrapped__(x, w))

    y0 = conv0_pairs(x, w)

    @jax.jit
    def gn_only(y):
        return gn_gelu(y)

    for name, fn, fargs in [
        ("conv0_xla", conv0_xla, (x, w)),
        ("conv0_pairs_matmul", conv0_pairs, (x, w)),
        ("gn_gelu_only", gn_only, (y0,)),
        ("stage0_xla", stage0_xla, (x, w)),
        ("stage0_pairs", stage0_pairs, (x, w)),
    ]:
        try:
            ms = timeit(fn, fargs)
            print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)

    # numerics: pairs vs xla conv
    a = np.asarray(conv0_xla(x, w), np.float32)
    b = np.asarray(conv0_pairs(x, w), np.float32)
    print(json.dumps({"pairs_vs_xla_max_err": float(np.max(np.abs(a - b)))}), flush=True)


if __name__ == "__main__":
    main()
