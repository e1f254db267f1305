"""Stage-0 round 2: conv0 and instance-norm formulations that avoid f32
materialization and the cin=1 emitter.

    python scripts/bench_stage0b.py --batch 16 --seconds 15
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def timeit(fn, args, iters=8, loops=2):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out[:1, :1, :4].astype(jnp.float32)))
    best = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[:1, :1, :4].astype(jnp.float32)))
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
    T = (int(args.seconds * 16000) // 5) * 5
    C = 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((10, 1, C)).astype(np.float32) * 0.1, jnp.bfloat16)
    gam = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    bet = jnp.asarray(rng.standard_normal(C).astype(np.float32))

    def conv0_xla(x):
        return lax.conv_general_dilated(
            x[:, :, None].astype(jnp.bfloat16), w, (5,), [(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def conv0_reshaped(x):
        xr = x.reshape(B, T // 5, 5).astype(jnp.bfloat16)
        wk = w.reshape(2, 5, C)  # (k=2, cin=5, C)
        return lax.conv_general_dilated(
            xr, wk, (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def conv0_twomm(x):
        xr = x.reshape(B, T // 5, 5).astype(jnp.bfloat16)
        w0 = w[:5, 0, :]
        w1 = w[5:, 0, :]
        a = jnp.matmul(xr[:, :-1], w0, preferred_element_type=jnp.float32)
        b = jnp.matmul(xr[:, 1:], w1, preferred_element_type=jnp.float32)
        return (a + b).astype(jnp.bfloat16)

    def gn_f32mat(y):  # round-2 style: explicit f32 upcast
        xf = y.astype(jnp.float32)
        n = jnp.float32(y.shape[1])
        s1 = jnp.sum(xf, axis=1, keepdims=True)
        s2 = jnp.sum(xf * xf, axis=1, keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        a = gam * lax.rsqrt(var + 1e-5)
        b = bet - mean * a
        return gelu((xf * a + b).astype(jnp.bfloat16), jnp.bfloat16)

    def gn_dtypesum(y):  # bf16-read one-pass stats, bf16 normalize
        n = jnp.float32(y.shape[1])
        s1 = jnp.sum(y, axis=1, keepdims=True, dtype=jnp.float32)
        s2 = jnp.sum(lax.square(y), axis=1, keepdims=True, dtype=jnp.float32)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        a = (gam * lax.rsqrt(var + 1e-5)).astype(jnp.bfloat16)
        b = (bet - mean * (gam * lax.rsqrt(var + 1e-5))).astype(jnp.bfloat16)
        return gelu(y * a + b, jnp.bfloat16)

    y0 = jax.jit(conv0_xla)(x)

    cases = [
        ("conv0_reshaped_k2cin5", jax.jit(conv0_reshaped), (x,)),
        ("conv0_two_matmuls", jax.jit(conv0_twomm), (x,)),
        ("gn_dtypesum_only", jax.jit(gn_dtypesum), (y0,)),
        ("stage0_reshaped_plus_dtypesum", jax.jit(lambda x: gn_dtypesum(conv0_reshaped(x))), (x,)),
        ("stage0_twomm_plus_dtypesum", jax.jit(lambda x: gn_dtypesum(conv0_twomm(x))), (x,)),
        ("stage0_xla_plus_dtypesum", jax.jit(lambda x: gn_dtypesum(conv0_xla(x))), (x,)),
    ]
    for name, fn, fargs in cases:
        try:
            ms = timeit(fn, fargs)
            print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)

    ref = np.asarray(jax.jit(conv0_xla)(x), np.float32)[:, : T // 5 - 1]
    for name, fn in [("reshaped", jax.jit(conv0_reshaped)), ("twomm", jax.jit(conv0_twomm))]:
        got = np.asarray(fn(x), np.float32)[:, : T // 5 - 1]
        print(json.dumps({"check": name, "max_err": float(np.max(np.abs(ref - got)))}), flush=True)


if __name__ == "__main__":
    main()
