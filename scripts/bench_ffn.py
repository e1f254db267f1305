"""FFN (768 -> 3072 -> gelu -> 768) formulation shootout at serving shapes.

The encoder-layer attribution (scripts/bench_layer.py) shows the FFN pair
running at ~1.14 ms/layer where the two GEMMs alone should cost ~0.5 ms at
the measured bf16 matmul rate — this isolates where the other half goes.

    python scripts/bench_ffn.py --batch 16 --frames 768
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

    from thunder_tpu.models.wav2vec2 import _fast_gelu

    B, T, H, F = args.batch, args.frames, 768, 3072
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32) * 0.1, jnp.bfloat16)
    x2 = x3.reshape(B * T, H)
    wu = jnp.asarray(rng.standard_normal((H, F)).astype(np.float32) * 0.02, jnp.bfloat16)
    bu = jnp.zeros((F,), jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((F, H)).astype(np.float32) * 0.02, jnp.bfloat16)
    bd = jnp.zeros((H,), jnp.bfloat16)
    gflop = 2 * B * T * H * F * 2 / 1e9

    def mk(fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(x, n):
            y = x
            for _ in range(n):
                y = fn(y * (1 + 1e-6))
            return y
        return chain

    cases = {}
    cases["full_3d"] = mk(lambda y: (_fast_gelu(y @ wu + bu).astype(jnp.bfloat16) @ wd + bd).astype(jnp.bfloat16))
    cases["full_2d"] = mk(lambda y: (_fast_gelu(y @ wu + bu).astype(jnp.bfloat16) @ wd + bd).astype(jnp.bfloat16))
    cases["nogelu_2d"] = mk(lambda y: (((y @ wu + bu) @ wd) + bd).astype(jnp.bfloat16))
    cases["nobias_gelu_2d"] = mk(lambda y: (_fast_gelu(y @ wu).astype(jnp.bfloat16) @ wd).astype(jnp.bfloat16))
    cases["up_only_2d"] = mk(lambda y: (y @ wu)[:, :H].astype(jnp.bfloat16))
    cases["down_shape_2d"] = None  # filled below (needs (M,F) input)
    cases["tanhgelu_2d"] = mk(
        lambda y: ((jax.nn.gelu((y @ wu + bu).astype(jnp.float32), approximate=True)).astype(jnp.bfloat16) @ wd + bd).astype(jnp.bfloat16)
    )
    cases["gelu_bf16_2d"] = mk(
        # gelu evaluated in bf16 (no f32 upcast round-trip)
        lambda y: ((0.5 * (y @ wu + bu) * (1 + jnp.tanh(0.7978845608 * ((y @ wu + bu) + 0.044715 * (y @ wu + bu) ** 3)))) @ wd + bd).astype(jnp.bfloat16)
    )

    xf = jnp.asarray(rng.standard_normal((B * T, F)).astype(np.float32) * 0.1, jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n",))
    def down_chain(x, n):
        y = x
        for _ in range(n):
            o = (y[:, :F] @ wd + bd).astype(jnp.bfloat16)
            y = jnp.concatenate([o, y[:, H:]], axis=-1) * (1 + 1e-6)
        return y

    for name, chain in cases.items():
        if chain is None:
            continue
        arg = x3 if name.endswith("_3d") else x2
        try:
            ms = slope(chain, (arg,))
            print(json.dumps({"case": name, "ms": round(ms, 3), "tflops": round(gflop / ms, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "error": repr(e)[:200]}), flush=True)
    try:
        ms = slope(down_chain, (xf,))
        print(json.dumps({"case": "down_only_2d(+concat)", "ms": round(ms, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"case": "down_only_2d", "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
