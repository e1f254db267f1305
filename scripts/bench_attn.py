"""Attention-core shootout at wav2vec2 serving shapes: unfused bf16-scores
vs tuned-block flash vs splash.  Chain-slope timing per layer application.

    python scripts/bench_attn.py --batch 16 --frames 768
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def time_chain(step, x0, reps=(2, 8), iters=6):
    import jax
    import jax.numpy as jnp

    results = {}
    for n in reps:
        @jax.jit
        def chain(x, n=n):
            y = x
            for _ in range(n):
                y = step(y) * (1 + 1e-6)
            return jnp.sum(y[:1, :1, :4].astype(jnp.float32))

        float(chain(x0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = chain(x0)
            float(out)
            best = min(best, time.perf_counter() - t0)
        results[n] = best / iters
    ns = sorted(results)
    return (results[ns[-1]] - results[ns[0]]) / (ns[-1] - ns[0]) * 1000


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

    B, T, H, dh = args.batch, args.frames, 12, 64
    h = H * dh
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, 3 * h)).astype(np.float32) * 0.1, jnp.bfloat16)
    key_mask = jnp.ones((B, T), bool)
    flops = 2 * 2 * T * T * h * B  # QK^T + AV

    def split_qkv(y):
        q, k, v = jnp.split(y, 3, axis=-1)
        q = q * (dh**-0.5)
        f = lambda t: t.reshape(B, T, H, dh)
        return f(q), f(k), f(v)

    def unfused(y):
        q, k, v = split_qkv(y)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.bfloat16)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return jnp.tile(out.reshape(B, T, h), (1, 1, 3))

    def flash(y):
        from thunder_tpu.models.wav2vec2 import _flash_mha

        q, k, v = split_qkv(y)
        out = _flash_mha(q, k, v, key_mask)
        return jnp.tile(out.reshape(B, T, h), (1, 1, 3))

    def splash(y):
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        q, k, v = split_qkv(y)
        mask = sm.MultiHeadMask([sm.FullMask((T, T)) for _ in range(H)])
        kernel = sk.make_splash_mha_single_device(mask=mask)
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out = jax.vmap(kernel)(qt, kt, vt)
        return jnp.tile(out.transpose(0, 2, 1, 3).reshape(B, T, h), (1, 1, 3))

    for name, fn in [("unfused_bf16", unfused), ("flash_tuned", flash), ("splash", splash)]:
        try:
            ms = time_chain(fn, x)
            print(
                json.dumps(
                    {"attn": name, "ms_per_layer": round(ms, 3), "tflops": round(flops / ms / 1e9, 1)}
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"attn": name, "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
