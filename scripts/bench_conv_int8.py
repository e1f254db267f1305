"""Does XLA's TPU conv emitter have an int8 path worth using?

The wav2vec2 extractor's k=3 stride-2 convs run at bf16 roofline
(179-203 TFLOPS, docs/benchmarks.md).  v5e's MXU doubles throughput at
int8; if `conv_general_dilated` on int8 x int8 -> int32 hits anywhere near
that, W8A8 extractor convs buy ~2-3 ms of the 13.7 ms extractor.

    python scripts/bench_conv_int8.py --batch 16 --frames 24000
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def slope(chain, args_, reps=(2, 6), iters=5):
    import jax.numpy as jnp

    res = {}
    for n in reps:
        out = chain(*args_, n=n)
        float(jnp.sum(out[:1, :1, :4].astype(jnp.float32)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = chain(*args_, n=n)
            float(jnp.sum(out[:1, :1, :4].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        res[n] = best / iters
    ns = sorted(res)
    return (res[ns[-1]] - res[ns[0]]) / (ns[-1] - ns[0]) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=24000, help="input frames to the k=3 s=2 conv")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    B, T, C, K, S = args.batch, args.frames, 512, 3, 2
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-100, 100, (B, T, C)), jnp.int8)
    wq = jnp.asarray(rng.integers(-100, 100, (K, C, C)), jnp.int8)
    xb = xq.astype(jnp.bfloat16) * 0.01
    wb = wq.astype(jnp.bfloat16) * 0.01
    t_out = (T - K) // S + 1
    gflop = 2 * B * t_out * K * C * C / 1e9
    dn = lax.conv_dimension_numbers((B, T, C), (K, C, C), ("NHC", "HIO", "NHC"))

    def conv(x, w, acc):
        return lax.conv_general_dilated(
            x, w, window_strides=(S,), padding="VALID",
            dimension_numbers=dn, preferred_element_type=acc,
        )

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_bf16(x, n):
        y = x
        for _ in range(n):
            z = conv(y, wb, jnp.float32).astype(jnp.bfloat16)
            # re-expand back to T frames so the chain composes (pad-tile)
            y = jnp.concatenate([z, z], axis=1)[:, :T] * (1 + 1e-6)
        return y

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_int8(x, n):
        y = x
        for _ in range(n):
            z = conv(y, wq, jnp.int32)
            z8 = jnp.clip(z >> 8, -127, 127).astype(jnp.int8)
            y = jnp.concatenate([z8, z8], axis=1)[:, :T]
        return y

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_w8a8_dyn(x, n):
        # float activations in, dynamic per-item quantize, int8 conv, dequant
        y = x
        for _ in range(n):
            s = jnp.max(jnp.abs(y), axis=(1, 2), keepdims=True) / 127.0
            q = jnp.round(y / jnp.maximum(s, 1e-12)).astype(jnp.int8)
            z = conv(q, wq, jnp.int32).astype(jnp.float32) * s * 0.01
            z = z.astype(jnp.bfloat16)
            y = jnp.concatenate([z, z], axis=1)[:, :T] * (1 + 1e-6)
        return y

    for name, chain, arg in (
        ("conv_bf16", chain_bf16, xb),
        ("conv_int8_pure", chain_int8, xq),
        ("conv_w8a8_dynamic", chain_w8a8_dyn, xb),
    ):
        try:
            ms = slope(chain, (arg,))
            print(json.dumps({"case": name, "ms": round(ms, 3), "tflops": round(gflop / ms, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
