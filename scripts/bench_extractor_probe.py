"""Per-layer + whole-stack probe of the frozen wav2vec2 feature extractor.

Chain-slope timing (the repo's measurement rule: n applications inside ONE
jit, slope between the two rep counts cancels per-dispatch relay overhead —
see scripts/bench_attn.py).

Round-4 context: the training ablation put the extractor at ~18.6 ms for
B=8 x 15 s; find the real per-layer split before optimizing.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, _FeatureExtractor


def slope(step, x0, reps=(2, 8), iters=6):
    """ms per single application of step, dispatch-overhead-free."""
    results = {}
    for n in reps:

        @jax.jit
        def chain(x, n=n):
            y = x
            for i in range(n):
                y = step(y) * jnp.asarray(1 + 1e-6 * (i + 1), x.dtype)
            return jnp.sum(y.reshape(-1)[:4].astype(jnp.float32))

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
    cfg = Wav2Vec2Config()
    fe = _FeatureExtractor(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    B, secs = 8, 15.0
    samples = int(secs * 16000)
    audio = jnp.asarray(rng.standard_normal((B, samples)).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), samples, dtype=jnp.int32)
    params = fe.init(jax.random.PRNGKey(0), audio, lengths)["params"]

    # whole stack: chain needs same in/out shape, so wrap with a pad back to
    # the input length (pad cost is negligible vs the convs)
    def full(a):
        out = fe.apply({"params": params}, a[:, :, 0], lengths)
        flat = out.reshape(B, -1)
        if flat.shape[1] < samples:
            flat = jnp.pad(flat, ((0, 0), (0, samples - flat.shape[1])))
        return flat[:, :samples, None].astype(a.dtype)

    x0 = audio[:, :, None]
    t = slope(full, x0)
    print(json.dumps({"probe": "extractor_full", "ms": round(t, 3)}), flush=True)

    # per-layer
    specs = list(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride))
    x = x0.astype(jnp.bfloat16)
    for i, (dim, k, s) in enumerate(specs):
        kern = params[f"conv{i}"]["kernel"].astype(jnp.bfloat16)
        t_in, c_in = x.shape[1], x.shape[2]

        def layer(xi, kern=kern, s=s, t_in=t_in, c_in=c_in):
            y = jax.lax.conv_general_dilated(
                xi,
                kern,
                window_strides=(s,),
                padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            flat = y.reshape(B, -1)
            need = t_in * c_in
            flat = (
                jnp.pad(flat, ((0, 0), (0, need - flat.shape[1])))
                if flat.shape[1] < need
                else flat[:, :need]
            )
            return flat.reshape(B, t_in, c_in)

        t = slope(layer, x)
        y = jax.lax.conv_general_dilated(
            x, kern, window_strides=(s,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        macs = y.shape[0] * y.shape[1] * dim * k * x.shape[2]
        print(
            json.dumps(
                {
                    "probe": f"conv{i}_k{k}_s{s}",
                    "ms": round(t, 3),
                    "out_shape": list(y.shape),
                    "tflops": round(2 * macs / (t / 1000) / 1e12, 1),
                }
            ),
            flush=True,
        )
        x = y


if __name__ == "__main__":
    main()
