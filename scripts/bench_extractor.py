"""wav2vec2 conv-extractor attribution: prefix-chain deltas per layer.

Times the extractor prefix (layers 0..i + GN/gelu epilogues) for growing i
inside one jit each; per-layer cost = delta between consecutive prefixes
(the relay dispatch floor cancels).

    python scripts/bench_extractor.py --batch 16 --seconds 15
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, _FeatureExtractor, gelu, _MaskedInstanceNorm
    from thunder_tpu.ops.masking import lengths_to_mask

    cfg = Wav2Vec2Config()
    rng = np.random.default_rng(0)
    samples = int(args.seconds * 16000)
    x = jnp.asarray(rng.standard_normal((args.batch, samples)).astype(np.float32) * 0.1)
    lengths = jnp.full((args.batch,), samples, jnp.int32)

    fe = _FeatureExtractor(cfg, dtype=jnp.bfloat16)
    params = fe.init(jax.random.PRNGKey(0), x, lengths)

    specs = list(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride))

    def prefix_fn(n_layers):
        def fn(params, x, lengths):
            p = params["params"]
            h = x[:, :, None]
            cur = lengths.astype(jnp.int32)
            for i, (dim, k, s) in enumerate(specs[:n_layers]):
                h = nn.Conv(
                    features=dim, kernel_size=(k,), strides=(s,), padding="VALID",
                    use_bias=cfg.conv_bias, dtype=jnp.bfloat16, name=f"conv{i}",
                ).apply({"params": p[f"conv{i}"]}, h)
                cur = (cur - k) // s + 1
                if i == 0:
                    h = _MaskedInstanceNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.bfloat16).apply(
                        {"params": p["gn"]}, h, lengths_to_mask(cur, h.shape[1])
                    )
                h = gelu(h, jnp.bfloat16)
            return jnp.sum(h[:1, :1, :4].astype(jnp.float32))

        return jax.jit(fn)

    times = {}
    for n in range(1, len(specs) + 1):
        fn = prefix_fn(n)
        float(fn(params, x, lengths))  # compile + sync
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(params, x, lengths)
            float(out)
            best = min(best, time.perf_counter() - t0)
        times[n] = best / args.iters * 1000
        print(json.dumps({"prefix_layers": n, "ms": round(times[n], 3)}), flush=True)
    deltas = {f"layer{i}": round(times[i + 1] - times[i], 3) for i in range(1, len(specs))}
    print(json.dumps({"layer_deltas_ms": deltas, "layer0_plus_gn_ms": round(times[1], 3)}), flush=True)


if __name__ == "__main__":
    main()
