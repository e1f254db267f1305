"""wav2vec2-base serving bench + component attribution (run on the chip).

Measures the InferenceEngine end-to-end RTF at serving shapes and, with
--layers-sweep, re-times at several transformer depths so the per-layer
delta (attention + FFN + proj/LN) falls out with the relay's dispatch floor
cancelled.

Examples:
    python scripts/bench_w2v2.py --seconds 15 --batch 16
    THUNDER_FLASH_MIN_SEQ=1 python scripts/bench_w2v2.py --seconds 15 --batch 16
    python scripts/bench_w2v2.py --seconds 30 --batch 8 --layers-sweep
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_module(num_layers: int = 12):
    import jax

    from thunder_tpu.audio import Wav2Vec2Preprocess
    from thunder_tpu.models import LinearDecoder
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '.,?"))
    cfg = Wav2Vec2Config(num_hidden_layers=num_layers)  # base-960h shape
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(mask_input=True),
        encoder=Wav2Vec2Encoder(config=cfg, mask_input=True),
        decoder=LinearDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=16000,
    )


def time_engine(engine, audio, lengths, seconds, iters, loops=2):
    def run():
        _, preds, _ = engine._infer(audio, lengths)
        return preds

    np.asarray(run())  # compile + real sync (relay: fetch, not block_until_ready)
    best = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(iters):
            preds = run()
        np.asarray(preds)
        best = min(best, time.perf_counter() - t0)
    batch = audio.shape[0]
    ms = best / iters * 1000
    return batch * seconds * iters / best, ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--layers-sweep", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int8-compute", action="store_true")
    ap.add_argument("--agreement", action="store_true", help="argmax agreement vs the default engine")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine

    rng = np.random.default_rng(0)
    samples = int(args.seconds * 16000)
    audio = jnp.asarray(rng.standard_normal((args.batch, samples)).astype(np.float32) * 0.1)
    lengths = jnp.full((args.batch,), samples, dtype=jnp.int32)

    depths = [12] if not args.layers_sweep else [4, 8, 12]
    results = {}
    for n in depths:
        module = build_module(num_layers=n)
        if args.agreement:
            base = InferenceEngine(module)
            _, p0, _ = base._infer(audio, lengths)
        engine = InferenceEngine(module, int8_weights=args.int8, int8_compute=args.int8_compute)
        if args.agreement:
            _, p1, _ = engine._infer(audio, lengths)
            agree = float((np.asarray(p0) == np.asarray(p1)).mean())
            print(json.dumps({"layers": n, "argmax_agreement": round(agree, 4)}), flush=True)
        rtf, ms = time_engine(engine, audio, lengths, args.seconds, args.iters)
        results[n] = ms
        print(
            json.dumps(
                {
                    "layers": n,
                    "batch": args.batch,
                    "seconds": args.seconds,
                    "ms_per_batch": round(ms, 2),
                    "rtf": round(rtf, 1),
                }
            ),
            flush=True,
        )
    if args.layers_sweep and len(depths) >= 2:
        ks = sorted(results)
        slopes = [
            (results[b] - results[a]) / (b - a) for a, b in zip(ks, ks[1:])
        ]
        print(
            json.dumps(
                {
                    "ms_per_layer": [round(s, 3) for s in slopes],
                    "intercept_ms_at_0_layers": round(
                        results[ks[0]] - slopes[0] * ks[0], 2
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
