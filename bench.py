"""Inference RTF benchmark on the flagship model (QuartzNet15x5 path).

Measures end-to-end greedy-CTC inference throughput — mel frontend +
encoder + decoder + argmax, all on device — as real-time factor
(audio seconds transcribed per wall-clock second per chip).

Baseline: the reference publishes no benchmark numbers (BASELINE.md); the
rebuild north-star is RTF >= 500x per TPU v5e chip, so
``vs_baseline = RTF / 500``.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: repeat runs (e.g. the driver each round) skip
    # the slow remote compile entirely
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.engine import InferenceEngine
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer

    on_tpu = jax.default_backend() not in ("cpu",)

    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat_blocks=3),  # 15x5
        decoder=Conv1dDecoder(num_classes=29),
        text_transform=BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '")),
        sample_len=16000,
    )
    engine = InferenceEngine(module)

    batch = 64 if on_tpu else 2
    seconds = 15.0
    samples = int(seconds * 16000)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, samples)).astype(np.float32) * 0.1)
    lengths = jnp.full((batch,), samples, dtype=jnp.int32)

    def infer(audio, lengths):
        _, preds, out_lengths = engine._infer(audio, lengths)
        return preds, out_lengths

    # warmup / compile (np.asarray forces a real device->host fetch — through
    # the remote TPU relay, block_until_ready alone does not synchronize)
    preds, _ = infer(audio, lengths)
    np.asarray(preds)

    iters = 10 if on_tpu else 2
    # best of two timed loops: absorbs relay/dispatch jitter (~2% run-to-run)
    elapsed = float("inf")
    for _ in range(2 if on_tpu else 1):
        start = time.perf_counter()
        for _ in range(iters):
            preds, out_lengths = infer(audio, lengths)
        np.asarray(preds)
        elapsed = min(elapsed, time.perf_counter() - start)

    audio_seconds = batch * seconds * iters
    rtf = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "inference_rtf_quartznet15x5",
                "value": round(rtf, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(rtf / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
