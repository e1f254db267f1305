"""Training-step throughput benchmark (secondary metric; bench.py is the
driver-consumed inference RTF).

Measures full CTC training steps — frontend + QuartzNet15x5 (bf16 compute,
f32 params) + CTC loss + backward + AdamW — as steps/sec and audio-sec/sec.
Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer
    from thunder_tpu.training.optim import adamw
    from thunder_tpu.training.trainer import TrainState, make_train_step

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    tt = BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '"))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(num_time_masks=2, num_freq_masks=2),
        encoder=QuartznetEncoder(repeat_blocks=3, dtype=dtype, dropout=0.1),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens, dtype=dtype),
        text_transform=tt,
        sample_len=16000,
    )

    batch = 16 if on_tpu else 2
    seconds = 15.0
    samples = int(seconds * 16000)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, samples)).astype(np.float32) * 0.1)
    audio_lengths = jnp.full((batch,), samples, dtype=jnp.int32)
    texts = ["the quick brown fox jumps over the lazy dog"] * batch
    targets, target_lengths = module.text_transform.encode(texts, pad_to=64)

    state = TrainState.create(
        apply_fn=module.model.apply,
        params=module.variables["params"],
        tx=adamw(learning_rate=1e-4),
        batch_stats=module.variables.get("batch_stats"),
    )
    step_fn = make_train_step(module.model, module.blank_idx)
    # rbg PRNG on TPU: threefry random bits alone cost ~34 ms of the 84 ms
    # step (78 dropout layers); XLA's RngBitGenerator is ~free (measured)
    key = jax.random.key(0, impl="rbg") if on_tpu else jax.random.PRNGKey(0)

    state, loss = step_fn(state, audio, audio_lengths, targets, target_lengths, key)
    float(loss)  # sync

    iters = 10 if on_tpu else 2
    start = time.perf_counter()
    for _ in range(iters):
        state, loss = step_fn(state, audio, audio_lengths, targets, target_lengths, key)
    final = float(loss)  # device->host scalar fetch forces completion
    elapsed = time.perf_counter() - start

    steps_per_sec = iters / elapsed

    from thunder_tpu.flops import mfu, peak_flops, quartznet_train_flops

    step_flops = quartznet_train_flops(samples, batch=batch, repeat_blocks=3)
    tflops_per_sec = step_flops * steps_per_sec / 1e12
    out = {
        "metric": "train_step_throughput_quartznet15x5",
        "value": round(steps_per_sec * batch * seconds, 2),
        "unit": "audio-sec/sec/chip",
        "steps_per_sec": round(steps_per_sec, 3),
        "loss": round(final, 3),
        "model_tflops_per_step": round(step_flops / 1e12, 3),
        "model_tflops_per_sec": round(tflops_per_sec, 2),
    }
    utilization = mfu(step_flops * iters, elapsed, peak_flops())
    if utilization is not None:
        out["mfu"] = round(utilization, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
