"""Training-step throughput benchmark (secondary metric; bench.py is the
driver-consumed inference RTF).

Measures full CTC training steps as steps/sec, audio-sec/sec, and MFU.
Prints one JSON line.

Three models:
  --model quartznet  (default) frontend + QuartzNet15x5 (bf16 compute,
                     f32 params) + CTC loss + backward + AdamW
  --model citrinet   80-mel frontend + Citrinet-256 (21-block gamma=8
                     body, squeeze-excite) + CTC loss + backward + AdamW
  --model wav2vec2   the HF finetune path (reference
                     `huggingface/compatibility.py:65-112`): waveform
                     normalize + wav2vec2-base encoder + linear CTC head.
                     --freeze-extractor mirrors the reference adapter's
                     unconditional freeze_feature_encoder() (stop-gradient,
                     extractor backward DCE'd); --remat per-layer
                     rematerialization; --no-freeze trains end-to-end.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _build_quartznet(jnp, dtype, tt):
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule

    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(num_time_masks=2, num_freq_masks=2),
        encoder=QuartznetEncoder(repeat_blocks=3, dtype=dtype, dropout=0.1),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens, dtype=dtype),
        text_transform=tt,
        sample_len=16000,
    )


def _build_citrinet(jnp, dtype, tt):
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.flops import (
        CITRINET_256_FILTERS,
        CITRINET_256_KERNELS,
        CITRINET_256_STRIDES,
    )
    from thunder_tpu.models import CitrinetEncoder, Conv1dDecoder
    from thunder_tpu.module import CTCModule

    # Citrinet-256: 80-mel frontend, 21-block gamma=8 body, 640ch tail
    # (the reference builds this from the NeMo config via
    # `citrinet/compatibility.py:54-111`; shapes here are the published
    # stt_en_citrinet_256 architecture)
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(nfilt=80, num_time_masks=2, num_freq_masks=2),
        encoder=CitrinetEncoder(
            filters=CITRINET_256_FILTERS,
            kernel_sizes=CITRINET_256_KERNELS,
            strides=CITRINET_256_STRIDES,
            feat_in=80,
            dtype=dtype,
            dropout=0.1,
        ),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens, dtype=dtype),
        text_transform=tt,
        sample_len=16000,
    )


def _build_wav2vec2(jnp, dtype, tt, freeze_extractor: bool, remat: bool, attn_dropout: float):
    import jax

    from thunder_tpu.audio import Wav2Vec2Preprocess
    from thunder_tpu.models import LinearDecoder
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
    from thunder_tpu.module import CTCModule

    # wav2vec2-base: 12 layers, h=768, ffn 3072, the standard 7-conv extractor
    cfg = Wav2Vec2Config(attention_dropout=attn_dropout)
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(mask_input=False),
        encoder=Wav2Vec2Encoder(
            config=cfg,
            mask_input=False,
            dtype=dtype,
            remat=remat,
            freeze_feature_extractor=freeze_extractor,
        ),
        decoder=LinearDecoder(num_classes=tt.num_tokens, dtype=dtype),
        text_transform=tt,
        sample_len=16000,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--model", choices=("quartznet", "citrinet", "wav2vec2"), default="quartznet"
    )
    parser.add_argument("--batch", type=int, default=0, help="0 = model default")
    parser.add_argument("--seconds", type=float, default=15.0)
    parser.add_argument("--iters", type=int, default=0, help="0 = default")
    parser.add_argument(
        "--no-freeze", dest="freeze_extractor", action="store_false",
        help="wav2vec2: train the conv extractor too (default: frozen, the "
        "reference finetune semantics)",
    )
    parser.add_argument("--remat", action="store_true", help="wav2vec2: per-layer remat")
    parser.add_argument(
        "--attn-dropout", type=float, default=0.1,
        help="wav2vec2 attention-prob dropout (HF default 0.1).  0 routes "
        "training attention through the differentiable flash kernel",
    )
    parser.add_argument(
        "--scan", type=int, default=0,
        help="steps per dispatch via make_train_scan_step (0 = one step per "
        "dispatch).  Amortizes host->device launch latency, the production "
        "Trainer(steps_per_execution=K) path",
    )
    args = parser.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from thunder_tpu.text import BatchTextTransformer
    from thunder_tpu.training.optim import adamw
    from thunder_tpu.training.trainer import (
        TrainState,
        make_train_scan_step,
        make_train_step,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    tt = BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '"))
    if args.model == "quartznet":
        module = _build_quartznet(jnp, dtype, tt)
        batch = args.batch or (16 if on_tpu else 2)
    elif args.model == "citrinet":
        module = _build_citrinet(jnp, dtype, tt)
        batch = args.batch or (16 if on_tpu else 2)
    else:
        module = _build_wav2vec2(
            jnp, dtype, tt, args.freeze_extractor, args.remat, args.attn_dropout
        )
        batch = args.batch or (8 if on_tpu else 1)

    seconds = args.seconds
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
    # rbg PRNG on TPU: threefry random bits alone cost ~34 ms of the 84 ms
    # step (78 dropout layers); XLA's RngBitGenerator is ~free (measured)
    key = jax.random.key(0, impl="rbg") if on_tpu else jax.random.PRNGKey(0)

    if args.scan > 1:
        # K steps per dispatch: stack K microbatches (per-row gain variation
        # keeps the relay from deduping) and lax.scan on device
        K = args.scan
        step_fn = make_train_scan_step(module.model, module.blank_idx)
        gains = (1 + 1e-3 * np.arange(K, dtype=np.float32))[:, None, None]
        s_audio = jnp.asarray(np.asarray(audio)[None] * gains)
        stack = lambda a: jnp.broadcast_to(jnp.asarray(a)[None], (K,) + a.shape)
        batch_args = (
            s_audio, stack(audio_lengths), stack(targets), stack(target_lengths),
        )
    else:
        K = 1
        step_fn = make_train_step(module.model, module.blank_idx)
        batch_args = (audio, audio_lengths, targets, target_lengths)

    state, loss = step_fn(state, *batch_args, key)
    float(loss if loss.ndim == 0 else loss[-1])  # sync

    iters = args.iters or (10 if on_tpu else 2)
    start = time.perf_counter()
    for _ in range(iters):
        state, loss = step_fn(state, *batch_args, key)
    # device->host scalar fetch forces completion
    final = float(loss if loss.ndim == 0 else loss[-1])
    elapsed = time.perf_counter() - start

    steps_per_sec = iters * K / elapsed

    from thunder_tpu.flops import (
        citrinet_train_flops,
        mfu,
        peak_flops,
        quartznet_train_flops,
        wav2vec2_train_flops,
    )

    if args.model == "quartznet":
        step_flops = quartznet_train_flops(samples, batch=batch, repeat_blocks=3)
        metric = "train_step_throughput_quartznet15x5"
    elif args.model == "citrinet":
        step_flops = citrinet_train_flops(samples, batch=batch, num_classes=tt.num_tokens)
        metric = "train_step_throughput_citrinet256"
    else:
        step_flops = wav2vec2_train_flops(
            samples,
            batch=batch,
            frozen_extractor=args.freeze_extractor,
            num_classes=tt.num_tokens,
        )
        metric = "train_step_throughput_wav2vec2_base"
    tflops_per_sec = step_flops * steps_per_sec / 1e12
    out = {
        "metric": metric,
        "value": round(steps_per_sec * batch * seconds, 2),
        "unit": "audio-sec/sec/chip",
        "steps_per_sec": round(steps_per_sec, 3),
        "batch": batch,
        "seconds": seconds,
        "loss": round(final, 3),
        "model_tflops_per_step": round(step_flops / 1e12, 3),
        "model_tflops_per_sec": round(tflops_per_sec, 2),
    }
    if args.model == "wav2vec2":
        out["freeze_extractor"] = bool(args.freeze_extractor)
        out["remat"] = bool(args.remat)
        out["attn_dropout"] = args.attn_dropout
    if args.scan > 1:
        out["steps_per_dispatch"] = args.scan
    utilization = mfu(step_flops * iters * K, elapsed, peak_flops())
    if utilization is not None:
        out["mfu"] = round(utilization, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
