"""QuartzNet15x5 train-step roofline: analytic dgrad/wgrad split + chip check.

Round-4 companion to the inference roofline proof in docs/benchmarks.md
("Flagship roofline proof"): the same depthwise(VPU)/matmul(MXU) FLOP split,
extended to the training step.

Backward formulation (why each term costs what the forward costs):

- depthwise dgrad: correlation of the output grad with the k-tap kernel
  flipped in time — k MACs per (channel, frame), identical count to fwd;
- depthwise wgrad: per (tap, channel) an inner product over frames,
  sum_t x[t+tap] * dy[t] — again k MACs per (channel, frame);
- pointwise/residual/decoder dgrad: matmul against the transposed (C_out,
  C_in) kernel — same FLOPs as fwd;
- pointwise wgrad: (C_in, T) x (T, C_out) matmul — same FLOPs as fwd;
- frontend: stop-gradiented (no trainable parameters upstream), fwd only.

So train = 3x fwd for both terms, and the two terms keep their separate
rooflines: the depthwise work runs on the VPU at the measured
EmitDepthwiseInputBatchInSublanes emitter rate, the matmul work on the MXU.

Usage (on chip): python scripts/bench_qn_train_roofline.py [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# measured rates from the inference roofline (docs/benchmarks.md): the
# depthwise emitter at ~half VPU FMA peak, and XLA's matmul chains at ~70%
# of the 197 TFLOPS bf16 peak on this chip
VPU_DW_TFLOPS = 4.8
MXU_TFLOPS = 138.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.flops import (
        filterbank_flops,
        peak_flops,
        quartznet_forward_flops_split,
    )
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.ops.ctc import calculate_ctc
    from thunder_tpu.text import BatchTextTransformer
    from thunder_tpu.training.optim import adamw
    from thunder_tpu.training.trainer import TrainState, make_train_step

    B, samples = args.batch, int(args.seconds * 16000)
    frames = samples // 160 + 1

    # ---- analytic side ----
    dw_fwd, mxu_fwd = quartznet_forward_flops_split(frames, batch=B)
    fb = filterbank_flops(samples, batch=B)
    dw_train = 3 * dw_fwd
    mxu_train = 3 * mxu_fwd + fb
    t_dw = dw_train / (VPU_DW_TFLOPS * 1e12)
    t_mxu = mxu_train / (MXU_TFLOPS * 1e12)
    predicted_ms = (t_dw + t_mxu) * 1000

    # ---- measured side ----
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
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, samples)).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), samples, dtype=jnp.int32)
    targets, target_lengths = tt.encode(
        ["the quick brown fox jumps over the lazy dog"] * B, pad_to=64
    )
    key = jax.random.key(0, impl="rbg") if on_tpu else jax.random.PRNGKey(0)

    state = TrainState.create(
        apply_fn=module.model.apply,
        params=module.variables["params"],
        tx=adamw(learning_rate=1e-4),
        batch_stats=module.variables.get("batch_stats"),
    )
    step_fn = make_train_step(module.model, module.blank_idx)

    def timed(fn, *a):
        # iterations chained through eps (the relay dedupes identical
        # in-flight dispatches); wall closed by one scalar fetch; best of 2
        # chains after a warm-up chain (the first chain after a fresh
        # compile reads high)
        def chain(eps, i):
            out = fn(eps, *a)
            leaf = jax.tree_util.tree_leaves(out)[-1]
            return leaf.ravel()[0].astype(jnp.float32) * 1e-30 + np.float32(
                1e-6 * (i + 1)
            )

        eps = chain(np.float32(0.0), 0)
        float(eps)
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            for i in range(args.iters):
                eps = chain(eps, i + 1)
            float(eps)
            best = min(best, (time.perf_counter() - start) / args.iters * 1000)
        return best

    @jax.jit
    def fwd_only(eps, variables, a, l, tg, tl, k):
        (logits, out_l), _ = module.model.apply(
            variables, a * (1 + eps), l, train=True, mutable=["batch_stats"],
            rngs={"dropout": k, "augment": k},
        )
        return calculate_ctc(logits, tg, out_l, tl, blank=module.blank_idx)

    def time_full_step(state):
        # state is DONATED by the step; rebind it every call
        state, loss = step_fn(state, audio, lengths, targets, target_lengths, key)
        float(loss)
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            for _ in range(args.iters):
                state, loss = step_fn(
                    state, audio, lengths, targets, target_lengths, key
                )
            float(loss)
            best = min(best, (time.perf_counter() - start) / args.iters * 1000)
        return best

    # fwd first: the donated full step frees state.params, which ALIASES
    # module.variables["params"]
    fwd_ms = timed(
        fwd_only, module.variables, audio, lengths, targets, target_lengths, key
    )
    step_ms = time_full_step(state)

    total_flops = dw_train + mxu_train
    peak = peak_flops()
    print(json.dumps({
        "batch": B,
        "seconds": args.seconds,
        "analytic": {
            "dw_fwd_tflop": round(dw_fwd / 1e12, 4),
            "mxu_fwd_tflop": round((mxu_fwd + fb) / 1e12, 4),
            "dw_train_tflop": round(dw_train / 1e12, 4),
            "mxu_train_tflop": round(mxu_train / 1e12, 4),
            "dw_ms_at_vpu_rate": round(t_dw * 1000, 1),
            "mxu_ms_at_mxu_rate": round(t_mxu * 1000, 1),
            "predicted_step_ms": round(predicted_ms, 1),
        },
        "measured": {
            "train_step_ms": round(step_ms, 1),
            "fwd_loss_ms": round(fwd_ms, 1),
            "bwd_opt_ms": round(step_ms - fwd_ms, 1),
        },
        "train_mfu": round(total_flops / (step_ms / 1000) / peak, 4) if peak else None,
        "audio_s_per_s": round(B * args.seconds / (step_ms / 1000), 1),
    }))


if __name__ == "__main__":
    main()
