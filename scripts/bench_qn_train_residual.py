"""QuartzNet train-step RESIDUAL ablation (round-5 verdict item #3).

The round-4 split roofline predicted 35.5 ms of the measured 49.5 ms step at
B=16 x 15 s and attributed the ~14 ms residual in prose.  This script
measures each residual term on the chip as a variant ladder — the same chip
ablation discipline round 2 used on the 84 ms step:

- full         : SpecAugment 2+2 masks, dropout 0.1, train-BN, CTC, AdamW
- no_specaug   : masks off
- no_aug_drop  : masks off + dropout 0
- evalmode     : same module, BN in eval mode (running stats, no stat
                 updates / batch_stats threading) — vs no_aug_drop isolates
                 the train-BN statistics cost
- mse_loss     : CTC replaced by a cheap quadratic loss on the logits —
                 vs full isolates the CTC scan fwd+bwd
- sgd          : AdamW replaced by SGD — isolates the optimizer update

Every variant is a full jitted fwd+bwd+update step, timed with the donated-
state rebind chain, warm-up chain + best-of-2 (the relay measurement rules
in docs/benchmarks.md).  Output: one JSON line per variant + an attribution
summary whose terms should close >= 90% of the predicted-vs-measured gap.

Usage (on an otherwise idle host): python scripts/bench_qn_train_residual.py
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
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax
    from functools import partial

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.ops.ctc import calculate_ctc
    from thunder_tpu.text import BatchTextTransformer
    from thunder_tpu.training.optim import adamw
    from thunder_tpu.training.trainer import TrainState

    B, samples = args.batch, int(args.seconds * 16000)
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    tt = BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '"))

    def build(masks: int, dropout: float):
        return CTCModule.create(
            jax.random.PRNGKey(0),
            audio_transform=FilterbankFeatures(num_time_masks=masks, num_freq_masks=masks),
            encoder=QuartznetEncoder(repeat_blocks=3, dtype=dtype, dropout=dropout),
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

    def make_step(module, tx, loss_kind: str, train_mode: bool):
        model, blank = module.model, module.blank_idx

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, a):
            rd, ra = jax.random.split(jax.random.fold_in(key, state.step))

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats is not None:
                    variables["batch_stats"] = state.batch_stats
                if train_mode:
                    (logits, out_l), updates = model.apply(
                        variables, a, lengths, train=True,
                        rngs={"dropout": rd, "augment": ra}, mutable=["batch_stats"],
                    )
                else:
                    logits, out_l = model.apply(variables, a, lengths, train=False)
                    updates = {}
                if loss_kind == "ctc":
                    loss = calculate_ctc(logits, targets, out_l, target_lengths, blank)
                else:  # quadratic stand-in: no CTC scan, same logits traffic
                    loss = jnp.mean(logits.astype(jnp.float32) ** 2)
                return loss, updates

            (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            if updates and "batch_stats" in updates:
                state = state.replace(batch_stats=updates["batch_stats"])
            return state, loss

        return step

    def timed(module, tx, loss_kind="ctc", train_mode=True):
        state = TrainState.create(
            apply_fn=module.model.apply,
            params=jax.tree_util.tree_map(jnp.array, module.variables["params"]),
            tx=tx,
            batch_stats=(
                jax.tree_util.tree_map(jnp.array, module.variables["batch_stats"])
                if "batch_stats" in module.variables else None
            ),
        )
        step = make_step(module, tx, loss_kind, train_mode)
        state, loss = step(state, audio)
        float(loss)  # warm chain
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            for _ in range(args.iters):
                state, loss = step(state, audio)
            float(loss)
            best = min(best, (time.perf_counter() - start) / args.iters * 1000)
        return best

    full_mod = build(2, 0.1)
    noaug_mod = build(0, 0.1)
    clean_mod = build(0, 0.0)

    out = {}
    out["full"] = timed(full_mod, adamw(learning_rate=1e-4))
    out["no_specaug"] = timed(noaug_mod, adamw(learning_rate=1e-4))
    out["no_aug_drop"] = timed(clean_mod, adamw(learning_rate=1e-4))
    out["evalmode"] = timed(clean_mod, adamw(learning_rate=1e-4), train_mode=False)
    out["mse_loss"] = timed(full_mod, adamw(learning_rate=1e-4), loss_kind="mse")
    out["sgd"] = timed(full_mod, optax.sgd(learning_rate=1e-3))
    for k, v in out.items():
        print(json.dumps({"variant": k, "step_ms": round(v, 2)}), flush=True)

    attribution = {
        "specaug_ms": round(out["full"] - out["no_specaug"], 2),
        "dropout_ms": round(out["no_specaug"] - out["no_aug_drop"], 2),
        "bn_stats_ms": round(out["no_aug_drop"] - out["evalmode"], 2),
        "ctc_ms": round(out["full"] - out["mse_loss"], 2),
        "adamw_ms": round(out["full"] - out["sgd"], 2),
        "full_ms": round(out["full"], 2),
    }
    print(json.dumps({"attribution": attribution}), flush=True)


if __name__ == "__main__":
    main()
