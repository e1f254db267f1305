"""Attribute the wav2vec2 training step (B=8 x 15 s, frozen extractor).

Round-4 measurement harness for the training-throughput push (VERDICT item 1).
Times full train steps for a ladder of variants so each delta isolates one
term:

  base            round-3 shipped config (attention/hidden dropout 0.1,
                  unfused f32-score attention in train mode)
  nodrop          all dropout rates 0 -> cost of dropout masks
  nodrop+flash    dropout 0 AND flash attention allowed in train mode
                  (jax pallas flash fwd+bwd) -> cost of materialized scores
  flashdrop       hidden dropout 0.1 kept, attention_dropout 0, flash train
  remat           base + per-layer remat (HBM/FLOPs trade)
  fwd             forward-only (loss, no grad) for the fwd/bwd split
  extractor       extractor-only forward (the frozen term)

Usage: python scripts/bench_train_ablate.py [--variants a,b,c] [--iters N]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def build(dropout: float, attn_dropout: float, remat: bool, flash_train: bool, num_layers: int = 12):
    import jax
    import jax.numpy as jnp

    from thunder_tpu.audio import Wav2Vec2Preprocess
    from thunder_tpu.models import LinearDecoder
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '"))
    cfg = Wav2Vec2Config(
        hidden_dropout=dropout,
        attention_dropout=attn_dropout,
        feat_proj_dropout=dropout,
        num_hidden_layers=num_layers,
    )
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=Wav2Vec2Preprocess(mask_input=False),
        encoder=Wav2Vec2Encoder(
            config=cfg,
            mask_input=False,
            dtype=jnp.bfloat16,
            remat=remat,
            freeze_feature_extractor=True,
        ),
        decoder=LinearDecoder(num_classes=tt.num_tokens, dtype=jnp.bfloat16),
        text_transform=tt,
        sample_len=16000,
    )
    return module, tt


def time_step(fn, *args, iters=10):
    """fn(eps, *args) -> out.  Iterations are serialized by threading a data
    dependency (eps derives from the previous output) and the wall clock is
    closed by ONE host fetch at the end — the relay dedupes identical
    dispatches and executes independent ones concurrently, so neither
    repeated identical calls nor block_until_ready measure compute
    (ROUND_NOTES measurement rule)."""

    def chain(out, i):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.ravel()[0].astype(jnp.float32) * 1e-30 + np.float32(
            1e-6 * (i + 1)
        )

    eps = chain(fn(np.float32(0.0), *args), 0)
    float(eps)  # warmup complete
    start = time.perf_counter()
    for i in range(iters):
        eps = chain(fn(eps, *args), i + 1)
    float(eps)
    return (time.perf_counter() - start) / iters


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--variants", default="base,nodrop,nodrop_flash,remat,fwd,extractor")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seconds", type=float, default=15.0)
    parser.add_argument("--layers", type=int, default=12)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import thunder_tpu.models.wav2vec2 as w2v
    from thunder_tpu.training.optim import adamw
    from thunder_tpu.training.trainer import TrainState, make_train_step

    B, samples = args.batch, int(args.seconds * 16000)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, samples)).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), samples, dtype=jnp.int32)
    key = jax.random.key(0, impl="rbg")

    orig_gate = w2v._use_flash_attention
    import thunder_tpu.kernels.attn_onepanel as _onepanel_mod

    orig_onepanel = _onepanel_mod.mha_from_qkv

    def run(name):
        dropout, attn_dropout, remat, flash_train = 0.1, 0.1, False, False
        if name.startswith("nodrop"):
            dropout = attn_dropout = 0.0
        if name.startswith("flashdrop"):
            attn_dropout = 0.0
        if "flash" in name:
            flash_train = True
        if "remat" in name:
            remat = True

        if flash_train:
            # the monkeypatched gate forces train=False, which would
            # silently SKIP attention-prob dropout for a variant that set
            # attn_dropout > 0 — fail loudly instead of measuring a
            # different model
            assert attn_dropout == 0.0, (
                f"variant {name!r}: flash_train requires attn_dropout == 0 "
                f"(got {attn_dropout}) — the patched gate drops prob dropout"
            )
            # allow the flash path in train mode for the A/B (the one-panel
            # fwd-only kernel is replaced by a differentiable flash
            # equivalent because it has no vjp): pretend eval
            w2v._use_flash_attention = (
                lambda dtype, train, seq_len, attention_dropout=0.0: orig_gate(
                    dtype, False, seq_len
                )
            )
            import thunder_tpu.kernels.attn_onepanel as onepanel
            from thunder_tpu.ops.masking import lengths_to_mask

            def diff_mha(qkv, lens, heads, block_q=None):
                q, k, v = jnp.split(qkv, 3, axis=-1)
                b, t, h = q.shape
                dh = h // heads
                q = q * (dh**-0.5)
                split = lambda a: a.reshape(b, t, heads, dh)
                mask = lengths_to_mask(lens, t)
                out = w2v._flash_mha(split(q), split(k), split(v), mask)
                return out.reshape(b, t, h)

            onepanel.mha_from_qkv = diff_mha
        else:
            w2v._use_flash_attention = orig_gate
            _onepanel_mod.mha_from_qkv = orig_onepanel

        module, tt = build(dropout, attn_dropout, remat, False, num_layers=args.layers)
        targets, target_lengths = tt.encode(
            ["the quick brown fox jumps over the lazy dog"] * B, pad_to=64
        )

        if name == "extractor":
            fe_params = module.variables["params"]["encoder"]["feature_extractor"]
            fe = w2v._FeatureExtractor(w2v.Wav2Vec2Config(), dtype=jnp.bfloat16)

            @jax.jit
            def fe_fn(eps, p, a, l):
                return fe.apply({"params": p}, a * (1 + eps), l)

            t = time_step(fe_fn, fe_params, audio, lengths, iters=args.iters)
            return t

        if name == "ctc":
            # CTC loss alone on a materialized logits tensor (the scan over
            # ~749 frames is the sequential term of the step)
            from thunder_tpu.ops.ctc import calculate_ctc

            frames = (samples // 320) - 1
            V = tt.num_tokens + 1
            logits = jnp.asarray(
                rng.standard_normal((B, frames, V)).astype(np.float32)
            )
            out_l = jnp.full((B,), frames, dtype=jnp.int32)

            @jax.jit
            def ctc_fn(eps, lg, tg, tl):
                return calculate_ctc(
                    lg * (1 + eps), tg, out_l, tl, blank=module.blank_idx
                )

            return time_step(ctc_fn, logits, targets, target_lengths, iters=args.iters)

        if name.endswith("grad"):
            # model fwd+bwd WITHOUT the CTC loss: grad of mean(logits) —
            # isolates the transformer/extractor backward from the CTC term
            @jax.jit
            def grad_fn(eps, variables, a, l, k):
                def loss(params):
                    (logits, _), _ = module.model.apply(
                        {"params": params}, a * (1 + eps), l, train=True,
                        mutable=["batch_stats"], rngs={"dropout": k, "augment": k},
                    )
                    return jnp.mean(logits.astype(jnp.float32))

                return jax.grad(loss)(variables["params"])

            return time_step(
                grad_fn, module.variables, audio, lengths, key, iters=args.iters
            )

        if name.endswith("fwd"):
            from thunder_tpu.ops.ctc import calculate_ctc

            @jax.jit
            def fwd_fn(eps, variables, a, l, tg, tl, k):
                (logits, out_l), _ = module.model.apply(
                    variables, a * (1 + eps), l, train=True, mutable=["batch_stats"],
                    rngs={"dropout": k, "augment": k},
                )
                return calculate_ctc(logits, tg, out_l, tl, blank=module.blank_idx)

            t = time_step(
                fwd_fn, module.variables, audio, lengths, targets, target_lengths, key,
                iters=args.iters,
            )
            return t

        state = TrainState.create(
            apply_fn=module.model.apply,
            params=module.variables["params"],
            tx=adamw(learning_rate=1e-4),
            batch_stats=module.variables.get("batch_stats"),
        )
        step_fn = make_train_step(module.model, module.blank_idx)

        def stepper(s):
            return step_fn(s, audio, lengths, targets, target_lengths, key)

        state, loss = stepper(state)
        float(loss)
        start = time.perf_counter()
        for _ in range(args.iters):
            state, loss = stepper(state)
        float(loss)
        return (time.perf_counter() - start) / args.iters

    results = {}
    for name in args.variants.split(","):
        t = run(name)
        results[name] = round(t * 1000, 2)
        audio_s = B * args.seconds / t
        print(json.dumps({"variant": name, "ms_per_step": results[name],
                          "audio_s_per_s": round(audio_s, 1)}), flush=True)
    w2v._use_flash_attention = orig_gate
