"""A/B the CTC scan unroll factor on chip (fwd and fwd+bwd).

One process, one chip: times calculate_ctc and grad(calculate_ctc) on a
materialized logits tensor for several unroll factors via the
THUNDER_CTC_UNROLL knob (re-jitting per factor; the knob is read at trace
time).  Chain-dependency timing per the relay measurement rules.

Usage: python scripts/bench_ctc_unroll.py [--batch 16] [--frames 749]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=749)
    ap.add_argument("--vocab", type=int, default=30)
    ap.add_argument("--label-len", type=int, default=44)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--factors", default="1,2,4,8")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
    import jax.numpy as jnp

    import thunder_tpu.ops.ctc as ctc_mod

    B, T, V, L = args.batch, args.frames, args.vocab, args.label_len
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    out_l = jnp.full((B,), T, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(1, V - 1, size=(B, 64)), jnp.int32)
    tl = jnp.full((B,), L, dtype=jnp.int32)

    def chain_time(fn):
        def chained(eps):
            return fn(logits * (1 + eps))

        jitted = jax.jit(chained)
        eps = jitted(np.float32(0.0)) * 1e-30
        float(eps)
        start = time.perf_counter()
        for i in range(args.iters):
            eps = jitted(eps + np.float32(1e-6 * (i + 1))) * 1e-30 + eps * 0.5
        float(eps)
        return (time.perf_counter() - start) / args.iters * 1000

    for factor in [int(x) for x in args.factors.split(",")]:
        os.environ["THUNDER_CTC_UNROLL"] = str(factor)

        def loss(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return ctc_mod.ctc_loss.__wrapped__(lp, out_l, targets, tl, blank=0)

        # grad reduced with a full-tensor dot so no per-sample slice can be
        # DCE'd out of the backward
        def grad_red(lg):
            g = jax.grad(loss)(lg)
            return jnp.vdot(g, g) * 1e-20

        fwd_a = chain_time(loss)
        grad_a = chain_time(grad_red)
        fwd_b = chain_time(loss)
        grad_b = chain_time(grad_red)
        print(json.dumps({
            "unroll": factor,
            "fwd_ms": round(min(fwd_a, fwd_b), 2),
            "fwd_bwd_ms": round(min(grad_a, grad_b), 2),
            "fwd_runs": [round(fwd_a, 2), round(fwd_b, 2)],
            "grad_runs": [round(grad_a, 2), round(grad_b, 2)],
        }), flush=True)


if __name__ == "__main__":
    main()
