"""On-chip A/B: device (jit/XLA) CTC prefix beam search vs the host C++ runtime.

Measures batch beam decode at serving shapes (QuartzNet-style: T frames of a
15 s utterance at 10 ms hop / stride 2, V=29) with realistic peaked logits
(~70% blank frames, matching docs/benchmarks.md's host-runtime setup).

Relay discipline (see .claude/skills/verify/SKILL.md): the timed loop ends
with a SMALL fetch (the (B, 1, T) token matrix at int32 — ~190 KB at B=64),
and we report the two-chain slope so the fixed dispatch+fetch floor cancels.

Run: python scripts/bench_beam_device.py
"""

import time

import numpy as np


def peaked_logits(rng, B, T, V, blank, blank_frac=0.7, peak=6.0):
    logits = rng.normal(0, 1.0, (B, T, V)).astype(np.float32)
    which = rng.random((B, T)) < blank_frac
    tok = rng.integers(0, V, (B, T))
    idx = np.where(which, blank, tok)
    for b in range(B):
        logits[b, np.arange(T), idx[b]] += peak
    return logits


def main():
    import jax

    from thunder_tpu.ops.ctc_beam import beam_search_decode
    from thunder_tpu.ops.ctc_beam_device import beam_search_device

    B, T, V, W = 64, 751, 29, 16
    blank = V - 1
    rng = np.random.default_rng(0)
    logits = peaked_logits(rng, B, T, V, blank)
    print(f"backend={jax.default_backend()} B={B} T={T} V={V} beam={W}")

    # --- device search: time N repeats, small fetch at the end ---
    dlogits = jax.device_put(logits)

    def run_device(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = beam_search_device(dlogits, blank=blank, beam_width=W)
        # beam_search_device already fetches the small token matrix per call
        assert out is not None
        return time.perf_counter() - t0

    run_device(1)  # compile
    t2, t6 = run_device(2), run_device(6)
    per_call = (t6 - t2) / 4.0
    print(f"device beam: {per_call*1e3:.1f} ms/batch = {per_call/B*1e3:.2f} ms/sample "
          f"(chain slope; 2-rep {t2*1e3:.0f} ms, 6-rep {t6*1e3:.0f} ms)")

    # --- host C++ search on in-memory logits (no transfer counted) ---
    t0 = time.perf_counter()
    host = beam_search_decode(logits, blank=blank, beam_width=W)
    t_host = time.perf_counter() - t0
    print(f"host C++ beam: {t_host*1e3:.1f} ms/batch = {t_host/B*1e3:.2f} ms/sample")

    dev = beam_search_device(logits, blank=blank, beam_width=W)
    agree = sum(h.tolist() == d.tolist() for h, d in zip(host, dev)) / B
    print(f"exact sequence agreement: {agree:.3f}")

    # RTF: audio seconds decoded per wall second (15 s per sample)
    print(f"device decode RTF {B*15.0/per_call:,.0f}x | host decode RTF {B*15.0/t_host:,.0f}x")


if __name__ == "__main__":
    main()
