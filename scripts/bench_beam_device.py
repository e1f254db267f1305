"""On-chip A/B: device CTC prefix beam search (Pallas kernel vs XLA scan)
vs the host C++ runtime.

Measures batch beam decode at serving shapes (QuartzNet-style: T frames of a
15 s utterance at 10 ms hop / stride 2, V=29) with realistic peaked logits
(~70% blank frames, matching docs/benchmarks.md's host-runtime setup).

Relay discipline (see .claude/skills/verify/SKILL.md): the relay DEDUPES
identical in-flight computations and `block_until_ready` does not sync, so
each chained call multiplies its input by (1 + 1e-6·i) and the chain ends
with ONE small fetch; per-call cost is the best-of-2 long-chain average.
(An earlier version of this script fetched the token matrix inside the timed
loop — that measures the relay's ~30 MB/s device->host link, not the search.)

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
    import jax.numpy as jnp

    from thunder_tpu.ops.ctc_beam import beam_search_decode
    from thunder_tpu.ops.ctc_beam_device import _beam_batch, _beam_batch_pallas, beam_search_device

    B, T, V, W = 64, 751, 29, 16
    blank = V - 1
    rng = np.random.default_rng(0)
    np_logits = peaked_logits(rng, B, T, V, blank)
    logits = jnp.asarray(np_logits)
    lengths = jnp.full((B,), T, jnp.int32)
    floor = jnp.float32(-12.0)
    print(f"backend={jax.default_backend()} B={B} T={T} V={V} beam={W}")

    # --- correctness: both device paths vs the host search ---
    host_t0 = time.perf_counter()
    host = beam_search_decode(np_logits, blank=blank, beam_width=W, max_tokens_per_step=None)
    t_host = time.perf_counter() - host_t0
    pal = beam_search_device(logits, blank=blank, beam_width=W, max_tokens_per_step=None, use_pallas=True)
    scan = beam_search_device(logits, blank=blank, beam_width=W, max_tokens_per_step=None, use_pallas=False)
    print("agreement pallas/host:", sum(h.tolist() == p.tolist() for h, p in zip(host, pal)) / B)
    print("agreement scan/host  :", sum(h.tolist() == s.tolist() for h, s in zip(host, scan)) / B)

    def bench(fn, kw, tag, N=32):
        out = fn(logits, lengths, floor, **kw)
        np.asarray(out[1])
        best = 1e9
        for trial in range(2):
            t0 = time.perf_counter()
            out = None
            for i in range(N):
                out = fn(logits * (1 + 1e-6 * (i + N * trial)), lengths, floor, **kw)
            np.asarray(out[1])  # one small (B, n_out) fetch syncs the chain
            best = min(best, (time.perf_counter() - t0) / N)
        print(f"{tag:12s}: {best*1e3:7.2f} ms/batch = {best/B*1e3:.3f} ms/sample"
              f" -> decode RTF {B*15/best:,.0f}x")
        return best

    bench(_beam_batch_pallas, dict(blank=blank, beam_width=W, n_out=1, interpret=False), "device pallas")
    bench(_beam_batch, dict(blank=blank, beam_width=W, k_tokens=V, n_out=1), "device scan")
    print(f"host C++ 1core: {t_host*1e3:7.1f} ms/batch = {t_host/B*1e3:.2f} ms/sample"
          f" -> decode RTF {B*15/t_host:,.0f}x")


if __name__ == "__main__":
    main()
