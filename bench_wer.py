"""Executed-WER benchmark artifact (companion to bench.py's RTF line).

The BASELINE north star is "RTF >= 500x ... WER parity"; the golden-corpus
half needs network-fetched checkpoints (tests/test_golden_checkpoints.py,
THUNDER_FIXTURES), which this environment cannot reach.  This benchmark
records the strongest *executable* WER evidence instead: the full training
system (frontend -> masked-BN QuartzNet -> CTC -> greedy decode -> WER
metric) must LEARN on hardware — synthetic tone-coded speech from random
init to near-zero WER.  A broken loss, decoder, metric, or train loop fails
the gate; the number is a real measured WER on a held-out split.

Prints ONE json line: {"metric", "value", "unit", ...}.
"""

from __future__ import annotations

import json
import sys


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    sys.path.insert(0, "examples")
    from synthetic_learning_demo import run

    on_tpu = jax.default_backend() not in ("cpu",)
    result = run(
        max_epochs=6 if on_tpu else 1,
        n_items=2048 if on_tpu else 64,
    )
    print(
        json.dumps(
            {
                "metric": "wer_synthetic_heldout_quartznet_small",
                "value": result["final_wer"],
                "unit": "wer",
                "first_epoch_wer": result["first_wer"],
                "final_cer": result["final_cer"],
                "epochs": 6 if on_tpu else 1,
                "wall_seconds": result["wall_seconds"],
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
