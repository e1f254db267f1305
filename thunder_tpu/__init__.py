"""thunder_tpu: a TPU-native speech recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
scart97/thunder-speech (reference: /root/reference/src/thunder):

- end-to-end CTC speech recognition: audio -> mel filterbank (or wav2vec2)
  preprocessing -> conv/transformer encoder -> CTC decoder -> greedy text,
  prefix beam search (+ shallow-fusion n-gram LM), or streaming push/flush
- NeMo (.nemo) and HuggingFace checkpoint import
- finetuning (frozen encoder schedules, vocab swaps)
- data pipeline with NeMo-manifest datasets

Design stance (TPU-first, not a port):
- pure functions + pytree params; `jax.jit`-compiled batch compute
- channels-last `(batch, time, channels)` layout so the channel dim maps to
  TPU lanes and pointwise convs hit the MXU
- `(array, lengths)` pairs + masks as the universal variable-length story
  (replaces TorchScript dynamism in the reference)
- host-side text/audio I/O; device-side everything else
- scaling via `jax.sharding.Mesh` + NamedSharding (data/model axes)
"""

__version__ = "0.1.0"

from thunder_tpu import ops  # noqa: F401

_LAZY = {
    "load_pretrained": "thunder_tpu.registry",
    "CTCModule": "thunder_tpu.module",
    "finetune_ctc_module": "thunder_tpu.finetune",
    "InferenceEngine": "thunder_tpu.engine",
    "Trainer": "thunder_tpu.training",
    "StreamingTranscriber": "thunder_tpu.streaming",
    "StreamingPool": "thunder_tpu.streaming",
    "NGramLM": "thunder_tpu.text.lm",
    "ArpaLM": "thunder_tpu.text.lm",
    "WordFusionLM": "thunder_tpu.text.word_fusion",
    "WordNGramLM": "thunder_tpu.text.word_fusion",
}


def __getattr__(name):
    # lazy top-level conveniences without paying import cost up front
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'thunder_tpu' has no attribute {name!r}")
