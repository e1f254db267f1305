"""Batch collation with static-shape padding buckets.

The reference collate (`/root/reference/src/thunder/data/dataloader_utils.py:
17-33`) sorts by length and pads to the batch max — fine for eager torch, but
every new max length would recompile a jitted TPU program.  Here batches pad
up to a small set of bucket widths (multiples of ``pad_multiple``) so the
number of compiled executables stays bounded while masks keep the math exact
(see the bucket-invariance test, tests/quartznet/test_encoders.py).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

__all__ = ["asr_collate", "bucket_length"]


def bucket_length(n: int, pad_multiple: int) -> int:
    """Round up to the padding bucket — the single source of truth shared
    with serving (``module.pad_to_bucket`` delegates here) so loading and
    inference buckets can never diverge."""
    return max(pad_multiple, -(-n // pad_multiple) * pad_multiple)


def asr_collate(
    samples: Sequence[Tuple[np.ndarray, str]], pad_multiple: int = 16000
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Collate (audio, text) samples -> (padded audio, lengths, texts).

    Samples are sorted by descending length (reference behavior) and padded
    to the bucket width.
    """
    samples = sorted(samples, key=lambda s: s[0].shape[-1], reverse=True)
    audios = [np.asarray(s[0]).reshape(-1) for s in samples]
    lengths = np.asarray([a.shape[-1] for a in audios], dtype=np.int32)
    width = bucket_length(int(lengths.max(initial=1)), pad_multiple)
    batch = np.zeros((len(audios), width), dtype=np.float32)
    for i, a in enumerate(audios):
        batch[i, : a.shape[-1]] = a
    texts = [s[1] for s in samples]
    return batch, lengths, texts
