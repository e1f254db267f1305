"""Incremental (streaming) transcription over an audio feed.

The reference has no streaming story (TorchScript batch inference only;
its docs advise chunking long clips by hand).  This wraps the framework's
overlapped-chunk recipe (:func:`thunder_tpu.module.chunked_transcribe`) in a
push API: feed arbitrary-size sample buffers as they arrive; each chunk is
decoded as soon as its full window (including lookahead overlap) is
available, on the same fixed chunk grid — so ``flush()`` returns *exactly*
what ``predict_long`` / ``chunked_transcribe`` produce for the concatenated
audio (pinned by tests/test_streaming.py).

TPU mapping: every decode call uses the same padded (1, chunk) shape, so one
compiled executable serves the whole stream.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

__all__ = ["StreamingTranscriber"]


class StreamingTranscriber:
    """Push-based transcription built on a ``CTCModule`` or ``InferenceEngine``.

    Args:
        predictor: a ``CTCModule`` or ``InferenceEngine`` (anything whose
            jitted path is reachable via ``_eval_fn``/``_infer`` — both
            expose ``text_transform`` through the module).
        chunk_seconds / overlap_seconds / sample_rate: the chunk grid,
            identical semantics to ``predict_long``.
    """

    def __init__(
        self,
        predictor,
        chunk_seconds: float = 20.0,
        overlap_seconds: float = 2.0,
        sample_rate: int = 16000,
    ):
        from thunder_tpu.engine import InferenceEngine
        from thunder_tpu.module import CTCModule

        if isinstance(predictor, InferenceEngine):
            self._module = predictor.module

            def infer(padded, lengths):
                _, preds, out_lengths = predictor._infer(*predictor._place(padded, lengths))
                return preds, out_lengths

        elif isinstance(predictor, CTCModule):
            self._module = predictor

            def infer(padded, lengths):
                import jax.numpy as jnp

                _, preds, out_lengths = predictor._eval_fn()(
                    predictor.variables, jnp.asarray(padded), jnp.asarray(lengths)
                )
                return preds, out_lengths

        else:
            raise TypeError("predictor must be a CTCModule or InferenceEngine")
        if self._module.text_transform is None:
            raise ValueError("streaming requires a text_transform")
        self._infer = infer
        self.chunk = int(chunk_seconds * sample_rate)
        self.overlap = int(overlap_seconds * sample_rate)
        if self.overlap >= self.chunk:
            raise ValueError("overlap_seconds must be smaller than chunk_seconds")
        self.step = self.chunk - self.overlap
        self._buffer = np.zeros((0,), np.float32)
        self._buffer_start = 0  # absolute sample index of _buffer[0]
        self._next_start = 0  # next chunk-grid position to decode
        self._pieces: List[np.ndarray] = []
        self._closed = False

    # -- internals -----------------------------------------------------

    def _decode_chunk(self, start: int, seg: np.ndarray, last: bool) -> None:
        from thunder_tpu.module import trim_chunk_ids

        seg_len = seg.shape[0]
        padded = np.zeros((1, self.chunk), np.float32)
        padded[0, :seg_len] = seg
        preds, out_lengths = self._infer(padded, np.asarray([seg_len], np.int32))
        ids = np.asarray(preds)[0, : int(np.asarray(out_lengths)[0])]
        self._pieces.append(
            trim_chunk_ids(ids, seg_len, self.overlap, is_first=start == 0, is_last=last)
        )

    def _drain(self, flush: bool = False) -> None:
        total = self._buffer_start + self._buffer.shape[0]
        while True:
            start = self._next_start
            # strict: if the stream ended exactly at start+chunk this would be
            # the final chunk (whose tail must not be trimmed) — defer to flush
            if not flush and start + self.chunk >= total:
                break
            if flush and start >= max(total - self.overlap, 1):
                break
            rel = start - self._buffer_start
            seg = self._buffer[rel : rel + self.chunk]
            if flush and seg.shape[0] == 0:
                break
            last = flush and (start + self.step >= max(total - self.overlap, 1))
            self._decode_chunk(start, seg, last=last)
            self._next_start += self.step
            if flush and last:
                break
        # drop samples no longer needed by any future chunk
        keep_from = self._next_start - self._buffer_start
        if keep_from > 0:
            self._buffer = self._buffer[keep_from:]
            self._buffer_start += keep_from

    # -- public API ----------------------------------------------------

    def push(self, samples) -> str:
        """Append samples; decode any chunk whose window is complete.

        Returns the stable transcript so far (the trailing token is held
        back — it may still merge with the next chunk's first token).
        """
        if self._closed:
            raise RuntimeError("push() after flush()")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, samples])
        self._drain(flush=False)
        return self.partial_text

    def flush(self) -> str:
        """Decode the remaining tail and return the final transcript.

        Equal to ``chunked_transcribe`` over the full concatenated audio.
        """
        if not self._closed:
            self._drain(flush=True)
            self._closed = True
        return self.text

    @property
    def partial_text(self) -> str:
        # cache keyed on completed-chunk count: pushes that complete no chunk
        # (the common small-push case) return in O(1) instead of re-decoding
        # the whole id history
        key = len(self._pieces)
        if getattr(self, "_partial_cache", None) and self._partial_cache[0] == key:
            return self._partial_cache[1]
        ids = self._joined()
        text = (
            ""
            if ids.shape[0] <= 1
            else self._module.text_transform.decode_prediction(ids[None, :-1])[0]
        )
        self._partial_cache = (key, text)
        return text

    @property
    def text(self) -> str:
        ids = self._joined()
        return self._module.text_transform.decode_prediction(ids[None])[0]

    def _joined(self) -> np.ndarray:
        if not self._pieces:
            return np.zeros((0,), np.int32)
        return np.concatenate(self._pieces).astype(np.int32)
