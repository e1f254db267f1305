"""Incremental (streaming) transcription over an audio feed.

The reference has no streaming story (TorchScript batch inference only;
its docs advise chunking long clips by hand).  This wraps the framework's
overlapped-chunk recipe (:func:`thunder_tpu.module.chunked_transcribe`) in a
push API: feed arbitrary-size sample buffers as they arrive; each chunk is
decoded as soon as its full window (including lookahead overlap) is
available, on the same fixed chunk grid — so ``flush()`` returns *exactly*
what ``predict_long`` / ``chunked_transcribe`` produce for the concatenated
audio (pinned by tests/test_streaming.py).

With ``beam_width`` the stream runs ONE continuous prefix beam search: each
chunk's trimmed log-prob window advances carried beam state
(:func:`thunder_tpu.ops.ctc_beam.beam_search_stream`), so boundary-straddling
tokens merge exactly as in a full-utterance search, and ``flush()`` equals
``predict_long(beam_width=...)``.

TPU mapping: every decode call uses the same padded (1, chunk) shape, so one
compiled executable serves the whole stream.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from thunder_tpu.module import _BEAM_UNSET, check_beam_args

__all__ = ["StreamingTranscriber"]


class StreamingTranscriber:
    """Push-based transcription built on a ``CTCModule`` or ``InferenceEngine``.

    Args:
        predictor: a ``CTCModule`` or ``InferenceEngine`` (anything whose
            jitted path is reachable via ``_eval_fn``/``_infer`` — both
            expose ``text_transform`` through the module).
        chunk_seconds / overlap_seconds / sample_rate: the chunk grid,
            identical semantics to ``predict_long``.
        beam_width: decode with carried-state prefix beam search instead of
            the greedy id-stitch; ``prune_logp``/``lm``/``lm_weight`` and
            further beam kwargs match ``predict``'s beam arguments.
    """

    def __init__(
        self,
        predictor,
        chunk_seconds: float = 20.0,
        overlap_seconds: float = 2.0,
        sample_rate: int = 16000,
        beam_width: Optional[int] = None,
        prune_logp: float = _BEAM_UNSET,
        lm=None,
        lm_weight: float = _BEAM_UNSET,
        **beam_kwargs,
    ):
        from thunder_tpu.engine import InferenceEngine
        from thunder_tpu.module import CTCModule

        check_beam_args(beam_width, beam_kwargs, prune_logp=prune_logp, lm=lm, lm_weight=lm_weight)
        if isinstance(predictor, InferenceEngine):
            self._module = predictor.module

            def infer(padded, lengths):
                return predictor._infer(*predictor._place(padded, lengths))

        elif isinstance(predictor, CTCModule):
            self._module = predictor

            def infer(padded, lengths):
                import jax.numpy as jnp

                return predictor._eval_fn()(
                    predictor.variables, jnp.asarray(padded), jnp.asarray(lengths)
                )

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
        self.beam_width = beam_width
        if beam_width:
            self._beam_kwargs = dict(beam_kwargs)
            self._beam_kwargs["prune_logp"] = -12.0 if prune_logp is _BEAM_UNSET else prune_logp
            self._beam_kwargs["lm"] = lm
            self._beam_kwargs["lm_weight"] = 0.5 if lm_weight is _BEAM_UNSET else lm_weight
        self._beam_state = None
        self._buffer = np.zeros((0,), np.float32)
        self._buffer_start = 0  # absolute sample index of _buffer[0]
        self._next_start = 0  # next chunk-grid position to decode
        self._pieces: List[np.ndarray] = []
        self._chunks_done = 0
        self._closed = False

    # -- internals -----------------------------------------------------

    def _decode_chunk(self, start: int, seg: np.ndarray, last: bool) -> None:
        from thunder_tpu.module import trim_chunk_ids

        seg_len = seg.shape[0]
        padded = np.zeros((1, self.chunk), np.float32)
        padded[0, :seg_len] = seg
        logits, preds, out_lengths = self._infer(padded, np.asarray([seg_len], np.int32))
        n = int(np.asarray(out_lengths)[0])
        if self.beam_width:
            from thunder_tpu.ops.ctc_beam import beam_search_stream, log_softmax

            win = np.asarray(logits, np.float32)[0, :n]
            win = trim_chunk_ids(win, seg_len, self.overlap, is_first=start == 0, is_last=last)
            self._beam_state = beam_search_stream(
                log_softmax(win),
                self._module.blank_idx,
                beam_width=self.beam_width,
                state=self._beam_state,
                **self._beam_kwargs,
            )
        else:
            ids = np.asarray(preds)[0, :n]
            self._pieces.append(
                trim_chunk_ids(ids, seg_len, self.overlap, is_first=start == 0, is_last=last)
            )
        self._chunks_done += 1

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
        back — it may still merge with the next chunk's first token, and in
        beam mode the beam may still revise it).
        """
        if self._closed:
            raise RuntimeError("push() after flush()")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, samples])
        self._drain(flush=False)
        return self.partial_text

    def flush(self) -> str:
        """Decode the remaining tail and return the final transcript.

        Equal to ``chunked_transcribe`` over the full concatenated audio —
        greedy and beam modes alike.
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
        key = self._chunks_done
        if getattr(self, "_partial_cache", None) and self._partial_cache[0] == key:
            return self._partial_cache[1]
        ids = self._joined()
        text = (
            ""
            if ids.shape[0] <= 1
            else self._decode(ids[:-1])
        )
        self._partial_cache = (key, text)
        return text

    @property
    def text(self) -> str:
        return self._decode(self._joined())

    def _decode(self, ids: np.ndarray) -> str:
        if self.beam_width:
            # beam prefixes are already collapsed label sequences
            return self._module.text_transform.decode_prediction(
                ids[None].astype(np.int64), remove_repeated=False
            )[0]
        return self._module.text_transform.decode_prediction(ids[None])[0]

    def _joined(self) -> np.ndarray:
        if self.beam_width:
            if self._beam_state is None:
                return np.zeros((0,), np.int32)
            if self._closed:
                # flush = the finalization point: word fusion's pending-
                # partial-word bonus joins the ranking (== predict_long)
                return self._beam_state.best_final(
                    self._beam_kwargs.get("lm"), self._beam_kwargs.get("lm_weight", 0.0)
                )
            return self._beam_state.best
        if not self._pieces:
            return np.zeros((0,), np.int32)
        return np.concatenate(self._pieces).astype(np.int32)
