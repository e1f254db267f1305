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

__all__ = ["StreamingTranscriber", "StreamingPool"]


def _make_infer(predictor):
    """(module, infer_fn) from a CTCModule or InferenceEngine.

    ``infer_fn(padded (B, chunk), lengths (B,)) -> (logits, preds,
    out_lengths)`` — batch-size agnostic (B=1 for a lone stream, the pool
    batch for concurrent streams)."""
    from thunder_tpu.engine import InferenceEngine
    from thunder_tpu.module import CTCModule

    if isinstance(predictor, InferenceEngine):

        def infer(padded, lengths):
            return predictor._infer(*predictor._place(padded, lengths))

        return predictor.module, infer
    if isinstance(predictor, CTCModule):

        def infer(padded, lengths):
            import jax.numpy as jnp

            return predictor._eval_fn()(
                predictor.variables, jnp.asarray(padded), jnp.asarray(lengths)
            )

        return predictor, infer
    raise TypeError("predictor must be a CTCModule or InferenceEngine")


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
        beam_backend: ``"host"`` (default; in-search LM shallow fusion) or
            ``"device"`` — the carried beam state stays on the accelerator
            between chunks (:func:`thunder_tpu.ops.ctc_beam_device.
            beam_search_device_stream`) and the logits never cross the
            device->host link.  An ``lm`` on the device backend ranks the
            carried beam on the host continuously (on-the-fly rescoring:
            partial rankings reflect the LM on every chunk, with word
            fusion's completion lookahead live and its pending-word
            finalization at flush).
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
        beam_backend: Optional[str] = None,
        **beam_kwargs,
    ):
        if beam_backend is not None and not beam_width:
            raise TypeError("beam-search arguments without beam_width: ['beam_backend']")
        check_beam_args(beam_width, beam_kwargs, prune_logp=prune_logp, lm=lm, lm_weight=lm_weight)
        from thunder_tpu.module import check_device_beam_kwargs

        check_device_beam_kwargs(beam_backend, lm, beam_kwargs)
        self.beam_backend = beam_backend
        self._module, self._infer = _make_infer(predictor)
        if self._module.text_transform is None:
            raise ValueError("streaming requires a text_transform")
        self.chunk = int(chunk_seconds * sample_rate)
        self.overlap = int(overlap_seconds * sample_rate)
        if self.overlap >= self.chunk:
            raise ValueError("overlap_seconds must be smaller than chunk_seconds")
        self.step = self.chunk - self.overlap
        self.beam_width = beam_width
        if beam_width:
            self._beam_kwargs = dict(beam_kwargs)
            self._beam_kwargs["prune_logp"] = -12.0 if prune_logp is _BEAM_UNSET else prune_logp
            if beam_backend != "device":
                self._beam_kwargs["lm"] = lm
                self._beam_kwargs["lm_weight"] = 0.5 if lm_weight is _BEAM_UNSET else lm_weight
            else:
                # the LM never enters the device search — it ranks the
                # carried beam on the host, continuously (best_ranked on
                # every partial and at flush)
                self._device_lm = lm
                self._device_lm_weight = 0.5 if lm_weight is _BEAM_UNSET else lm_weight
        self._beam_state = None
        self._buffer = np.zeros((0,), np.float32)
        self._buffer_start = 0  # absolute sample index of _buffer[0]
        self._next_start = 0  # next chunk-grid position to decode
        self._pieces: List[np.ndarray] = []
        self._chunks_done = 0
        self._closed = False

    # -- internals -----------------------------------------------------

    def _decode_chunk(self, start: int, seg: np.ndarray, last: bool) -> None:
        seg_len = seg.shape[0]
        padded = np.zeros((1, self.chunk), np.float32)
        padded[0, :seg_len] = seg
        logits, preds, out_lengths = self._infer(padded, np.asarray([seg_len], np.int32))
        n = int(np.asarray(out_lengths)[0])
        # greedy only reads preds — don't pay the (frames, vocab) logits
        # device->host transfer unless the HOST beam needs them (the device
        # beam consumes the live device row)
        if self.beam_width:
            logits_row = logits[0] if self.beam_backend == "device" else np.asarray(logits)[0]
        else:
            logits_row = None
        self._apply_chunk(start, seg_len, last, logits_row, np.asarray(preds)[0], n)

    def _apply_chunk(
        self, start: int, seg_len: int, last: bool, logits_row, preds_row, n: int
    ) -> None:
        """Advance the decode state with one chunk's model outputs.

        Split from the inference call so a pool can batch chunks from many
        streams into one device call and feed each stream its row."""
        from thunder_tpu.module import trim_chunk_ids

        if self.beam_width and self.beam_backend == "device":
            from thunder_tpu.ops.ctc_beam_device import beam_search_device_stream

            win = logits_row[:n]  # device array (or np from a pool drain)
            win = trim_chunk_ids(win, seg_len, self.overlap, is_first=start == 0, is_last=last)
            self._beam_state = beam_search_device_stream(
                win[None],
                blank=self._module.blank_idx,
                beam_width=self.beam_width,
                state=self._beam_state,
                **self._beam_kwargs,
            )
        elif self.beam_width:
            from thunder_tpu.ops.ctc_beam import beam_search_stream, log_softmax

            win = np.asarray(logits_row, np.float32)[:n]
            win = trim_chunk_ids(win, seg_len, self.overlap, is_first=start == 0, is_last=last)
            self._beam_state = beam_search_stream(
                log_softmax(win),
                self._module.blank_idx,
                beam_width=self.beam_width,
                state=self._beam_state,
                **self._beam_kwargs,
            )
        else:
            ids = np.asarray(preds_row)[:n]
            self._pieces.append(
                trim_chunk_ids(ids, seg_len, self.overlap, is_first=start == 0, is_last=last)
            )
        self._chunks_done += 1

    def _take_ready(self, flush: bool = False):
        """Pop every chunk whose window is complete: ``[(start, seg, last)]``.

        Advances the grid position and trims the buffer; the caller must then
        decode each chunk in order (``_decode_chunk`` inline, or batched
        across streams via ``_apply_chunk``)."""
        total = self._buffer_start + self._buffer.shape[0]
        ready = []
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
            ready.append((start, seg, last))
            self._next_start += self.step
            if flush and last:
                break
        # drop samples no longer needed by any future chunk (the extracted
        # segs reference the OLD buffer array, so they stay valid)
        keep_from = self._next_start - self._buffer_start
        if keep_from > 0:
            self._buffer = self._buffer[keep_from:]
            self._buffer_start += keep_from
        return ready

    def _drain(self, flush: bool = False) -> None:
        for start, seg, last in self._take_ready(flush):
            self._decode_chunk(start, seg, last=last)

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
            if self.beam_backend == "device":
                # continuous LM-aware ranking of the carried device beam:
                # partial_score lookahead live, final_score at flush (same
                # finalization semantics as the host stream)
                bests = self._beam_state.best_ranked(
                    self._device_lm, self._device_lm_weight, final=self._closed
                )
                return bests[0] if bests else np.zeros((0,), np.int32)
            if self._closed:
                # flush = the finalization point: word fusion's pending-
                # partial-word bonus joins the ranking (== predict_long)
                return self._beam_state.best_final(
                    self._beam_kwargs.get("lm"), self._beam_kwargs.get("lm_weight", 0.0)
                )
            # live: rank with word fusion's completion lookahead so the
            # in-flight trailing word carries its best-case LM/hotword
            # evidence (display-only; carried state untouched)
            return self._beam_state.best_partial(
                self._beam_kwargs.get("lm"), self._beam_kwargs.get("lm_weight", 0.0)
            )
        if not self._pieces:
            return np.zeros((0,), np.int32)
        return np.concatenate(self._pieces).astype(np.int32)


class StreamingPool:
    """Concurrent streaming transcription: many live feeds, batched chunks.

    Each stream keeps its own chunk grid and decode state (an internal
    :class:`StreamingTranscriber`), but whenever pushes complete chunk
    windows — across ANY streams — the pool runs them through the model as
    ONE padded ``(batch_size, chunk)`` call instead of one call per chunk.
    Per-stream transcripts are exactly what a lone ``StreamingTranscriber``
    would produce (pinned by tests/test_streaming.py); the win is device
    utilization when serving many concurrent feeds: one executable, one
    dispatch per drain, MXU-sized batches.

    Args:
        predictor: shared ``CTCModule`` or ``InferenceEngine``.
        batch_size: chunks per device call; ready chunks are processed in
            groups padded to exactly this size (one compiled executable).
        chunk_seconds / overlap_seconds / sample_rate / beam_width /
            beam kwargs: per-stream decode settings, as in
            :class:`StreamingTranscriber`.
    """

    def __init__(
        self,
        predictor,
        batch_size: int = 8,
        chunk_seconds: float = 20.0,
        overlap_seconds: float = 2.0,
        sample_rate: int = 16000,
        beam_width: Optional[int] = None,
        **beam_kwargs,
    ):
        import threading

        if batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        # fail at the faulty call site, not at the first open()
        check_beam_args(beam_width, dict(beam_kwargs))
        self._module, self._infer = _make_infer(predictor)
        self._predictor = predictor
        self._batch = batch_size
        self._beam_width = beam_width
        self._stream_kwargs = dict(
            chunk_seconds=chunk_seconds,
            overlap_seconds=overlap_seconds,
            sample_rate=sample_rate,
            beam_width=beam_width,
            **beam_kwargs,
        )
        self._streams: dict = {}
        self._pending: List[tuple] = []  # (stream, start, seg, last) FIFO
        self._next_id = 0
        # server handlers drive feeds from separate threads; the shared
        # pending queue and per-stream state advance under one lock
        self._lock = threading.RLock()

    def open(self, stream_id=None):
        """Register a new stream; returns its id (auto-assigned if None)."""
        with self._lock:
            if stream_id is None:
                # skip over any user-chosen ids so mixing styles never collides
                while self._next_id in self._streams:
                    self._next_id += 1
                stream_id = self._next_id
                self._next_id += 1
            if stream_id in self._streams:
                raise ValueError(f"stream {stream_id!r} already open")
            self._streams[stream_id] = StreamingTranscriber(
                self._predictor, **self._stream_kwargs
            )
            return stream_id

    def _stream(self, stream_id) -> StreamingTranscriber:
        st = self._streams.get(stream_id)
        if st is None:
            raise KeyError(f"unknown stream {stream_id!r} (open() it first)")
        return st

    def _process(self, work) -> None:
        """Run ``[(stream, start, seg, last)]`` in batched device calls.

        Chunks keep their listed order (a stream's beam state is sequential);
        every batch is padded to exactly ``batch_size`` rows so one compiled
        executable serves the whole pool."""
        chunk = None
        for i in range(0, len(work), self._batch):
            group = work[i : i + self._batch]
            if chunk is None:
                chunk = group[0][0].chunk
            padded = np.zeros((self._batch, chunk), np.float32)
            lengths = np.zeros((self._batch,), np.int32)
            for row, (_, _, seg, _) in enumerate(group):
                padded[row, : seg.shape[0]] = seg
                lengths[row] = seg.shape[0]
            logits, preds, out_lengths = self._infer(padded, lengths)
            # greedy pools never read logits — skip the (B, frames, vocab)
            # device->host transfer on the serving hot path; the device beam
            # backend keeps them as live device rows
            if not self._beam_width:
                logits = None
            elif self._stream_kwargs.get("beam_backend") != "device":
                logits = np.asarray(logits)
            preds = np.asarray(preds)
            out_lengths = np.asarray(out_lengths)
            for row, (st, start, seg, last) in enumerate(group):
                st._apply_chunk(
                    start, seg.shape[0], last,
                    logits[row] if logits is not None else None,
                    preds[row], int(out_lengths[row]),
                )

    def push(self, stream_id, samples) -> str:
        """Append samples to one stream; completed chunk windows join the
        pool's pending queue, which auto-drains in full ``batch_size``
        device calls.  Returns the stream's stable transcript as of the last
        drain (call :meth:`drain` to force pending chunks through)."""
        with self._lock:
            st = self._stream(stream_id)
            samples = np.asarray(samples, np.float32).reshape(-1)
            st._buffer = np.concatenate([st._buffer, samples])
            self._pending.extend(
                (st, start, seg, last) for start, seg, last in st._take_ready(False)
            )
            while len(self._pending) >= self._batch:
                group = self._pending[: self._batch]
                del self._pending[: self._batch]
                self._process(group)
            return st.partial_text

    def drain(self) -> None:
        """Run every pending chunk now (a final, possibly partial batch)."""
        with self._lock:
            if self._pending:
                pending, self._pending = self._pending, []
                self._process(pending)

    def flush(self, stream_id) -> str:
        """Finalize one stream and return its transcript (stream closes).

        Drains ALL pending chunks first (order across streams is FIFO), then
        decodes this stream's tail."""
        with self._lock:
            st = self._stream(stream_id)
            self.drain()
            self._process([(st, start, seg, last) for start, seg, last in st._take_ready(True)])
            st._closed = True
            del self._streams[stream_id]
            return st.text

    def partial_text(self, stream_id) -> str:
        with self._lock:
            return self._stream(stream_id).partial_text
