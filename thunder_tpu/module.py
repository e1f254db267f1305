"""CTCModule: the user-facing model container (reference ``BaseCTCModule``).

Functional rebuild of `/root/reference/src/thunder/module.py:25-189` for
JAX/TPU:

- the compute graph is one flax module (``CTCModel`` = audio_transform ->
  encoder -> decoder) applied by jitted functions with static shapes;
- variable-length audio is handled by padding buckets + masks instead of
  TorchScript dynamism (`SURVEY.md §5.7`);
- train/val steps live in :mod:`thunder_tpu.training` (optax), metrics in
  :mod:`thunder_tpu.training.metrics`;
- "export" is the jitted apply function itself (plus ``jax.export`` AOT in
  :mod:`thunder_tpu.export`), not a scripted graph.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from thunder_tpu.ops.ctc import calculate_ctc, collapse_ctc
from thunder_tpu.text.transform import BatchTextTransformer

__all__ = ["CTCModel", "CTCModule", "pad_to_bucket", "chunked_transcribe"]

#: sentinel distinguishing "caller passed a value" from the documented default,
#: so beam-only kwargs raise without beam_width instead of silently running greedy
_BEAM_UNSET = object()


def check_beam_args(beam_width, beam_kwargs, prune_logp=_BEAM_UNSET, lm=None, lm_weight=_BEAM_UNSET):
    """Raise TypeError when beam-search-only arguments arrive without beam_width.

    Shared by ``CTCModule.predict``/``predict_long`` and the engine's
    equivalents so short and long audio behave identically.
    """
    if beam_width:
        return
    stray = sorted(beam_kwargs or ())
    if prune_logp is not _BEAM_UNSET:
        stray.append("prune_logp")
    if lm is not None:
        stray.append("lm")
    if lm_weight is not _BEAM_UNSET:
        stray.append("lm_weight")
    if stray:
        raise TypeError(f"beam-search arguments without beam_width: {sorted(stray)}")


def check_device_beam_kwargs(backend, lm, beam_kwargs, allowed=("max_tokens_per_step",)):
    """Validate a device-backend beam configuration.

    Single source of truth for the two checks (stray-kwarg whitelist,
    unknown-backend) shared by ``predict``/``run_beam_decode``,
    ``chunked_transcribe``/``predict_long``, and the streaming transcriber —
    so the contract cannot drift between the entry points.

    ``lm`` with the device backend is supported as continuous on-the-fly
    rescoring (the acoustic search runs on the accelerator; every surviving
    beam is LM-ranked on the host via
    :func:`thunder_tpu.ops.ctc_beam_device.lm_prefix_score`).  Unlike the
    host backend's in-search shallow fusion, the LM does not influence which
    beams survive pruning — with enough ``beam_width`` the two agree.
    """
    if backend == "device":
        stray = sorted(set(beam_kwargs or ()) - set(allowed))
        if stray:
            raise ValueError(f"beam_backend='device' does not support: {stray}")
    elif backend not in (None, "host"):
        raise ValueError(f"unknown beam_backend: {backend!r} (use 'host' or 'device')")


def run_beam_decode(
    logits,
    out_lengths,
    *,
    blank: int,
    text_transform,
    beam_width: int,
    nbest: Optional[int],
    prune_logp: float,
    lm,
    lm_weight: float,
    backend: Optional[str] = None,
    beam_kwargs: Optional[dict] = None,
    mesh=None,
    data_axis: str = "data",
):
    """Shared beam-decode tail for :meth:`CTCModule.predict` and the serving
    engine's ``predict``: logits -> transcriptions (or, with ``nbest``,
    ranked ``(text, log_prob)`` pairs per sample).

    ``backend`` selects where the search runs:

    - ``"host"`` (default) — ops/ctc_beam.py (C++ runtime when available,
      numpy reference otherwise); in-search LM shallow fusion.
    - ``"device"`` — the jitted on-accelerator search
      (:func:`thunder_tpu.ops.ctc_beam_device.beam_search_device`); the
      ``(B, T, V)`` logits never cross the device->host link and the decode
      scales with the chip instead of host cores.  With ``lm``, the full
      surviving beam is LM-ranked on the host (on-the-fly rescoring — see
      ``check_device_beam_kwargs``).
    """
    kw = dict(beam_kwargs or {})
    check_device_beam_kwargs(backend, lm, kw)
    if backend == "device":
        from thunder_tpu.ops.ctc_beam_device import beam_search_device

        hyps = beam_search_device(
            logits,
            out_lengths,
            blank=blank,
            beam_width=beam_width,
            prune_logp=prune_logp,
            nbest=nbest,
            mesh=mesh,
            data_axis=data_axis,
            lm=lm,
            lm_weight=lm_weight,
            **kw,
        )
    elif nbest is not None:
        from thunder_tpu.ops.ctc_beam import beam_search_nbest

        hyps = beam_search_nbest(
            np.asarray(logits, np.float32),
            np.asarray(out_lengths),
            blank=blank,
            beam_width=beam_width,
            nbest=nbest,
            prune_logp=prune_logp,
            lm=lm,
            lm_weight=lm_weight,
            **kw,
        )
    else:
        from thunder_tpu.ops.ctc_beam import beam_search_decode

        hyps = beam_search_decode(
            np.asarray(logits, np.float32),
            np.asarray(out_lengths),
            blank=blank,
            beam_width=beam_width,
            prune_logp=prune_logp,
            lm=lm,
            lm_weight=lm_weight,
            **kw,
        )
    tt = text_transform
    if nbest is not None:
        return [
            [
                (tt.decode_prediction(ids[None], remove_repeated=False)[0] if len(ids) else "", score)
                for ids, score in sample
            ]
            for sample in hyps
        ]
    return [tt.decode_prediction(h[None], remove_repeated=False)[0] if len(h) else "" for h in hyps]


def trim_chunk_ids(ids, seg_len: int, overlap: int, is_first: bool, is_last: bool):
    """Drop half the overlap's frames from interior chunk boundaries.

    The single source of truth for the overlapped-chunk stitch arithmetic —
    shared by :func:`chunked_transcribe` and
    :class:`thunder_tpu.streaming.StreamingTranscriber` (whose contract is
    exact equality with the batch path).
    """
    fps = ids.shape[0] / max(seg_len, 1)
    trim = int(overlap / 2 * fps)
    lo = 0 if is_first else trim
    hi = ids.shape[0] - trim if (not is_last and trim > 0) else ids.shape[0]
    return ids[lo:hi]


def chunked_transcribe(
    infer_fn,
    text_transform,
    audio,
    chunk_seconds: float = 20.0,
    overlap_seconds: float = 2.0,
    sample_rate: int = 16000,
    short_path=None,
    logits_fn=None,
    blank_idx: Optional[int] = None,
    beam_width: Optional[int] = None,
    beam_kwargs: Optional[dict] = None,
):
    """Overlapped-chunk decoding of long audio.

    ``infer_fn(padded_audio, lengths) -> (pred_ids, out_lengths)``; interior
    chunk boundaries drop half the overlap's frames on each side, the id
    streams are stitched and collapsed once (greedy — exact reference
    semantics).

    With ``beam_width`` (requires ``logits_fn(padded, lengths) ->
    (logits, out_lengths)`` and ``blank_idx``), the trimmed frame windows are
    decoded as ONE continuous prefix beam search: each window is searched
    seeded with the previous window's surviving beams
    (:func:`thunder_tpu.ops.ctc_beam.beam_search_stream`), so a token
    straddling a chunk boundary merges exactly as in a full-utterance search
    — the beam analogue of the greedy id-stitch, with the same guarantee
    (equal to the unchunked decode whenever the windows' log-probs tile the
    full utterance's).  ``beam_kwargs["beam_backend"]="device"`` runs the
    same continuous search on the accelerator
    (:func:`thunder_tpu.ops.ctc_beam_device.beam_search_device_stream`; the
    carried state stays on the device between windows, and an ``lm`` ranks
    the carried beam on the host — continuous on-the-fly rescoring).
    """
    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    chunk = int(chunk_seconds * sample_rate)
    overlap = int(overlap_seconds * sample_rate)
    if overlap >= chunk:
        raise ValueError(
            f"overlap_seconds ({overlap_seconds}) must be smaller than "
            f"chunk_seconds ({chunk_seconds}) — the chunk grid would drop audio"
        )
    if audio.shape[0] <= chunk and short_path is not None:
        return short_path(audio)
    step = chunk - overlap
    starts = list(range(0, max(audio.shape[0] - overlap, 1), step))
    use_beam = bool(beam_width)
    if use_beam and (logits_fn is None or blank_idx is None):
        raise ValueError("beam_width requires logits_fn and blank_idx")
    kw = dict(beam_kwargs or {})
    backend = kw.pop("beam_backend", None)
    check_device_beam_kwargs(
        backend, kw.get("lm"), kw,
        allowed=("prune_logp", "max_tokens_per_step", "lm", "lm_weight"),
    )
    # device stream: the LM never enters the accelerator search — it ranks
    # the carried beam on the host at the end (DeviceBeamState.best_ranked)
    device_lm = kw.pop("lm", None) if backend == "device" else None
    device_lm_weight = kw.pop("lm_weight", 0.5) if backend == "device" else 0.0
    pieces = []
    beam_state = None
    for idx, start in enumerate(starts):
        seg = audio[start : start + chunk]
        seg_len = seg.shape[0]
        padded = np.zeros((1, chunk), dtype=np.float32)
        padded[0, :seg_len] = seg
        first, last = idx == 0, idx == len(starts) - 1
        if use_beam and backend == "device":
            logits, out_lengths = logits_fn(padded, np.asarray([seg_len], dtype=np.int32))
            # slice/trim on device — the logits never cross to the host
            win = logits[0, : int(np.asarray(out_lengths)[0])]
            win = trim_chunk_ids(win, seg_len, overlap, is_first=first, is_last=last)
            from thunder_tpu.ops.ctc_beam_device import beam_search_device_stream

            # pad frames to a bucket and pass the true length so the kernel
            # compiles once per bucket, not once per distinct tail length
            n_win = win.shape[0]
            bucket = max(64, -(-n_win // 64) * 64)
            if bucket != n_win:
                win = jnp.pad(win, ((0, bucket - n_win), (0, 0)))
            beam_state = beam_search_device_stream(
                win[None], lengths=[n_win], blank=blank_idx,
                beam_width=beam_width, state=beam_state, **kw,
            )
        elif use_beam:
            logits, out_lengths = logits_fn(padded, np.asarray([seg_len], dtype=np.int32))
            win = np.asarray(logits, np.float32)[0, : int(np.asarray(out_lengths)[0])]
            win = trim_chunk_ids(win, seg_len, overlap, is_first=first, is_last=last)
            from thunder_tpu.ops.ctc_beam import beam_search_stream, log_softmax

            beam_state = beam_search_stream(
                log_softmax(win), blank_idx, beam_width=beam_width,
                state=beam_state, **kw,
            )
        else:
            preds, out_lengths = infer_fn(padded, np.asarray([seg_len], dtype=np.int32))
            ids = np.asarray(preds)[0, : int(np.asarray(out_lengths)[0])]
            pieces.append(trim_chunk_ids(ids, seg_len, overlap, is_first=first, is_last=last))
    if use_beam and backend == "device":
        bests = (
            beam_state.best_ranked(device_lm, device_lm_weight, final=True)
            if beam_state is not None
            else []
        )
        best = bests[0] if bests else np.zeros((0,), np.int32)
        return text_transform.decode_prediction(best[None].astype(np.int64), remove_repeated=False)[0]
    if use_beam:
        # the carried search's best prefix is already a collapsed label
        # sequence; end of utterance = the finalization point (word fusion's
        # pending-partial bonus joins the ranking here, same as flush())
        # 0.5 mirrors beam_search_stream's lm_weight default (the weight the
        # windows were searched with)
        best = beam_state.best_final(kw.get("lm"), kw.get("lm_weight", 0.5))
        return text_transform.decode_prediction(best[None].astype(np.int64), remove_repeated=False)[0]
    joined = np.concatenate(pieces)
    return text_transform.decode_prediction(joined[None])[0]


class CTCModel(nn.Module):
    """audio (B, T) -> logits (B, frames, vocab): the whole jittable graph."""

    audio_transform: nn.Module
    encoder: nn.Module
    decoder: nn.Module

    @nn.compact
    def __call__(self, audio: jax.Array, lengths: jax.Array, train: bool = False):
        feats, feat_lengths = self.audio_transform(audio, lengths, train=train)
        encoded, out_lengths = self.encoder(feats, feat_lengths, train=train)
        if self.decoder is None:
            # encoder-only checkpoints (e.g. HF models without a tokenizer)
            return encoded, out_lengths
        logits = self.decoder(encoded, train=train)
        return logits, out_lengths


def pad_to_bucket(n: int, multiple: int = 16000) -> int:
    """Round up to the padding bucket, bounding the number of jit recompiles
    (delegates to the data pipeline's ``bucket_length`` — one rounding policy
    for loading and serving)."""
    from thunder_tpu.data.collate import bucket_length

    return bucket_length(n, multiple)


@dataclass
class CTCModule:
    """Model + state + transforms, with inference conveniences.

    Attributes:
        model: the flax ``CTCModel``.
        variables: flax variable dict (``params`` + optional ``batch_stats``).
        text_transform: host-side text encode/decode.
        encoder_final_dimension: channels out of the encoder (decoder input).
    """

    model: CTCModel
    #: repr=False: printing a module must not dump megabytes of parameters
    variables: Dict[str, Any] = field(repr=False)
    text_transform: Optional[BatchTextTransformer] = field(repr=False)
    encoder_final_dimension: Optional[int] = None
    pad_multiple: int = 16000
    #: param-tree path prefixes whose updates the Trainer zeroes (e.g. HF
    #: wav2vec2 freezes its conv feature extractor); a declared field so
    #: ``with_variables``/checkpoint round trips preserve it
    frozen_paths: Optional[List[Tuple[str, ...]]] = None
    _apply_cache: Dict[Tuple, Any] = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        rng: jax.Array,
        audio_transform: nn.Module,
        encoder: nn.Module,
        decoder: nn.Module,
        text_transform: Optional[BatchTextTransformer] = None,
        encoder_final_dimension: Optional[int] = None,
        sample_len: int = 16000,
    ) -> "CTCModule":
        """Initialize parameters with a dummy batch (like the reference's
        ``example_input_array``, `module.py:69-72`)."""
        model = CTCModel(audio_transform=audio_transform, encoder=encoder, decoder=decoder)
        dummy = jnp.zeros((2, sample_len), dtype=jnp.float32)
        lengths = jnp.array([sample_len, sample_len // 2], dtype=jnp.int32)
        variables = model.init({"params": rng}, dummy, lengths, train=False)
        if encoder_final_dimension is None:
            encoder_final_dimension = getattr(encoder, "final_dimension", None)
        return cls(
            model=model,
            variables=dict(variables),
            text_transform=text_transform,
            encoder_final_dimension=encoder_final_dimension,
        )

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def _eval_fn(self):
        key = ("eval_fn",)
        fn = self._apply_cache.get(key)
        if fn is None:

            @jax.jit
            def fn(variables, audio, lengths):
                logits, out_lengths = self.model.apply(variables, audio, lengths, train=False)
                preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return logits, preds, out_lengths

            self._apply_cache[key] = fn
        return fn

    def forward(self, audio, lengths) -> Tuple[jax.Array, jax.Array]:
        """Padded audio batch -> (logits, logit_lengths)."""
        logits, _, out_lengths = self._eval_fn()(self.variables, jnp.asarray(audio), jnp.asarray(lengths))
        return logits, out_lengths

    __call__ = forward

    def predict(self, audio, lengths=None, beam_width: Optional[int] = None, prune_logp: float = _BEAM_UNSET, lm=None, lm_weight: float = _BEAM_UNSET, nbest: Optional[int] = None, beam_backend: Optional[str] = None, **beam_kwargs) -> List[str]:
        """Audio batch -> transcriptions.

        Greedy CTC decode by default (`module.py:88-100` reference parity);
        pass ``beam_width`` for prefix beam search over the logits, which
        sums posterior probability over alignments instead of taking the
        argmax path.  ``beam_backend`` picks the search implementation:
        ``"host"`` (default — ops/ctc_beam.py, C++ runtime when available,
        in-search LM shallow fusion) or ``"device"`` (jitted on-accelerator
        search; the logits never leave the chip; an ``lm`` LM-ranks the
        surviving beam on the host — on-the-fly rescoring).  With ``nbest=k``, returns
        per sample the top-k ``(text, log_prob)`` pairs instead of one
        string.

        Pads time to a bucket multiple so repeated calls with nearby lengths
        reuse the same compiled executable.
        """
        if self.text_transform is None:
            raise ValueError("predict requires a text_transform (checkpoint had no tokenizer)")
        if nbest is not None and not beam_width:
            raise TypeError("beam-search arguments without beam_width: ['nbest']")
        if beam_backend is not None and not beam_width:
            raise TypeError("beam-search arguments without beam_width: ['beam_backend']")
        check_beam_args(beam_width, beam_kwargs, prune_logp=prune_logp, lm=lm, lm_weight=lm_weight)
        if prune_logp is _BEAM_UNSET:
            prune_logp = -12.0
        if lm_weight is _BEAM_UNSET:
            lm_weight = 0.5
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        if lengths is None:
            lengths = np.full((audio.shape[0],), audio.shape[-1], dtype=np.int32)
        lengths = np.asarray(lengths, dtype=np.int32)
        bucket = pad_to_bucket(audio.shape[-1], self.pad_multiple)
        if bucket != audio.shape[-1]:
            audio = np.pad(audio, ((0, 0), (0, bucket - audio.shape[-1])))
        logits, preds, out_lengths = self._eval_fn()(self.variables, jnp.asarray(audio), jnp.asarray(lengths))
        if beam_width:
            return run_beam_decode(
                logits,
                out_lengths,
                blank=self.blank_idx,
                text_transform=self.text_transform,
                beam_width=beam_width,
                nbest=nbest,
                prune_logp=prune_logp,
                lm=lm,
                lm_weight=lm_weight,
                backend=beam_backend,
                beam_kwargs=beam_kwargs,
            )
        collapsed = collapse_ctc(np.asarray(preds), np.asarray(out_lengths))
        # repeats already collapsed on ids; decode must not re-collapse
        return [self.text_transform.decode_prediction(c[None], remove_repeated=False)[0] for c in collapsed]

    def align(self, audio, texts, lengths=None, sample_rate: int = 16000):
        """Forced alignment: time spans for known transcripts.

        Runs the model forward, then Viterbi-aligns each transcript to its
        CTC lattice (:func:`thunder_tpu.ops.ctc.ctc_forced_align` — a
        scan-based jitted kernel, batched).  Beyond-parity tool (the
        reference has no alignment support): word/char timestamps,
        subtitle generation, long-corpus segmentation.

        Args:
            audio: ``(batch, time)`` padded waveforms (or a single 1-D clip).
            texts: the known transcripts, one per sample.
            lengths: valid samples per clip (defaults to full length).
            sample_rate: for the frame -> seconds conversion.

        Returns:
            ``(spans, scores)``: per sample a list of
            ``(token, start_seconds, end_seconds)`` covering its transcript
            tokens in order, and the best-path log-prob per sample
            (``-inf`` = the transcript cannot align, e.g. audio too short).
        """
        if self.text_transform is None:
            raise ValueError("align requires a text_transform (checkpoint had no tokenizer)")
        from thunder_tpu.ops.ctc import alignment_segments, ctc_forced_align

        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        if lengths is None:
            lengths = np.full((audio.shape[0],), audio.shape[-1], dtype=np.int32)
        lengths = np.asarray(lengths, dtype=np.int32)
        bucket = pad_to_bucket(audio.shape[-1], self.pad_multiple)
        if bucket != audio.shape[-1]:
            audio = np.pad(audio, ((0, 0), (0, bucket - audio.shape[-1])))
        targets, target_lengths = self.text_transform.encode(list(texts))
        logits, _, out_lengths = self._eval_fn()(self.variables, jnp.asarray(audio), jnp.asarray(lengths))
        logp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
        states, _, scores = ctc_forced_align(
            logp, out_lengths, jnp.asarray(targets), jnp.asarray(target_lengths), self.blank_idx
        )
        segments = alignment_segments(states, np.asarray(out_lengths), np.asarray(target_lengths))
        itos = self.text_transform.vocab.itos
        out_lengths = np.asarray(out_lengths)
        targets = np.asarray(targets)
        spans = []
        for b, segs in enumerate(segments):
            sec_per_frame = (lengths[b] / sample_rate) / max(int(out_lengths[b]), 1)
            spans.append(
                [
                    (itos[int(targets[b, i])], start * sec_per_frame, end * sec_per_frame)
                    for i, (start, end) in enumerate(segs)
                ]
            )
        return spans, np.asarray(scores)

    def predict_long(
        self,
        audio,
        chunk_seconds: float = 20.0,
        overlap_seconds: float = 2.0,
        sample_rate: int = 16000,
        beam_width: Optional[int] = None,
        **beam_kwargs,
    ) -> str:
        """Transcribe arbitrarily long audio by overlapped chunking.

        The reference advises capping clips at ~25 s and chunking beyond
        (docs/Ultimate guide.md:197); this implements that recipe: decode
        overlapping windows, trim half the overlap's frames from interior
        boundaries, stitch the id streams, then collapse+decode once.
        """
        if self.text_transform is None:
            raise ValueError("predict_long requires a text_transform")
        check_beam_args(beam_width, beam_kwargs)
        if "nbest" in beam_kwargs:
            raise TypeError(
                "nbest is not supported by predict_long (the chunked beam "
                "yields one continuous search; use predict for n-best)"
            )

        def infer(padded, lengths):
            _, preds, out_lengths = self._eval_fn()(self.variables, jnp.asarray(padded), jnp.asarray(lengths))
            return preds, out_lengths

        def logits_fn(padded, lengths):
            logits, _, out_lengths = self._eval_fn()(self.variables, jnp.asarray(padded), jnp.asarray(lengths))
            return logits, out_lengths

        return chunked_transcribe(
            infer,
            self.text_transform,
            audio,
            chunk_seconds=chunk_seconds,
            overlap_seconds=overlap_seconds,
            sample_rate=sample_rate,
            short_path=lambda a: self.predict(a, beam_width=beam_width, **beam_kwargs)[0],
            logits_fn=logits_fn,
            blank_idx=self.blank_idx,
            beam_width=beam_width,
            beam_kwargs=beam_kwargs or None,
        )

    # ------------------------------------------------------------------
    # loss (used by the training loop, exposed for API parity)
    # ------------------------------------------------------------------

    def loss(self, variables, audio, audio_lengths, targets, target_lengths, *, train=False, rngs=None):
        outputs = self.model.apply(
            variables,
            audio,
            audio_lengths,
            train=train,
            rngs=rngs,
            mutable=["batch_stats"] if train else False,
        )
        if train:
            (logits, out_lengths), updates = outputs
        else:
            logits, out_lengths = outputs
            updates = None
        loss = calculate_ctc(logits, targets, out_lengths, target_lengths, self.blank_idx)
        return loss, (logits, out_lengths, updates)

    @property
    def blank_idx(self) -> int:
        return self.text_transform.vocab.blank_idx if self.text_transform else 0

    @property
    def params(self):
        return self.variables["params"]

    def with_variables(self, variables) -> "CTCModule":
        return replace(self, variables=dict(variables), _apply_cache={})
