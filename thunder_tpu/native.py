"""ctypes bindings for the native C++ host runtime (csrc/thunder_native.cpp).

The shared library is looked up next to the package; if absent, it is built
once with g++ (cached).  Users of these functions keep pure-Python fallbacks
(see data/audio_io.py, training/metrics.py) so the framework also works where
no compiler exists.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Tuple

import numpy as np

__all__ = [
    "native_available",
    "native_load_wav",
    "native_load_flac",
    "native_wav_info",
    "native_resample",
    "native_edit_distance",
    "native_ctc_collapse",
    "native_ctc_beam_search",
    "native_ctc_beam_search_batch",
    "native_ctc_beam_search_stream",
    "NativeNGramLM",
    "NativeSpmEncoder",
    "NativeWordFusion",
]

_LIB_PATH = Path(__file__).parent / "libthunder_native.so"
_SRC = Path(__file__).parent.parent / "csrc" / "thunder_native.cpp"


class _TnAudio(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("channels", ctypes.c_int32),
        ("frames", ctypes.c_int64),
        ("sample_rate", ctypes.c_int32),
    ]


_FAILED_MARKER = _LIB_PATH.with_suffix(".build_failed")


def _build() -> bool:
    if not _SRC.exists():
        return False
    if _FAILED_MARKER.exists():
        # a failed import isn't cached by Python, so without this marker every
        # `from thunder_tpu.native import ...` would re-run the compiler
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread", "-o", str(_LIB_PATH), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        try:
            _FAILED_MARKER.touch()
        except OSError:
            pass
        return False


def _stale() -> bool:
    # make semantics: an edited csrc must win over a cached .so
    try:
        return _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
    except OSError:
        return False


def _load():
    if (not _LIB_PATH.exists() or _stale()) and not _build():
        if not _LIB_PATH.exists():
            raise ImportError("thunder_tpu native library unavailable (build failed)")
    lib = ctypes.CDLL(str(_LIB_PATH))
    # probe the NEWEST symbol: a stale .so from an older source revision must
    # rebuild once so missing symbols surface as ImportError (callers'
    # fallback guard), never as AttributeError mid-call
    if not hasattr(lib, "tn_spm_create"):
        if not _build():
            raise ImportError("thunder_tpu native library is stale and rebuild failed")
        lib = ctypes.CDLL(str(_LIB_PATH))
        if not hasattr(lib, "tn_spm_create"):
            raise ImportError("thunder_tpu native library is stale (missing symbols)")
    lib.tn_load_wav.argtypes = [ctypes.c_char_p, ctypes.POINTER(_TnAudio)]
    lib.tn_load_wav.restype = ctypes.c_int
    lib.tn_load_flac.argtypes = [ctypes.c_char_p, ctypes.POINTER(_TnAudio)]
    lib.tn_load_flac.restype = ctypes.c_int
    lib.tn_free_audio.argtypes = [ctypes.POINTER(_TnAudio)]
    lib.tn_wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.tn_wav_info.restype = ctypes.c_int
    lib.tn_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.tn_resample.restype = ctypes.c_int
    lib.tn_edit_distance.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.tn_edit_distance.restype = ctypes.c_int64
    lib.tn_ctc_collapse.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.tn_ctc_collapse.restype = ctypes.c_int64
    lib.tn_ctc_beam_search_lm.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.tn_ctc_beam_search_lm.restype = ctypes.c_int64
    lib.tn_ctc_beam_search_stream_lm.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    lib.tn_ctc_beam_search_stream_lm.restype = ctypes.c_int64
    lib.tn_ctc_beam_search_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.tn_ctc_beam_search_batch.restype = ctypes.c_int64
    lib.tn_lm_create.argtypes = [ctypes.c_int32, ctypes.c_double, ctypes.c_double]
    lib.tn_lm_create.restype = ctypes.c_void_p
    lib.tn_lm_add.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.tn_lm_add.restype = ctypes.c_int
    lib.tn_lm_create_arpa.argtypes = [ctypes.c_int32, ctypes.c_double, ctypes.c_int32]
    lib.tn_lm_create_arpa.restype = ctypes.c_void_p
    lib.tn_lm_add_arpa.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.tn_lm_add_arpa.restype = ctypes.c_int
    lib.tn_lm_finalize.argtypes = [ctypes.c_void_p]
    lib.tn_lm_finalize.restype = ctypes.c_int
    lib.tn_lm_free.argtypes = [ctypes.c_void_p]
    lib.tn_lm_free.restype = None
    lib.tn_lm_score.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.tn_lm_score.restype = ctypes.c_double
    lib.tn_wfusion_create.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_double,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int32,
    ]
    lib.tn_wfusion_create.restype = ctypes.c_void_p
    lib.tn_wfusion_free.argtypes = [ctypes.c_void_p]
    lib.tn_wfusion_free.restype = None
    lib.tn_spm_create.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int32,
        ctypes.c_double,
    ]
    lib.tn_spm_create.restype = ctypes.c_void_p
    lib.tn_spm_free.argtypes = [ctypes.c_void_p]
    lib.tn_spm_free.restype = None
    lib.tn_spm_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.tn_spm_encode.restype = ctypes.c_int64
    return lib


try:
    _lib = _load()
except ImportError:
    _lib = None

if _lib is None:
    raise ImportError("thunder_tpu native library unavailable")


def native_available() -> bool:
    return _lib is not None


def native_load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode a WAV file -> ((channels, frames) float32, sample_rate)."""
    audio = _TnAudio()
    rc = _lib.tn_load_wav(str(path).encode(), ctypes.byref(audio))
    if rc != 0:
        raise ValueError(f"native wav decode failed ({rc}) for {path}")
    try:
        n = audio.channels * audio.frames
        flat = np.ctypeslib.as_array(audio.data, shape=(n,)).copy()
        return flat.reshape(audio.channels, audio.frames), int(audio.sample_rate)
    finally:
        _lib.tn_free_audio(ctypes.byref(audio))


def native_load_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> ((channels, frames) float32, sample_rate)."""
    audio = _TnAudio()
    rc = _lib.tn_load_flac(str(path).encode(), ctypes.byref(audio))
    if rc != 0:
        raise ValueError(f"native flac decode failed ({rc}) for {path}")
    try:
        n = audio.channels * audio.frames
        flat = np.ctypeslib.as_array(audio.data, shape=(n,)).copy()
        return flat.reshape(audio.channels, audio.frames), int(audio.sample_rate)
    finally:
        _lib.tn_free_audio(ctypes.byref(audio))


def native_wav_info(path: str):
    frames = ctypes.c_int64()
    rate = ctypes.c_int32()
    channels = ctypes.c_int32()
    bits = ctypes.c_int32()
    rc = _lib.tn_wav_info(str(path).encode(), frames, rate, channels, bits)
    if rc != 0:
        raise ValueError(f"native wav info failed ({rc}) for {path}")
    return frames.value, rate.value, channels.value, bits.value


def native_resample(x: np.ndarray, up: int, down: int, zeros: int = 16) -> np.ndarray:
    """Polyphase windowed-sinc resample of a 1-D float32 signal."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_out = -(-x.shape[-1] * up // down)
    y = np.empty(n_out, dtype=np.float32)
    rc = _lib.tn_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[-1],
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_out,
        up,
        down,
        zeros,
    )
    if rc != 0:
        raise ValueError("native resample failed")
    return y


def native_edit_distance(a, b) -> int:
    """Levenshtein distance between two sequences (str or int sequences)."""
    ai = np.asarray([ord(c) for c in a] if isinstance(a, str) else a, dtype=np.int32)
    bi = np.asarray([ord(c) for c in b] if isinstance(b, str) else b, dtype=np.int32)
    return int(
        _lib.tn_edit_distance(
            ai.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(ai),
            bi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(bi),
        )
    )


def native_ctc_collapse(ids: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicates from a 1-D int32 id sequence."""
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    out = np.empty_like(ids)
    m = _lib.tn_ctc_collapse(
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(ids),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:m].copy()


class NativeNGramLM:
    """Owned handle to a C++ stupid-backoff n-gram LM (tn_lm_* ABI).

    Built from the pure-Python :class:`thunder_tpu.text.lm.NGramLM`'s count
    tables so the C++ beam search can fuse LM scores without calling back
    into Python per extension.  Score parity with the Python scorer is pinned
    in tests/test_ctc_beam.py.
    """

    def __init__(self, order: int, backoff: float, oov_logp: float):
        if _lib is None:
            raise ImportError("thunder_tpu native library unavailable")
        self._handle = _lib.tn_lm_create(int(order), float(backoff), float(oov_logp))
        if not self._handle:
            raise ValueError("tn_lm_create failed (order must be >= 1, backoff > 0)")

    @classmethod
    def from_counts(cls, order: int, backoff: float, oov_logp: float, counts_by_len):
        """Build from ``{gram_len: {gram_tuple: count}}`` (NGramLM._counts)."""
        lm = cls(order, backoff, oov_logp)
        for gram_len, table in counts_by_len.items():
            if not table:
                continue
            grams = np.ascontiguousarray(list(table.keys()), dtype=np.int32)
            counts = np.ascontiguousarray(list(table.values()), dtype=np.int64)
            rc = _lib.tn_lm_add(
                lm._handle,
                grams.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(counts),
                int(gram_len),
            )
            if rc != 0:
                raise ValueError(f"tn_lm_add failed ({rc}) for gram_len={gram_len}")
        if _lib.tn_lm_finalize(lm._handle) != 0:
            raise ValueError("tn_lm_finalize failed")
        return lm

    @classmethod
    def from_arpa_tables(cls, order: int, unk_logp: float, unk_id: int, tables):
        """Build a Katz-backoff (ARPA-mode) scorer from ArpaLM's tables:
        ``{gram_len: {gram_tuple: (ln_p, ln_bow)}}``."""
        lm = cls.__new__(cls)
        if _lib is None:
            raise ImportError("thunder_tpu native library unavailable")
        lm._handle = _lib.tn_lm_create_arpa(int(order), float(unk_logp), int(unk_id))
        if not lm._handle:
            raise ValueError("tn_lm_create_arpa failed (order must be >= 1)")
        for gram_len, table in tables.items():
            if not table:
                continue
            grams = np.ascontiguousarray(list(table.keys()), dtype=np.int32)
            vals = np.asarray(list(table.values()), dtype=np.float64)
            logps = np.ascontiguousarray(vals[:, 0])
            bows = np.ascontiguousarray(vals[:, 1])
            rc = _lib.tn_lm_add_arpa(
                lm._handle,
                grams.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                logps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                bows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(logps),
                int(gram_len),
            )
            if rc != 0:
                raise ValueError(f"tn_lm_add_arpa failed ({rc}) for gram_len={gram_len}")
        return lm

    def score(self, context, token: int) -> float:
        ctx = np.ascontiguousarray(context, dtype=np.int32)
        return float(
            _lib.tn_lm_score(
                self._handle,
                ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(ctx),
                int(token),
            )
        )

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle and _lib is not None:
            _lib.tn_lm_free(handle)
            self._handle = None


def _strings_blob(strings):
    """Concatenate strings into a UTF-8 blob + int64 offsets (n+1 entries)."""
    encoded = [s.encode("utf-8") for s in strings]
    offsets = np.zeros((len(encoded) + 1,), np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    return b"".join(encoded), offsets


class NativeSpmEncoder:
    """Owned handle to the C++ unigram Viterbi encoder (tn_spm_*).

    Mirror of ``SentencePieceModel._encode_unigram`` (exact DP, spans parity
    pinned in tests/text/test_tokenizer.py); built from the model's
    indexable pieces by ``SentencePieceModel``.
    """

    def __init__(self, pieces, scores, unk_score: float):
        if _lib is None:
            raise ImportError("thunder_tpu native library unavailable")
        blob, offsets = _strings_blob(pieces)
        sc = np.asarray(scores, np.float64)
        self._handle = _lib.tn_spm_create(
            blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(pieces),
            float(unk_score),
        )
        if not self._handle:
            raise ValueError("tn_spm_create failed")

    def encode_spans(self, normalized_text: str):
        """Byte spans of the Viterbi pieces over normalized UTF-8 text, or
        ``None`` on error (caller falls back to the Python DP)."""
        raw = normalized_text.encode("utf-8")
        cap = len(raw) + 1
        starts = np.empty((cap,), np.int32)
        ends = np.empty((cap,), np.int32)
        n = _lib.tn_spm_encode(
            self._handle,
            raw,
            len(raw),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
        if n < 0:
            return None
        return [raw[starts[i] : ends[i]].decode("utf-8") for i in range(n)]

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle and _lib is not None:
            _lib.tn_spm_free(handle)
            self._handle = None


class NativeWordFusion:
    """Owned handle to the C++ word-level fusion config (tn_wfusion_*).

    Wraps a word LM's :class:`NativeNGramLM` (kept alive by reference) plus
    the acoustic token vocabulary, so the beam search scores completed words
    entirely in C++.  Built by ``WordFusionLM.native()``; behavior parity
    with the Python adapter is pinned in tests/test_word_fusion.py.
    """

    def __init__(self, word_lm_native, style: str, space_id: int, bos_id: int,
                 unk_id: int, pieces, words, word_score: float = 0.0, hotwords=None):
        if _lib is None:
            raise ImportError("thunder_tpu native library unavailable")
        self._word_lm = word_lm_native  # lifetime: C++ keeps a borrowed pointer
        pieces_blob, piece_off = _strings_blob(pieces)
        words_blob, word_off = _strings_blob(words)
        hotwords = dict(hotwords or {})
        hw_blob, hw_off = _strings_blob(list(hotwords.keys()))
        hw_boosts = np.asarray(list(hotwords.values()), np.float64)
        self._handle = _lib.tn_wfusion_create(
            word_lm_native._handle if word_lm_native is not None else None,
            {"char": 0, "sentencepiece": 1}[style],
            int(space_id),
            int(bos_id),
            int(unk_id),
            float(word_score),
            pieces_blob,
            piece_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(pieces),
            words_blob,
            word_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(words),
            hw_blob,
            hw_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            hw_boosts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(hotwords),
        )
        if not self._handle:
            raise ValueError("tn_wfusion_create failed")

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle and _lib is not None:
            _lib.tn_wfusion_free(handle)
            self._handle = None


def native_ctc_beam_search(
    logp: np.ndarray,
    blank: int,
    beam_width: int = 16,
    prune_logp: float = float("-inf"),
    max_tokens_per_step: int = 0,
    return_score: bool = False,
    lm: "NativeNGramLM" = None,
    lm_weight: float = 0.0,
):
    """CTC prefix beam search over one utterance's (T, V) log-softmax.

    Returns the best collapsed label sequence (int32 array), optionally with
    its total log-probability; ``None`` if the native library is missing or
    errors (callers fall back to the numpy reference in ops/ctc_beam.py).
    ``lm`` (a :class:`NativeNGramLM`) fuses shallow LM scores in C++.
    """
    if _lib is None:
        return None
    logp = np.ascontiguousarray(logp, dtype=np.float32)
    t, v = logp.shape
    out = np.empty((t + 1,), np.int32)
    score = ctypes.c_double(0.0)
    # clamp -inf to the most negative finite float purely for portability;
    # the C++ side compares with >= so the effect is identical either way
    pl = float(prune_logp)
    if pl == float("-inf"):
        pl = -3.0e38
    n = _lib.tn_ctc_beam_search_lm(
        logp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t,
        v,
        int(blank),
        int(beam_width),
        pl,
        int(max_tokens_per_step or 0),
        lm._handle if lm is not None else None,
        float(lm_weight),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(out),
        ctypes.byref(score),
    )
    if n < 0:
        return None
    ids = out[:n].copy()
    return (ids, score.value) if return_score else ids


def native_ctc_beam_search_batch(
    logp: np.ndarray,
    lengths,
    blank: int,
    beam_width: int = 16,
    prune_logp: float = float("-inf"),
    max_tokens_per_step: int = 0,
    lm: "NativeNGramLM" = None,
    lm_weight: float = 0.0,
    n_threads: int = 0,
):
    """Batched CTC prefix beam search over (B, T, V) log-softmax, threaded
    over samples in C++ (n_threads <= 0 uses all cores).

    Returns a list of B best label sequences (int32 arrays), or ``None`` if
    the native library is missing or any sample fails (callers fall back to
    the per-sample numpy reference).
    """
    if _lib is None:
        return None
    logp = np.ascontiguousarray(logp, dtype=np.float32)
    b, t, v = logp.shape
    lens = np.ascontiguousarray(lengths, dtype=np.int64)
    out_stride = t + 1
    out = np.empty((b, out_stride), np.int32)
    out_lens = np.empty((b,), np.int64)
    pl = float(prune_logp)
    if pl == float("-inf"):
        pl = -3.0e38
    rc = _lib.tn_ctc_beam_search_batch(
        logp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b,
        t,
        v,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(blank),
        int(beam_width),
        pl,
        int(max_tokens_per_step or 0),
        lm._handle if lm is not None else None,
        float(lm_weight),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_stride,
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(n_threads),
    )
    if rc != 0 or (out_lens < 0).any():
        return None
    return [out[i, : out_lens[i]].copy() for i in range(b)]


def native_ctc_beam_search_stream(
    logp: np.ndarray,
    blank: int,
    beam_width: int = 16,
    prune_logp: float = float("-inf"),
    max_tokens_per_step: int = 0,
    in_beams=None,
    lm: "NativeNGramLM" = None,
    lm_weight: float = 0.0,
):
    """Advance carried prefix-beam state over one (T, V) log-softmax window.

    ``in_beams``: list of ``(prefix int32 array, pb, pnb)`` carried from the
    previous window (``None``/empty seeds the root beam).  Returns the
    surviving beams best-first in the same format, or ``None`` if the native
    library is missing or errors (callers fall back to the numpy reference).
    ``lm`` (a :class:`NativeNGramLM`) fuses shallow LM scores in C++, seeing
    the full carried prefix as context.
    """
    if _lib is None:
        return None
    logp = np.ascontiguousarray(logp, dtype=np.float32)
    t, v = logp.shape
    in_beams = list(in_beams or [])
    n_in = len(in_beams)
    in_stride = max((len(p) for p, _, _ in in_beams), default=0) or 1
    in_prefixes = np.zeros((max(n_in, 1), in_stride), np.int32)
    in_lens = np.zeros((max(n_in, 1),), np.int32)
    in_pb = np.zeros((max(n_in, 1),), np.float64)
    in_pnb = np.zeros((max(n_in, 1),), np.float64)
    for i, (p, pb, pnb) in enumerate(in_beams):
        p = np.asarray(p, np.int32)
        in_prefixes[i, : len(p)] = p
        in_lens[i] = len(p)
        in_pb[i], in_pnb[i] = pb, pnb
    # a window of T frames can extend a prefix by at most T tokens
    out_stride = in_stride + t + 1
    out_prefixes = np.empty((beam_width, out_stride), np.int32)
    out_lens = np.empty((beam_width,), np.int32)
    out_pb = np.empty((beam_width,), np.float64)
    out_pnb = np.empty((beam_width,), np.float64)
    pl = float(prune_logp)
    if pl == float("-inf"):
        pl = -3.0e38
    n = _lib.tn_ctc_beam_search_stream_lm(
        logp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t,
        v,
        int(blank),
        int(beam_width),
        pl,
        int(max_tokens_per_step or 0),
        lm._handle if lm is not None else None,
        float(lm_weight),
        in_prefixes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        in_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        in_pb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        in_pnb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_in,
        in_stride,
        out_prefixes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_pb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_pnb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_stride,
    )
    if n < 0:
        return None
    return [
        (out_prefixes[i, : out_lens[i]].copy(), float(out_pb[i]), float(out_pnb[i]))
        for i in range(n)
    ]
