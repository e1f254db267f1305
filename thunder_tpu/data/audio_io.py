"""Host-side audio IO: decode, mono-mix, DC removal, resample.

Equivalent of the reference ``AudioFileLoader`` preprocessing
(`/root/reference/src/thunder/data/dataset.py:23-89`), which delegates to
torchaudio/libsox.  Here decode is implemented natively: WAV parsing lives in
the C++ runtime (:mod:`thunder_tpu.native`, csrc/audio.cpp) with a pure-Python
fallback; resampling is windowed-sinc polyphase (scipy).  Everything stays on
the host — the TPU only ever sees float32 waveform arrays.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path
from typing import Tuple, Union

import numpy as np

__all__ = ["AudioInfo", "audio_info", "load_audio", "resample", "AudioFileLoader"]


@dataclass
class AudioInfo:
    sample_rate: int
    num_frames: int
    num_channels: int
    bits_per_sample: int


def _parse_wav_header(path: str) -> Tuple[AudioInfo, int, int, int]:
    """Returns (info, data_offset, data_size, audio_format)."""
    with open(path, "rb") as f:
        riff = f.read(12)
        if riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"not a RIFF/WAVE file: {path}")
        fmt = None
        while True:
            header = f.read(8)
            if len(header) < 8:
                raise ValueError(f"no data chunk found in {path}")
            chunk_id, size = header[:4], struct.unpack("<I", header[4:])[0]
            if chunk_id == b"fmt ":
                fmt = f.read(size)
                if size % 2:
                    f.read(1)
            elif chunk_id == b"data":
                if fmt is None:
                    raise ValueError(f"data chunk before fmt in {path}")
                audio_format, channels, rate = struct.unpack("<HHI", fmt[:8])
                bits = struct.unpack("<H", fmt[14:16])[0]
                if audio_format == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
                    audio_format = struct.unpack("<H", fmt[24:26])[0]
                frames = size // (channels * (bits // 8))
                return AudioInfo(rate, frames, channels, bits), f.tell(), size, audio_format
            else:
                f.seek(size + (size % 2), 1)


def _parse_flac_streaminfo(path: str) -> AudioInfo:
    """Read sample rate / frames / channels from the FLAC STREAMINFO block."""
    with open(path, "rb") as f:
        header = f.read(4 + 4 + 34)
    if header[:4] != b"fLaC":
        raise ValueError(f"not a FLAC file: {path}")
    if len(header) < 42:
        raise ValueError(f"truncated FLAC header: {path}")
    if header[4] & 0x7F != 0:  # first metadata block must be STREAMINFO
        raise ValueError(f"FLAC file missing STREAMINFO: {path}")
    si = header[8:]
    bits = int.from_bytes(si[10:18], "big")  # rate(20) ch(3) bps(5) total(36)
    sample_rate = bits >> 44
    channels = ((bits >> 41) & 0x7) + 1
    bps = ((bits >> 36) & 0x1F) + 1
    total = bits & ((1 << 36) - 1)
    if sample_rate == 0:
        raise ValueError(f"invalid FLAC sample rate in {path}")
    if total == 0:
        # spec-legal "unknown length": fall back to a full decode
        from thunder_tpu.native import native_load_flac

        audio, rate = native_load_flac(path)
        return AudioInfo(rate, audio.shape[1], audio.shape[0], bps)
    return AudioInfo(sample_rate, total, channels, bps)


def audio_info(path: Union[str, Path]) -> AudioInfo:
    """Header-only metadata read (for duration bucketing); WAV or FLAC."""
    path = str(path)
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        return _parse_flac_streaminfo(path)
    info, _, _, _ = _parse_wav_header(path)
    return info


def _decode_pcm(raw: bytes, bits: int, audio_format: int) -> np.ndarray:
    if audio_format == 3:  # IEEE float
        dtype = np.float32 if bits == 32 else np.float64
        return np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if bits == 16:
        return np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    if bits == 32:
        return np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    if bits == 8:
        return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        vals = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        return vals.astype(np.float32) / float(1 << 23)
    raise ValueError(f"unsupported PCM bit depth: {bits}")


def load_audio(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Decode an audio file -> (float32 (channels, time) array, sample_rate).

    WAV and FLAC are decoded by the native C++ runtime (dispatch by file
    magic); WAV additionally has a pure-Python fallback.
    """
    path = str(path)
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        from thunder_tpu.native import native_load_flac

        return native_load_flac(path)
    try:
        from thunder_tpu.native import native_load_wav

        return native_load_wav(path)
    except (ImportError, OSError):
        pass
    except ValueError:
        pass  # fall through for the python parser's clearer errors
    info, offset, size, audio_format = _parse_wav_header(path)
    with open(path, "rb") as f:
        f.seek(offset)
        raw = f.read(size)
    flat = _decode_pcm(raw, info.bits_per_sample, audio_format)
    return flat.reshape(-1, info.num_channels).T.copy(), info.sample_rate


def resample(audio: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Polyphase windowed-sinc resampling along the last axis."""
    if orig_freq == new_freq:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(orig_freq), int(new_freq))
    return resample_poly(audio, new_freq // g, orig_freq // g, axis=-1).astype(np.float32)


class AudioFileLoader:
    """Open + canonicalize audio: mono mix, DC removal, resample.

    Mirrors reference semantics (`data/dataset.py:23-89`): optional mono mix
    by channel average, subtract per-file mean (DC bias), resample to the
    target rate.
    """

    def __init__(self, force_mono: bool = True, sample_rate: int = 16000):
        self.force_mono = force_mono
        self.sample_rate = sample_rate

    def open_audio(self, item: Union[str, Path]) -> Tuple[np.ndarray, int]:
        return load_audio(item)

    def preprocess_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        if self.force_mono and audio.shape[0] > 1:
            audio = audio.mean(axis=0, keepdims=True)
        audio = audio - audio.mean(axis=1, keepdims=True)
        if self.sample_rate != sample_rate:
            audio = resample(audio, int(sample_rate), int(self.sample_rate))
        return audio.astype(np.float32)

    def __call__(self, item: Union[str, Path]) -> np.ndarray:
        audio, sr = self.open_audio(item)
        return self.preprocess_audio(audio, sr)
