"""MP3 decode coverage: header parsing + the optional decode-hook chain.

The reference accepts mp3 through torchaudio's ffmpeg/libsox delegation
(`/root/reference/src/thunder/data/dataset.py:47`); thunder_tpu mirrors that
with a hook chain (soundfile/torchaudio/pygame).  Real-world fixtures: two
mp3 files shipped inside packages already present in the image (an MPEG-1
44.1 kHz file and an MPEG-2.5 low-rate file) — skipped when absent.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

from thunder_tpu.data.audio_io import (
    AudioFileLoader,
    _mp3_frame_at,
    _mp3_skip_id3,
    _parse_mp3_info,
    audio_info,
    load_audio,
)

MP3_V1 = Path("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3")
MP3_V25 = Path("/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3")

needs_backend = pytest.mark.skipif(
    not any(importlib.util.find_spec(m) for m in ("soundfile", "torchaudio", "pygame")),
    reason="no compressed-audio backend installed",
)


def test_mp3_header_parse_synthetic():
    # hand-built MPEG-1 Layer III header: 128 kbit/s, 44.1 kHz, stereo, no pad
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    frame = _mp3_frame_at(hdr, 0)
    assert frame is not None
    frame_bytes, rate, channels, spf = frame
    assert (rate, channels, spf) == (44100, 2, 1152)
    assert frame_bytes == 144 * 128000 // 44100  # 417

    # MPEG-2.5 mono 8 kHz @ 32kbit
    hdr = bytes([0xFF, 0xE3, 0x48, 0xC0])
    frame = _mp3_frame_at(hdr, 0)
    assert frame is not None
    frame_bytes, rate, channels, spf = frame
    assert (rate, channels, spf) == (8000, 1, 576)
    assert frame_bytes == 72 * 32000 // 8000  # 288

    # junk is rejected
    assert _mp3_frame_at(b"\x00\x00\x00\x00", 0) is None
    assert _mp3_frame_at(bytes([0xFF, 0xFB, 0xF0, 0x00]), 0) is None  # bad bitrate idx


def test_id3_skip():
    tag = b"ID3\x04\x00\x00\x00\x00\x02\x01" + b"x" * 0x101
    assert _mp3_skip_id3(tag) == 10 + 0x101
    assert _mp3_skip_id3(b"\xff\xfb\x90\x00") == 0


@pytest.mark.skipif(not MP3_V1.exists(), reason="fixture mp3 not on disk")
def test_mp3_info_real_file_v1():
    info = _parse_mp3_info(str(MP3_V1))
    # gsutil's test.mp3 is MPEG-2 Layer III @ 22.05 kHz behind an ID3v2 tag
    assert info.sample_rate == 22050
    assert info.num_channels in (1, 2)
    assert info.num_frames > 0
    # audio_info dispatches on content (file starts with an ID3 tag)
    assert audio_info(str(MP3_V1)).sample_rate == info.sample_rate


@pytest.mark.skipif(not MP3_V25.exists(), reason="fixture mp3 not on disk")
def test_mp3_info_real_file_v25():
    info = _parse_mp3_info(str(MP3_V25))
    assert info.sample_rate in (8000, 11025, 12000)  # MPEG-2.5 rates
    assert info.num_frames > 0


@needs_backend
@pytest.mark.skipif(not MP3_V1.exists(), reason="fixture mp3 not on disk")
def test_load_audio_mp3_v1():
    audio, rate = load_audio(str(MP3_V1))
    info = _parse_mp3_info(str(MP3_V1))
    assert rate == info.sample_rate
    assert audio.ndim == 2 and audio.shape[0] == info.num_channels
    assert audio.dtype == np.float32
    assert np.isfinite(audio).all()
    # this particular fixture is genuine digital silence (gsutil metadata
    # test artifact) — decode must reproduce it exactly
    assert np.abs(audio).max() == 0.0
    # decoded length within codec delay/padding of the header-scanned total
    assert abs(audio.shape[1] - info.num_frames) < 4 * 1152 + 529


@needs_backend
@pytest.mark.skipif(not MP3_V25.exists(), reason="fixture mp3 not on disk")
def test_load_audio_mp3_v25_and_loader_pipeline():
    audio, rate = load_audio(str(MP3_V25))
    assert np.abs(audio).max() > 1e-3
    # full pipeline: mono mix + DC removal + resample to 16 kHz
    out = AudioFileLoader(force_mono=True, sample_rate=16000)(str(MP3_V25))
    assert out.shape[0] == 1
    expect = round(audio.shape[1] * 16000 / rate)
    assert abs(out.shape[1] - expect) <= 2
    assert abs(float(out.mean())) < 1e-4  # DC removed


def test_hookless_error_is_informative(tmp_path, monkeypatch):
    import thunder_tpu.data.audio_io as aio

    p = tmp_path / "x.mp3"
    p.write_bytes(bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 400)
    monkeypatch.setattr(aio, "_DECODE_HOOKS", ())
    with pytest.raises(ValueError, match="no compressed-audio backend"):
        load_audio(str(p))
