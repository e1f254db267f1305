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


OGG_FIXTURE = Path("/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg")


@pytest.mark.skipif(not OGG_FIXTURE.exists(), reason="fixture ogg not on disk")
def test_ogg_audio_info_header_only():
    from thunder_tpu.data.audio_io import _parse_ogg_info

    info = audio_info(str(OGG_FIXTURE))
    assert info.sample_rate > 0 and info.num_channels in (1, 2)
    assert info.num_frames > 0
    assert _parse_ogg_info(str(OGG_FIXTURE)) == info


@needs_backend
@pytest.mark.skipif(not OGG_FIXTURE.exists(), reason="fixture ogg not on disk")
def test_ogg_decode_matches_header_metadata():
    info = audio_info(str(OGG_FIXTURE))
    audio, rate = load_audio(str(OGG_FIXTURE))
    # decode at the native spec: same rate/channels as the id header, and a
    # sample count within one Ogg page of the final granule position
    assert rate == info.sample_rate
    assert audio.shape[0] == info.num_channels
    assert abs(audio.shape[1] - info.num_frames) < 4096
    assert np.isfinite(audio).all() and np.abs(audio).max() > 1e-3


def test_ogg_info_synthetic_vorbis(tmp_path):
    # minimal first page with a vorbis id header + a closing page whose
    # granule position carries the total sample count
    payload = b"\x01vorbis" + bytes(4) + bytes([2]) + (22050).to_bytes(4, "little") + bytes(16)
    page0 = b"OggS" + bytes([0, 2]) + bytes(8) + bytes(12) + bytes([1, len(payload)]) + payload
    last = b"OggS" + bytes([0, 4]) + (44100).to_bytes(8, "little") + bytes(12) + bytes([1, 0])
    p = tmp_path / "x.ogg"
    p.write_bytes(page0 + last)
    info = audio_info(str(p))
    assert (info.sample_rate, info.num_channels, info.num_frames) == (22050, 2, 44100)


def test_mp3_info_is_header_bounded():
    # metadata on a CBR file must not scan every frame: a file claiming 10
    # minutes of CBR frames but truncated after one frame still reports the
    # filesize-derived duration without raising
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    frame = hdr + bytes(413)
    import thunder_tpu.data.audio_io as aio

    total = aio._mp3_vbr_total_frames(frame + frame, aio._mp3_frame_at(frame, 0))
    assert total == 0  # no Xing header present


def test_ogg_flac_streaminfo(tmp_path):
    # Ogg-FLAC mapping: 13-byte mapping header + 4-byte metadata block
    # header + native STREAMINFO (offset regression: was read at +8)
    rate, ch, bps, total = 16000, 1, 16, 123456
    bits = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    si = bytes(10) + bits.to_bytes(8, "big") + bytes(16)
    payload = b"\x7fFLAC" + bytes([1, 0]) + (1).to_bytes(2, "big") + b"fLaC" + bytes([0x80, 0, 0, 34]) + si
    page0 = b"OggS" + bytes([0, 2]) + bytes(8) + bytes(12) + bytes([1, len(payload)]) + payload
    last = b"OggS" + bytes([0, 4]) + total.to_bytes(8, "little") + bytes(12) + bytes([1, 0])
    p = tmp_path / "x.ogg"
    p.write_bytes(page0 + last)
    info = audio_info(str(p))
    assert (info.sample_rate, info.num_channels, info.bits_per_sample, info.num_frames) == (rate, ch, bps, total)


def test_mp3_first_frame_verification_across_window_boundary(tmp_path):
    from thunder_tpu.data.audio_io import _mp3_first_frame

    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # MPEG-1 L3 128k/44.1k, 417 bytes
    frame = hdr + bytes(413)
    # real frames start just before the initial 256 KB read window so the
    # second-header verification must extend the window, not accept blindly
    start = (1 << 18) - 100
    p = tmp_path / "boundary.mp3"
    p.write_bytes(bytes(start) + frame * 3)
    pos, _, parsed, _ = _mp3_first_frame(str(p))
    assert pos == start
    assert parsed[1] == 44100

    # a spurious sync at the boundary followed by junk must NOT be accepted
    p2 = tmp_path / "junk.mp3"
    p2.write_bytes(bytes(start) + hdr + bytes(2000))
    with pytest.raises(ValueError, match="no MPEG"):
        _mp3_first_frame(str(p2))
