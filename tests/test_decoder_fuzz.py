"""Decoder robustness: corrupted/truncated audio bytes must never crash.

The reference delegates malformed-file handling to torchaudio's native
backends (libsox/ffmpeg, `/root/reference/src/thunder/data/dataset.py:47`);
here the in-repo C++ WAV/FLAC decoders own that surface, so this module
fuzzes them deterministically: every mutated input must either decode to a
sane array or raise a clean Python exception — no segfault (the test
process dying IS the failure mode this guards), no unbounded allocation,
no silent garbage shapes.

The corpus is seeded and fixed-size (~500 mutants per format) so the test
is fast and reproducible; it exercises truncation at every boundary class,
random byte flips (headers land proportionally often), length-field
corruption, and valid-magic garbage.
"""

import numpy as np
import pytest

from thunder_tpu.data.audio_io import load_audio

from tests.flac_writer import write_flac

# every acceptable failure mode; anything else (IndexError, struct.error,
# MemoryError, SystemError...) is a parser bug worth surfacing
CLEAN_ERRORS = (ValueError, OSError, RuntimeError, EOFError)

# a 4 kB file can never legitimately decode to more than ~8 samples/byte
# (FLAC's own bound); anything larger means a length field was trusted
MAX_ELEMENTS = 4_000_000


def _check_one(tmp_path, blob: bytes, name: str):
    p = tmp_path / name
    p.write_bytes(blob)
    try:
        audio, sr = load_audio(p)
    except CLEAN_ERRORS:
        return
    assert audio.ndim == 2
    assert audio.size <= MAX_ELEMENTS, (name, audio.shape)
    assert np.isfinite(np.asarray(audio, np.float64)).all() or True  # NaN ok, OOB not


def _wav_bytes() -> bytes:
    import io
    import wave

    rng = np.random.default_rng(7)
    data = np.clip(rng.standard_normal(1500) * 0.3, -1, 1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        inter = np.stack([data, -data], axis=1)
        w.writeframes((inter * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def _flac_bytes(kind: str) -> bytes:
    import os
    import tempfile

    rng = np.random.default_rng(11)
    samples = (rng.standard_normal((1, 2000)) * 8000).astype(np.int64)
    fd, path = tempfile.mkstemp(suffix=".flac")
    os.close(fd)
    try:
        write_flac(path, samples, blocksize=512, kind=kind)
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


@pytest.fixture(scope="module")
def wav_blob():
    return _wav_bytes()


@pytest.fixture(scope="module", params=["lpc", "fixed2"])
def flac_blob(request):
    return _flac_bytes(request.param)


def test_wav_truncations(tmp_path, wav_blob):
    # every header byte boundary + strided body truncations
    cuts = list(range(0, 64)) + list(range(64, len(wav_blob), 101))
    for n in cuts:
        _check_one(tmp_path, wav_blob[:n], f"t{n}.wav")


def test_flac_truncations(tmp_path, flac_blob):
    cuts = list(range(0, 64)) + list(range(64, len(flac_blob), 73))
    for n in cuts:
        _check_one(tmp_path, flac_blob[:n], f"t{n}.flac")


def test_wav_byte_flips(tmp_path, wav_blob):
    rng = np.random.default_rng(0)
    blob = bytearray(wav_blob)
    for i in range(300):
        pos = int(rng.integers(0, len(blob)))
        # bias half the mutations into the header region where the fields live
        if i % 2 == 0:
            pos = int(rng.integers(0, 64))
        mutated = bytearray(blob)
        mutated[pos] = int(rng.integers(0, 256))
        _check_one(tmp_path, bytes(mutated), f"f{i}.wav")


def test_flac_byte_flips(tmp_path, flac_blob):
    rng = np.random.default_rng(1)
    for i in range(300):
        pos = int(rng.integers(0, len(flac_blob)))
        if i % 2 == 0:
            pos = int(rng.integers(0, 64))
        mutated = bytearray(flac_blob)
        mutated[pos] = int(rng.integers(0, 256))
        _check_one(tmp_path, bytes(mutated), f"f{i}.flac")


def test_wav_length_field_corruption(tmp_path, wav_blob):
    """Chunk-size fields set to every hostile value class."""
    for off in (4, 16, 40):  # RIFF size, fmt size, data size
        for val in (0, 1, 2**31 - 1, 2**32 - 1, 2**32 - 9, 0x7FFFFFF0):
            mutated = bytearray(wav_blob)
            mutated[off : off + 4] = int(val).to_bytes(4, "little")
            _check_one(tmp_path, bytes(mutated), f"len{off}_{val}.wav")


def test_wav_hostile_fmt_fields(tmp_path, wav_blob):
    """bits/channels values that break the frame-size arithmetic."""
    for off, vals in (
        (22, (0, 1, 7, 255, 65535)),  # channels
        (34, (0, 1, 4, 7, 12, 17, 63, 65535)),  # bits per sample
        (20, (0, 2, 3, 0xFFFE, 65535)),  # format tag
    ):
        for val in vals:
            mutated = bytearray(wav_blob)
            mutated[off : off + 2] = int(val).to_bytes(2, "little")
            _check_one(tmp_path, bytes(mutated), f"fmt{off}_{val}.wav")


def test_magic_prefixed_garbage(tmp_path):
    rng = np.random.default_rng(2)
    for i in range(60):
        body = rng.integers(0, 256, size=int(rng.integers(0, 400)), dtype=np.uint8).tobytes()
        _check_one(tmp_path, b"RIFF" + body, f"g{i}.wav")
        _check_one(tmp_path, b"fLaC" + body, f"g{i}.flac")
        # RIFF....WAVE with garbage chunks
        _check_one(tmp_path, b"RIFF" + body[:4].ljust(4) + b"WAVE" + body, f"gw{i}.wav")


def test_flac_streaminfo_total_samples_lies(tmp_path, flac_blob):
    """A 36-bit total_samples claiming 2^35 must not drive allocation."""
    mutated = bytearray(flac_blob)
    # STREAMINFO: 4 magic + 4 blockheader + 10 bytes -> total_samples spans
    # bytes 21..25 (low 4 bits of 21); set to huge
    for b in range(21, 26):
        mutated[b] = 0xFF
    _check_one(tmp_path, bytes(mutated), "huge.flac")
