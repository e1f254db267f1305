"""Native C++ runtime: build + correctness against python references."""

import wave

import numpy as np
import pytest

native = pytest.importorskip("thunder_tpu.native")

from thunder_tpu.training.metrics import _edit_distance_py, edit_distance  # noqa: E402


def _write_wav(path, data, rate=16000, sampwidth=2, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 2:
            w.writeframes((data * 32767).astype(np.int16).tobytes())
        else:
            w.writeframes((data * 2147483647).astype(np.int32).tobytes())


def test_native_wav_decode_matches_python(tmp_path):
    from thunder_tpu.data.audio_io import _decode_pcm, _parse_wav_header

    rng = np.random.default_rng(0)
    data = np.clip(rng.standard_normal(4000) * 0.3, -1, 1).astype(np.float32)
    p = tmp_path / "x.wav"
    _write_wav(p, data, sampwidth=4)
    audio, sr = native.native_load_wav(str(p))
    assert sr == 16000
    np.testing.assert_allclose(audio[0], data, atol=2e-9)


def test_native_wav_info(tmp_path):
    p = tmp_path / "x.wav"
    _write_wav(p, np.zeros(12345))
    frames, rate, channels, bits = native.native_wav_info(str(p))
    assert (frames, rate, channels, bits) == (12345, 16000, 1, 16)


def test_native_stereo_planar(tmp_path):
    left = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
    right = -left
    inter = np.stack([left, right], axis=1)
    p = tmp_path / "st.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes((inter * 32767).astype(np.int16).tobytes())
    audio, sr = native.native_load_wav(str(p))
    assert audio.shape == (2, 64)
    np.testing.assert_allclose(audio[0], left, atol=1e-4)
    np.testing.assert_allclose(audio[1], right, atol=1e-4)


def test_native_resample_quality():
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native.native_resample(x, 1, 2)
    assert y.shape == (8000,)
    spec = np.abs(np.fft.rfft(y))
    assert abs(spec.argmax() - 440) <= 1
    # amplitude preserved within 1%
    assert abs(np.abs(y[400:-400]).max() - 1.0) < 0.01


def test_native_edit_distance_matches_python():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.integers(0, 5, size=rng.integers(0, 30)).tolist()
        b = rng.integers(0, 5, size=rng.integers(0, 30)).tolist()
        assert native.native_edit_distance(a, b) == _edit_distance_py(a, b)
    assert native.native_edit_distance("kitten", "sitting") == 3


def test_edit_distance_dispatch_words():
    assert edit_distance("abc".split(), "abd".split()) == 1
    assert edit_distance(["the", "cat"], ["the", "dog", "cat"]) == 1


def test_native_ctc_collapse():
    out = native.native_ctc_collapse(np.array([5, 5, 5, 0, 1, 1, 0, 0, 2], dtype=np.int32))
    np.testing.assert_array_equal(out, [5, 0, 1, 0, 2])
    assert native.native_ctc_collapse(np.array([], dtype=np.int32)).size == 0
