"""Pure-Python fallbacks must work where the native library is unavailable."""

import builtins
import sys
import wave

import numpy as np
import pytest


@pytest.fixture()
def no_native(monkeypatch):
    """Simulate an environment where thunder_tpu.native cannot import."""
    real_import = builtins.__import__

    def blocked(name, *args, **kwargs):
        if name == "thunder_tpu.native" or (name == "thunder_tpu" and args and args[2] and "native" in args[2]):
            raise ImportError("simulated: native unavailable")
        return real_import(name, *args, **kwargs)

    monkeypatch.delitem(sys.modules, "thunder_tpu.native", raising=False)
    monkeypatch.setattr(builtins, "__import__", blocked)
    yield


def test_load_audio_python_fallback(no_native, tmp_path):
    from thunder_tpu.data.audio_io import load_audio

    data = np.clip(np.random.default_rng(0).standard_normal(2000) * 0.2, -1, 1).astype(np.float32)
    p = tmp_path / "x.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((data * 32767).astype(np.int16).tobytes())
    audio, sr = load_audio(p)
    assert sr == 16000
    np.testing.assert_allclose(audio[0], data, atol=1e-4)


def test_edit_distance_python_fallback(no_native):
    from thunder_tpu.training.metrics import edit_distance

    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance(["a", "b"], ["a", "c", "b"]) == 1
