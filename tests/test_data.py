import json
import struct
import wave
from pathlib import Path

import numpy as np
import pytest

from thunder_tpu.data import (
    AudioFileLoader,
    DataLoader,
    ManifestDatamodule,
    ManifestSpeechDataset,
    asr_collate,
    audio_info,
    load_audio,
    resample,
)
from thunder_tpu.utils import audio_len


def _write_wav(path, data: np.ndarray, rate=16000, sampwidth=2, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 2:
            w.writeframes((data * 32767).astype(np.int16).tobytes())
        elif sampwidth == 4:
            w.writeframes((data * 2147483647).astype(np.int32).tobytes())


@pytest.fixture()
def wav_dir(tmp_path):
    rng = np.random.default_rng(0)
    lengths = [16000, 8000, 24000]
    items = []
    for i, n in enumerate(lengths):
        p = tmp_path / f"a{i}.wav"
        _write_wav(p, 0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000))
        items.append({"audio_filepath": str(p), "text": f"sample {i}", "duration": n / 16000})
    manifest = tmp_path / "manifest.json"
    manifest.write_text("\n".join(json.dumps(it) for it in items))
    return tmp_path, manifest, lengths


def test_load_audio_roundtrip(tmp_path):
    data = np.clip(np.random.default_rng(0).standard_normal(5000) * 0.1, -1, 1).astype(np.float32)
    p = tmp_path / "x.wav"
    _write_wav(p, data)
    audio, sr = load_audio(p)
    assert sr == 16000
    assert audio.shape == (1, 5000)
    np.testing.assert_allclose(audio[0], data, atol=1e-4)


def test_load_audio_stereo_and_widths(tmp_path):
    data = np.stack([np.linspace(-0.5, 0.5, 100), np.linspace(0.5, -0.5, 100)], axis=1)
    p = tmp_path / "st.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes((data * 32767).astype(np.int16).tobytes())
    audio, sr = load_audio(p)
    assert sr == 8000
    assert audio.shape == (2, 100)
    np.testing.assert_allclose(audio.T, data, atol=1e-4)


def test_audio_info_and_len(tmp_path):
    p = tmp_path / "x.wav"
    _write_wav(p, np.zeros(32000), rate=16000)
    info = audio_info(p)
    assert info.sample_rate == 16000 and info.num_frames == 32000
    assert audio_len(p) == pytest.approx(2.0)


def test_resample_sine_preserves_frequency():
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y = resample(x, 16000, 8000)
    assert y.shape[-1] == 8000
    # 440 Hz still dominates the downsampled spectrum
    spec = np.abs(np.fft.rfft(y[0]))
    assert abs(spec.argmax() - 440) <= 2


def test_audio_file_loader_mono_dc_resample(tmp_path):
    data = np.stack([np.ones(1000) * 0.5, np.zeros(1000)], axis=1)  # DC offset, stereo
    p = tmp_path / "dc.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes((data * 32767).astype(np.int16).tobytes())
    loader = AudioFileLoader(force_mono=True, sample_rate=16000)
    out = loader(p)
    assert out.shape[0] == 1
    assert out.shape[1] == 2000  # resampled 8k -> 16k
    assert abs(out.mean()) < 1e-3  # DC removed


def test_manifest_dataset(wav_dir):
    _, manifest, lengths = wav_dir
    ds = ManifestSpeechDataset(manifest, force_mono=True, sample_rate=16000)
    assert len(ds) == 3
    audio, text = ds[0]
    assert audio.shape == (1, lengths[0])
    assert text == "sample 0"
    assert ds.all_outputs() == ["sample 0", "sample 1", "sample 2"]


def test_asr_collate_static_buckets():
    samples = [(np.zeros((1, 9000), dtype=np.float32), "a"), (np.zeros((1, 3000), dtype=np.float32), "b")]
    audio, lengths, texts = asr_collate(samples, pad_multiple=16000)
    assert audio.shape == (2, 16000)
    np.testing.assert_array_equal(lengths, [9000, 3000])  # sorted desc
    assert texts == ["a", "b"]


def test_dataloader_iterates_batches(wav_dir):
    _, manifest, _ = wav_dir
    ds = ManifestSpeechDataset(manifest)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2 == len(dl)
    total = sum(b[0].shape[0] for b in batches)
    assert total == 3
    for audio, lengths, texts in batches:
        assert audio.shape[1] % 16000 == 0
        assert len(texts) == audio.shape[0]


def test_dataloader_worker_counts_agree(wav_dir):
    """Same batches regardless of worker count (reference tests 12 vs 0
    workers, `tests/test_data.py:29-116`)."""
    _, manifest, _ = wav_dir
    ds = ManifestSpeechDataset(manifest)
    batches = {}
    for workers in (1, 8):
        dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=workers)
        batches[workers] = list(dl)
    for (a_audio, a_lens, a_texts), (b_audio, b_lens, b_texts) in zip(batches[1], batches[8]):
        np.testing.assert_array_equal(a_audio, b_audio)
        np.testing.assert_array_equal(a_lens, b_lens)
        assert a_texts == b_texts


def test_manifest_datamodule(wav_dir):
    _, manifest, _ = wav_dir
    dm = ManifestDatamodule(
        train_manifest=str(manifest),
        val_manifest=str(manifest),
        test_manifest=str(manifest),
        batch_size=2,
        num_workers=2,
    )
    dm.setup()
    assert dm.steps_per_epoch == 1
    batch = next(iter(dm.train_dataloader()))
    assert batch[0].ndim == 2


def test_resample_native_fallback_without_scipy(monkeypatch):
    """resample() must work without scipy via the C++ windowed-sinc."""
    import builtins
    import sys

    real_import = builtins.__import__

    def no_scipy(name, *a, **k):
        if name.startswith("scipy"):
            raise ImportError("scipy disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "scipy.signal", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_scipy)
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y = resample(x, 16000, 8000)
    assert y.shape == (1, 8000)
    spec = np.abs(np.fft.rfft(y[0]))
    assert abs(spec.argmax() - 440) <= 1
