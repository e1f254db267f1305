"""CLI surface smoke tests (offline, fixture checkpoint)."""

import json
import wave
from pathlib import Path

import numpy as np
import pytest

from thunder_tpu.__main__ import main

FIXTURE = str(Path(__file__).parent / "fixtures" / "tiny_quartznet.nemo")


@pytest.fixture()
def wav_path(tmp_path):
    t = np.arange(12000) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "clip.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((x * 32767).astype(np.int16).tobytes())
    return str(path)


def test_cli_transcribe_greedy_and_beam(wav_path, capsys):
    main(["transcribe", "--checkpoint", FIXTURE, wav_path])
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["audio"] == wav_path and isinstance(rec["text"], str)

    main(["transcribe", "--checkpoint", FIXTURE, "--beam-width", "4", wav_path])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(rec["text"], str)


def test_cli_transcribe_long_beam(wav_path, capsys):
    # force a genuinely multi-chunk grid (clip 0.75 s, chunks 0.3 s,
    # CLI-derived overlap 0.075 s) and pin against the library path
    main(["transcribe", "--checkpoint", FIXTURE, "--chunk-seconds", "0.3",
          "--beam-width", "4", wav_path])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from thunder_tpu.registry import load_pretrained
    from thunder_tpu.data import AudioFileLoader

    module = load_pretrained(FIXTURE)
    wav = np.asarray(AudioFileLoader(sample_rate=16000)(wav_path), np.float32).reshape(-1)
    want = module.predict_long(wav, chunk_seconds=0.3, overlap_seconds=0.075, beam_width=4)
    assert rec["text"] == want


def test_chunked_transcribe_rejects_overlap_ge_chunk():
    from thunder_tpu.module import chunked_transcribe
    from thunder_tpu.streaming import StreamingTranscriber

    with pytest.raises(ValueError, match="overlap"):
        chunked_transcribe(lambda *_: None, None, np.zeros(32000, np.float32),
                           chunk_seconds=0.4, overlap_seconds=2.0)


def test_cli_export(tmp_path, capsys):
    out = tmp_path / "bundle"
    main(["export", "--checkpoint", FIXTURE, "--output", str(out)])
    assert (out / "config.json").exists() or any(out.iterdir())


def test_cli_train_smoke(tmp_path, capsys):
    # 4-clip manifest, 1 epoch
    t = np.arange(8000) / 16000.0
    entries = []
    for i in range(4):
        x = (0.3 * np.sin(2 * np.pi * (300 + 100 * i) * t)).astype(np.float32)
        p = tmp_path / f"c{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((x * 32767).astype(np.int16).tobytes())
        entries.append({"audio_filepath": str(p), "duration": 0.5, "text": "tu"})
    man = tmp_path / "train.json"
    man.write_text("\n".join(json.dumps(e) for e in entries))
    main(["train", "--checkpoint", FIXTURE, "--train-manifest", str(man),
          "--val-manifest", str(man), "--epochs", "1", "--batch-size", "2"])
