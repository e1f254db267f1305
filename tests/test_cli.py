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


def test_cli_transcribe_device_beam_backend(wav_path, capsys):
    main(["transcribe", "--checkpoint", FIXTURE, "--beam-width", "4", wav_path])
    host = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(["transcribe", "--checkpoint", FIXTURE, "--beam-width", "4",
          "--beam-backend", "device", wav_path])
    dev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dev["text"] == host["text"]


def test_cli_long_audio_device_beam_matches_host(wav_path, capsys):
    # the device cross-chunk stream carries beam state across windows just
    # like the host search — same transcript either way
    main(["transcribe", "--checkpoint", FIXTURE, "--chunk-seconds", "0.3",
          "--beam-width", "4", wav_path])
    host = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(["transcribe", "--checkpoint", FIXTURE, "--chunk-seconds", "0.3",
          "--beam-width", "4", "--beam-backend", "device", wav_path])
    dev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dev["text"] == host["text"]


def test_cli_transcribe_long_beam(wav_path, capsys):
    # force a genuinely multi-chunk grid (clip 0.75 s, chunks 0.3 s,
    # CLI-derived overlap 0.075 s) and pin against the library path
    main(["transcribe", "--checkpoint", FIXTURE, "--chunk-seconds", "0.3",
          "--beam-width", "4", wav_path])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from thunder_tpu.registry import load_pretrained
    from thunder_tpu.data import load_audio

    module = load_pretrained(FIXTURE)
    wav, sr = load_audio(wav_path)  # the CLI's own loader (no DC removal)
    assert sr == 16000
    want = module.predict_long(
        np.asarray(wav, np.float32).reshape(-1),
        chunk_seconds=0.3, overlap_seconds=0.075, beam_width=4,
    )
    assert rec["text"] == want.strip()


def test_chunked_transcribe_rejects_overlap_ge_chunk():
    from thunder_tpu.module import chunked_transcribe
    from thunder_tpu.streaming import StreamingTranscriber

    with pytest.raises(ValueError, match="overlap"):
        chunked_transcribe(lambda *_: None, None, np.zeros(32000, np.float32),
                           chunk_seconds=0.4, overlap_seconds=2.0)


def test_streaming_rejects_overlap_ge_chunk():
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.streaming import StreamingTranscriber
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("ab "))
    module = CTCModule.create(
        jax.random.PRNGKey(0), audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(filters=(64,), kernel_sizes=(11,), repeat=1, repeat_blocks=1),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens), text_transform=tt, sample_len=1600,
    )
    with pytest.raises(ValueError, match="overlap"):
        StreamingTranscriber(module, chunk_seconds=0.4, overlap_seconds=2.0)
    with pytest.raises(TypeError, match="beam_width"):
        module.predict(np.zeros((1, 1600), np.float32), use_native=False)


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


def _write_manifest(tmp_path, n=3):
    t = np.arange(8000) / 16000.0
    entries = []
    for i in range(n):
        x = (0.3 * np.sin(2 * np.pi * (300 + 100 * i) * t)).astype(np.float32)
        p = tmp_path / f"e{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((x * 32767).astype(np.int16).tobytes())
        entries.append({"audio_filepath": str(p), "duration": 0.5, "text": "tu ta"})
    man = tmp_path / "eval.json"
    man.write_text("\n".join(json.dumps(e) for e in entries))
    return str(man)


def test_cli_eval_greedy_and_fused(tmp_path, capsys):
    man = _write_manifest(tmp_path)
    main(["eval", "--checkpoint", FIXTURE, "--manifest", man, "--batch-size", "2",
          "--num-workers", "0"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["utterances"] == 3
    assert 0.0 <= rec["cer"] and 0.0 <= rec["wer"]
    assert rec["audio_seconds"] == pytest.approx(1.5, abs=0.01)

    # hotword fusion implies the beam decode; still produces a valid report
    main(["eval", "--checkpoint", FIXTURE, "--manifest", man, "--batch-size", "2",
          "--num-workers", "0", "--hotword", "tu:3"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["utterances"] == 3 and rec["rtf"] > 0


def test_cli_transcribe_timestamps(wav_path, capsys):
    main(["transcribe", "--checkpoint", FIXTURE, "--timestamps", wav_path])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    if rec["text"]:
        assert rec["tokens"], rec
        assert all(0.0 <= tk["start"] <= tk["end"] for tk in rec["tokens"])
        # spans cover the (unstripped) decoded transcript token-for-token
        assert "".join(tk["token"] for tk in rec["tokens"]).strip() == rec["text"]


def test_cli_beam_backend_requires_beam_width(wav_path):
    with pytest.raises(SystemExit, match="beam-width"):
        main(["transcribe", "--checkpoint", FIXTURE, "--beam-backend", "device", wav_path])
