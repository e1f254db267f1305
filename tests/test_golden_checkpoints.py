"""Golden pretrained-checkpoint tests (network or local fixtures required).

The exact-output tests from the reference
(`tests/quartznet/test_module_qn.py:18-29`, `tests/citrinet/test_module_cn.py:
13-25`, `tests/huggingface/test_module_huggingface.py:57-67`): load the real
NGC/HF checkpoints and the 16 kHz sample wav, assert the pinned
transcriptions.

Two ways to run them:

1. **Local fixture dir (preferred; works without egress):** set
   ``THUNDER_FIXTURES=/path/to/dir`` containing pre-downloaded artifacts —
   ``<name>.nemo`` for NeMo checkpoints, ``<org>__<model>/`` dirs
   (``save_pretrained`` layout) for HuggingFace ids, and the sample wav.
   Each test's skip message prints the exact fetch command for its artifact.
2. **Networked CI:** with egress, the tests download into ``~/.thunder``
   (``RUN_SLOW=1`` required, as in the reference CI).

This build environment has zero egress and no fixture dir, so they auto-skip
here; the offline proxies are tests/quartznet/test_nemo_import.py (parity vs
the actual reference torch encoder) and tests/wav2vec2/test_hf_families.py.
"""

import os
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import mark_slow
from thunder_tpu.utils import get_default_cache_folder

SAMPLE_URL = (
    "https://github.com/fastaudio/10_Speakers_Sample/raw/"
    "76f365de2f4d282ec44450d68f5b88de37b8b7ad/train/f0001_us_f0001_00001.wav"
)
SAMPLE_NAME = "f0001_us_f0001_00001.wav"
EXPECTED = "the world needs opportunities for new leaders and new ideas"

# name -> (fixture filename/dirname, fetch command shown in the skip reason)
NGC_URLS = {
    "QuartzNet5x5LS_En": (
        "https://api.ngc.nvidia.com/v2/models/nvidia/nemospeechmodels/versions/"
        "1.0.0a5/files/QuartzNet5x5LS-En.nemo"
    ),
    "stt_en_citrinet_256": (
        "https://api.ngc.nvidia.com/v2/models/nvidia/nemo/stt_en_citrinet_256/"
        "versions/1.0.0rc1/files/stt_en_citrinet_256.nemo"
    ),
}


def fixtures_dir():
    d = os.environ.get("THUNDER_FIXTURES")
    return Path(d) if d else None


def _fetch_hint(name: str) -> str:
    """The exact command that populates $THUNDER_FIXTURES for this artifact."""
    if name == SAMPLE_NAME:
        return f"wget -O $THUNDER_FIXTURES/{SAMPLE_NAME} '{SAMPLE_URL}'"
    if "/" in name:  # HuggingFace id
        local = name.replace("/", "__")
        return (
            "python -c \"from transformers import AutoModelForCTC, AutoTokenizer, "
            f"AutoFeatureExtractor; [c.from_pretrained('{name}').save_pretrained("
            f"'$THUNDER_FIXTURES/{local}') for c in (AutoModelForCTC, AutoTokenizer, "
            "AutoFeatureExtractor)]\""
        )
    return f"wget -O $THUNDER_FIXTURES/{name}.nemo '{NGC_URLS[name]}'"


def resolve_checkpoint(name: str) -> str:
    """Map a checkpoint name to a local fixture if THUNDER_FIXTURES has one;
    otherwise return the name unchanged (network path)."""
    fix = fixtures_dir()
    if fix is None:
        return name
    if "/" in name:
        local = fix / name.replace("/", "__")
        if local.is_dir():
            return str(local) + "/"  # keep a "/" so registry dispatches to HF
    else:
        local = fix / f"{name}.nemo"
        if local.exists():
            return str(local)
    pytest.skip(
        f"THUNDER_FIXTURES={fix} lacks {local.name}; populate it with:\n  "
        + _fetch_hint(name)
    )


def _load(name: str):
    from thunder_tpu.registry import load_pretrained

    resolved = resolve_checkpoint(name)
    if resolved == name:  # no fixture -> network; any failure skips
        try:
            return load_pretrained(name)
        except Exception as err:
            pytest.skip(
                f"network unavailable ({err}); for offline runs set "
                f"THUNDER_FIXTURES and run:\n  {_fetch_hint(name)}"
            )
    return load_pretrained(resolved)


@pytest.fixture(scope="session")
def sample_wav():
    fix = fixtures_dir()
    if fix is not None:
        local = fix / SAMPLE_NAME
        if local.exists():
            return str(local)
    path = get_default_cache_folder() / SAMPLE_NAME
    if not path.exists():
        try:
            urllib.request.urlretrieve(SAMPLE_URL, str(path))
        except Exception as err:
            pytest.skip(
                f"network unavailable ({err}); for offline runs set "
                f"THUNDER_FIXTURES and run:\n  {_fetch_hint(SAMPLE_NAME)}"
            )
    return str(path)


def _assert_transcription(name: str, sample_wav: str, expected: str):
    from thunder_tpu.data import load_audio

    module = _load(name)
    audio, sr = load_audio(sample_wav)
    assert sr == 16000
    assert module.predict(audio)[0].strip() == expected


def test_fixture_resolution(tmp_path, monkeypatch):
    """The THUNDER_FIXTURES mechanism itself (fast, no network): a present
    artifact resolves to its local path; a missing one skips with the exact
    fetch command; unset env passes names through to the network path."""
    monkeypatch.setenv("THUNDER_FIXTURES", str(tmp_path))
    # .nemo fixture hit
    (tmp_path / "QuartzNet5x5LS_En.nemo").write_bytes(b"")
    assert resolve_checkpoint("QuartzNet5x5LS_En") == str(
        tmp_path / "QuartzNet5x5LS_En.nemo"
    )
    # HF dir hit (save_pretrained layout), keeps a "/" for registry dispatch
    (tmp_path / "facebook__wav2vec2-base-960h").mkdir()
    resolved = resolve_checkpoint("facebook/wav2vec2-base-960h")
    assert resolved.rstrip("/") == str(tmp_path / "facebook__wav2vec2-base-960h")
    assert "/" in resolved
    # miss -> skip whose reason carries the populate command
    with pytest.raises(pytest.skip.Exception) as exc:
        resolve_checkpoint("stt_en_citrinet_256")
    assert "wget" in str(exc.value) and "stt_en_citrinet_256.nemo" in str(exc.value)
    # unset -> passthrough (network path)
    monkeypatch.delenv("THUNDER_FIXTURES")
    assert resolve_checkpoint("QuartzNet5x5LS_En") == "QuartzNet5x5LS_En"


@mark_slow
def test_quartznet5x5_golden_transcription(sample_wav):
    _assert_transcription("QuartzNet5x5LS_En", sample_wav, EXPECTED)


@mark_slow
def test_citrinet256_golden_transcription(sample_wav):
    _assert_transcription("stt_en_citrinet_256", sample_wav, EXPECTED)


@mark_slow
def test_wav2vec2_golden_transcription(sample_wav):
    _assert_transcription("facebook/wav2vec2-base-960h", sample_wav, EXPECTED.upper())


@mark_slow
def test_hubert_golden_transcription(sample_wav):
    # HuBERT rides the same AutoModelForCTC path as the reference
    # (`/root/reference/src/thunder/huggingface/compatibility.py:65-112`);
    # offline proxy: tests/wav2vec2/test_hf_families.py
    _assert_transcription("facebook/hubert-large-ls960-ft", sample_wav, EXPECTED.upper())


@mark_slow
def test_data2vec_audio_golden_transcription(sample_wav):
    _assert_transcription(
        "facebook/data2vec-audio-base-960h", sample_wav, EXPECTED.upper()
    )
