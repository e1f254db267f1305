"""Golden pretrained-checkpoint tests (network required; auto-skip offline).

The exact-output tests from the reference
(`tests/quartznet/test_module_qn.py:18-29`, `tests/citrinet/test_module_cn.py:
13-25`, `tests/huggingface/test_module_huggingface.py:57-67`): download the
real NGC/HF checkpoints and the 16 kHz sample wav, assert the pinned
transcriptions.  Any network failure skips (this build environment has zero
egress; CI elsewhere can run them with RUN_SLOW=1).
"""

import os
import urllib.request

import numpy as np
import pytest

from tests.conftest import mark_slow
from thunder_tpu.utils import get_default_cache_folder

SAMPLE_URL = (
    "https://github.com/fastaudio/10_Speakers_Sample/raw/"
    "76f365de2f4d282ec44450d68f5b88de37b8b7ad/train/f0001_us_f0001_00001.wav"
)
EXPECTED = "the world needs opportunities for new leaders and new ideas"


def _network(fn):
    try:
        return fn()
    except Exception as err:  # any download/connectivity failure -> skip
        pytest.skip(f"network unavailable: {err}")


@pytest.fixture(scope="session")
def sample_wav():
    path = get_default_cache_folder() / "f0001_us_f0001_00001.wav"
    if not path.exists():
        _network(lambda: urllib.request.urlretrieve(SAMPLE_URL, str(path)))
    return str(path)


@mark_slow
def test_quartznet5x5_golden_transcription(sample_wav):
    from thunder_tpu.data import load_audio
    from thunder_tpu.registry import load_pretrained

    module = _network(lambda: load_pretrained("QuartzNet5x5LS_En"))
    audio, sr = load_audio(sample_wav)
    assert sr == 16000
    assert module.predict(audio)[0].strip() == EXPECTED


@mark_slow
def test_citrinet256_golden_transcription(sample_wav):
    from thunder_tpu.data import load_audio
    from thunder_tpu.registry import load_pretrained

    module = _network(lambda: load_pretrained("stt_en_citrinet_256"))
    audio, sr = load_audio(sample_wav)
    assert module.predict(audio)[0].strip() == EXPECTED


@mark_slow
def test_wav2vec2_golden_transcription(sample_wav):
    from thunder_tpu.data import load_audio
    from thunder_tpu.registry import load_pretrained

    module = _network(lambda: load_pretrained("facebook/wav2vec2-base-960h"))
    audio, sr = load_audio(sample_wav)
    assert module.predict(audio)[0].strip() == EXPECTED.upper()


@mark_slow
def test_hubert_golden_transcription(sample_wav):
    # HuBERT rides the same AutoModelForCTC path as the reference
    # (`/root/reference/src/thunder/huggingface/compatibility.py:65-112`);
    # offline proxy: tests/wav2vec2/test_hf_families.py
    from thunder_tpu.data import load_audio
    from thunder_tpu.registry import load_pretrained

    module = _network(lambda: load_pretrained("facebook/hubert-large-ls960-ft"))
    audio, sr = load_audio(sample_wav)
    assert module.predict(audio)[0].strip() == EXPECTED.upper()


@mark_slow
def test_data2vec_audio_golden_transcription(sample_wav):
    from thunder_tpu.data import load_audio
    from thunder_tpu.registry import load_pretrained

    module = _network(lambda: load_pretrained("facebook/data2vec-audio-base-960h"))
    audio, sr = load_audio(sample_wav)
    assert module.predict(audio)[0].strip() == EXPECTED.upper()
