"""Committed Citrinet golden .nemo fixture (SE + sentencepiece path lock).

tests/fixtures/tiny_citrinet.nemo carries reference-torch Citrinet weights
(seed 4321) plus a tokenizer.model trained by this repo's own Viterbi-EM
trainer — the full Citrinet import path (fix_vocab inversion, sentencepiece
decode, squeeze-excite) pinned offline.
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent.parent / "fixtures" / "tiny_citrinet.nemo"

pytestmark = pytest.mark.skipif(not FIXTURE.exists(), reason="fixture missing")


@pytest.fixture(scope="module")
def module():
    from thunder_tpu.registry import load_pretrained

    # dispatches to the Citrinet loader: the archive ships a tokenizer.model
    return load_pretrained(str(FIXTURE))


def _wav():
    t = np.arange(16000) / 16000
    return (0.4 * np.sin(2 * np.pi * 220 * t) + 0.3 * np.sin(2 * np.pi * 521 * t)).astype(np.float32)


def test_golden_logit_statistics(module):
    logits, lens = module.forward(_wav()[None], np.array([16000]))
    lg = np.asarray(logits)[0, : int(np.asarray(lens)[0])]
    assert lg.shape == (51, 46)
    assert float(lg.mean()) == pytest.approx(0.0188699, abs=2e-4)
    assert float(lg.std()) == pytest.approx(0.0976740, abs=2e-4)


def test_golden_prediction(module):
    assert (
        module.predict(_wav()[None])[0]
        == " world speech world pr world pr world pr world pr world pr world pr world"
    )


def test_tokenizer_roundtrip(module):
    ids, lengths = module.text_transform.encode(["the quick brown fox"])
    decoded = module.text_transform.decode_prediction(ids, remove_repeated=False)
    assert decoded[0].strip() == "the quick brown fox"
