"""Committed golden .nemo fixture: byte-exact regression lock, fully offline.

tests/fixtures/tiny_quartznet.nemo was produced from the reference torch
implementation (seed 1234) in the raw NeMo layout.  These assertions pin the
whole load -> frontend -> encoder -> decode pipeline across rounds; if an
importer/numerics regression lands, the stats move.
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent.parent / "fixtures" / "tiny_quartznet.nemo"

pytestmark = pytest.mark.skipif(not FIXTURE.exists(), reason="fixture missing")


@pytest.fixture(scope="module")
def module():
    from thunder_tpu.compat import load_quartznet_checkpoint

    return load_quartznet_checkpoint(str(FIXTURE))


def _wav():
    t = np.arange(16000) / 16000
    return (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 521 * t)
        + 0.2 * np.sin(2 * np.pi * 1033 * t)
    ).astype(np.float32)


def test_golden_logit_statistics(module):
    logits, lens = module.forward(_wav()[None], np.array([16000]))
    lg = np.asarray(logits)[0, : int(np.asarray(lens)[0])]
    assert lg.shape == (51, 29)
    assert float(lg.mean()) == pytest.approx(-0.0376482, abs=2e-4)
    assert float(lg.std()) == pytest.approx(0.1956763, abs=2e-4)


def test_golden_argmax_path(module):
    logits, lens = module.forward(_wav()[None], np.array([16000]))
    ids = np.argmax(np.asarray(logits)[0, : int(np.asarray(lens)[0])], -1)
    np.testing.assert_array_equal(ids, np.full(51, 19))
    assert module.predict(_wav()[None]) == ["t"]


def test_golden_registry_dispatch(module):
    """load_pretrained with the fixture path routes through the NeMo loader."""
    from thunder_tpu.registry import load_pretrained

    mod = load_pretrained(str(FIXTURE))
    assert mod.predict(_wav()[None]) == ["t"]


def test_golden_engine_agrees(module):
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine

    engine = InferenceEngine(module, compute_dtype=jnp.float32)
    assert engine.predict(_wav()[None]) == ["t"]
