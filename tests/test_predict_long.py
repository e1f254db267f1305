import jax
import numpy as np
import pytest

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text import BatchTextTransformer


@pytest.fixture(scope="module")
def module():
    tt = BatchTextTransformer(tokens=list("abc "))
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=5),
        text_transform=tt,
        sample_len=4000,
    )


def test_predict_long_short_audio_equals_predict(module):
    audio = (np.random.default_rng(0).standard_normal(12000) * 0.2).astype(np.float32)
    assert module.predict_long(audio, chunk_seconds=2.0, overlap_seconds=0.5) == module.predict(audio)[0]


def test_predict_long_chunks(module):
    # 5 s of audio with 1.5 s chunks -> multiple windows stitched
    audio = (np.random.default_rng(1).standard_normal(5 * 16000) * 0.2).astype(np.float32)
    out = module.predict_long(audio, chunk_seconds=1.5, overlap_seconds=0.5)
    assert isinstance(out, str)
    # stitched transcription should be in the same ballpark as single-shot
    single = module.predict(audio)[0]
    ratio = (len(out) + 1) / (len(single) + 1)
    assert 0.5 < ratio < 2.0


def test_engine_predict_long_matches_module(module):
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine

    engine = InferenceEngine(module, compute_dtype=jnp.float32)
    audio = (np.random.default_rng(2).standard_normal(4 * 16000) * 0.2).astype(np.float32)
    assert engine.predict_long(audio, chunk_seconds=1.5, overlap_seconds=0.5) == module.predict_long(
        audio, chunk_seconds=1.5, overlap_seconds=0.5
    )


def test_predict_long_requires_text_transform(module):
    from dataclasses import replace

    bare = replace(module, text_transform=None, _apply_cache={})
    with pytest.raises(ValueError):
        bare.predict_long(np.zeros(32000, np.float32))


def test_predict_long_beam(module):
    """Chunk-level beam decoding on long audio: runs, returns vocab text, and
    engine/module (f32) agree; greedy default unchanged."""
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine

    audio = (np.random.default_rng(3).standard_normal(4 * 16000) * 0.2).astype(np.float32)
    greedy = module.predict_long(audio, chunk_seconds=1.5, overlap_seconds=0.5)
    beam = module.predict_long(audio, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8)
    assert isinstance(beam, str)
    engine = InferenceEngine(module, compute_dtype=jnp.float32)
    assert engine.predict_long(audio, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8) == beam
    # default path unaffected
    assert module.predict_long(audio, chunk_seconds=1.5, overlap_seconds=0.5) == greedy


def test_predict_long_device_beam_matches_host(module):
    """The device cross-chunk stream (beam_backend='device') equals the host
    cross-chunk beam — both are one continuous search over the stitched
    frame timeline.

    Uses the .nemo fixture model (decisive logits) on a tone: a fresh
    random-weight module emits near-uniform logits on which the two backends
    can flip float32 near-ties (different log-semiring accumulation order —
    host numpy dict vs device vectorized), which is measurement noise, not a
    stitch difference; exact window-level equality of the device stream vs
    the device full search is pinned bit-for-bit in
    tests/test_ctc_beam_device.py."""
    from pathlib import Path

    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine
    from thunder_tpu.registry import load_pretrained

    fixture = load_pretrained(
        str(Path(__file__).parent / "fixtures" / "tiny_quartznet.nemo")
    )
    t = np.arange(4 * 16000) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    host = fixture.predict_long(audio, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8)
    dev = fixture.predict_long(
        audio, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8, beam_backend="device"
    )
    assert dev == host
    engine = InferenceEngine(fixture, compute_dtype=jnp.float32)
    assert (
        engine.predict_long(
            audio, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8, beam_backend="device"
        )
        == host
    )
    # an lm on the device backend is accepted: continuous host-side ranking
    # of the carried device beam (tests/test_streaming_lm.py)
    out = fixture.predict_long(
        audio, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8,
        beam_backend="device", lm=lambda ids, tok: 0.0,
    )
    assert out == host  # a zero LM must not change the result


def test_beam_kwargs_without_beam_width_raise(module):
    """Beam-only args must raise consistently for short and long audio
    (advisor finding: behavior used to depend on audio length)."""
    from thunder_tpu.engine import InferenceEngine
    from thunder_tpu.text.lm import NGramLM

    audio = np.zeros(8000, np.float32)
    lm = NGramLM(order=2)
    lm.fit([[1, 2]])
    for call in (
        lambda: module.predict(audio, lm=lm),
        lambda: module.predict(audio, prune_logp=-5.0),
        lambda: module.predict(audio, lm_weight=0.3),
        lambda: module.predict(audio, bogus=1),
        lambda: module.predict_long(audio, prune_logp=-5.0),
        lambda: module.predict_long(np.zeros(80000, np.float32), chunk_seconds=2.0, lm=lm),
    ):
        with pytest.raises(TypeError):
            call()
    engine = InferenceEngine(module)
    with pytest.raises(TypeError):
        engine.predict(audio, lm=lm)
    with pytest.raises(TypeError):
        engine.predict_long(np.zeros(80000, np.float32), chunk_seconds=2.0, prune_logp=-5.0)
