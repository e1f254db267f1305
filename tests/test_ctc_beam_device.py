"""On-device (jit/XLA) CTC prefix beam search vs the host reference.

The device kernel (`thunder_tpu/ops/ctc_beam_device.py`) must reproduce the
host search (`thunder_tpu/ops/ctc_beam.py` numpy reference / C++ runtime)
exactly: same surviving prefixes, same scores (up to float32 accumulation
order).  The reference framework has no beam search at all
(/root/reference/src/thunder/module.py:88-100 — greedy only).
"""

import jax
import numpy as np
import pytest

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.ops.ctc_beam import beam_search_decode, beam_search_nbest
from thunder_tpu.ops.ctc_beam_device import beam_search_device
from thunder_tpu.text import BatchTextTransformer


@pytest.fixture(scope="module")
def tiny_module():
    tt = BatchTextTransformer(tokens=list("abc "))
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat=1, filters=(32,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )


def _random_logits(rng, B, T, V, scale=2.0):
    return rng.normal(0.0, scale, (B, T, V)).astype(np.float32)


@pytest.mark.parametrize("seed", range(6))
def test_device_matches_host_best_path(seed):
    rng = np.random.default_rng(seed)
    B, T, V = 4, 37, 11
    logits = _random_logits(rng, B, T, V)
    lengths = rng.integers(1, T + 1, size=B)
    lengths[0] = T
    blank = V - 1
    kw = dict(blank=blank, beam_width=8, prune_logp=-12.0, max_tokens_per_step=6)
    host = beam_search_decode(logits, lengths=lengths, **kw)
    dev = beam_search_device(logits, lengths=lengths, **kw)
    for h, d in zip(host, dev):
        assert h.tolist() == d.tolist()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_host_nbest(seed):
    rng = np.random.default_rng(100 + seed)
    B, T, V = 3, 25, 9
    logits = _random_logits(rng, B, T, V)
    lengths = np.array([25, 13, 2])
    kw = dict(blank=V - 1, beam_width=8, nbest=4, prune_logp=-12.0, max_tokens_per_step=5)
    host = beam_search_nbest(logits, lengths=lengths, **kw)
    dev = beam_search_device(logits, lengths=lengths, **kw)
    for hrow, drow in zip(host, dev):
        assert len(hrow) == len(drow)
        for (hi, hs), (di, ds) in zip(hrow, drow):
            assert hi.tolist() == di.tolist()
            assert hs == pytest.approx(ds, abs=2e-3)


def test_device_peaked_logits_match_greedy_collapse():
    # near-one-hot frames: the best beam must equal the collapsed argmax path
    rng = np.random.default_rng(7)
    V, blank = 6, 5
    path = [1, 1, blank, 2, 2, 3, blank, blank, 3, 4]
    logits = np.full((1, len(path), V), -8.0, np.float32)
    for t, p in enumerate(path):
        logits[0, t, p] = 8.0
    logits += rng.normal(0, 0.01, logits.shape).astype(np.float32)
    (dev,) = beam_search_device(logits, blank=blank, beam_width=4)
    assert dev.tolist() == [1, 2, 3, 3, 4]


def test_device_prune_floor_can_empty_frames():
    # every token below the floor on some frames: those frames are no-ops,
    # matching the host's "empty candidate set -> skip frame" behavior
    rng = np.random.default_rng(11)
    B, T, V = 2, 12, 8
    logits = _random_logits(rng, B, T, V, scale=0.3)  # flat -> logp ~ -2.1
    kw = dict(blank=V - 1, beam_width=6, prune_logp=-2.0, max_tokens_per_step=V)
    host = beam_search_decode(logits, **kw)
    dev = beam_search_device(logits, **kw)
    for h, d in zip(host, dev):
        assert h.tolist() == d.tolist()


def test_device_zero_length_row():
    logits = np.random.default_rng(3).normal(0, 2, (2, 10, 7)).astype(np.float32)
    dev = beam_search_device(logits, lengths=[0, 10], blank=6, beam_width=4)
    assert dev[0].tolist() == []
    host = beam_search_decode(logits, lengths=[0, 10], blank=6, beam_width=4)
    assert dev[1].tolist() == host[1].tolist()


def test_device_wide_beam_full_vocab():
    # no top-k pruning (max_tokens_per_step=None keeps all V tokens)
    rng = np.random.default_rng(21)
    B, T, V = 2, 20, 10
    logits = _random_logits(rng, B, T, V)
    host = beam_search_decode(logits, blank=0, beam_width=16, max_tokens_per_step=None)
    dev = beam_search_device(logits, blank=0, beam_width=16, max_tokens_per_step=None)
    for h, d in zip(host, dev):
        assert h.tolist() == d.tolist()


@pytest.mark.parametrize("seed", range(3))
def test_pallas_kernel_matches_host(seed):
    # the VMEM-resident Pallas kernel (interpreter off-TPU) must reproduce
    # the host search exactly, like the XLA scan does
    rng = np.random.default_rng(300 + seed)
    B, T, V = 3, 29, 9
    logits = _random_logits(rng, B, T, V)
    lengths = np.array([29, 13, 1])
    kw = dict(blank=V - 1, beam_width=8, prune_logp=-12.0, max_tokens_per_step=None)
    host = beam_search_decode(logits, lengths=lengths, **kw)
    pal = beam_search_device(logits, lengths=lengths, use_pallas=True, **kw)
    for h, d in zip(host, pal):
        assert h.tolist() == d.tolist()


def test_pallas_kernel_nbest_and_blocking():
    # T spanning multiple kernel blocks + nbest scores
    rng = np.random.default_rng(42)
    B, T, V = 2, 70, 7
    logits = _random_logits(rng, B, T, V)
    kw = dict(blank=0, beam_width=6, nbest=3, max_tokens_per_step=None)
    host = beam_search_nbest(logits, **kw)
    pal = beam_search_device(logits, use_pallas=True, **kw)
    for hrow, drow in zip(host, pal):
        for (hi, hs), (di, ds) in zip(hrow, drow):
            assert hi.tolist() == di.tolist()
            assert hs == pytest.approx(ds, abs=2e-3)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_kernel_topk_pruned_matches_host(seed):
    # max_tokens_per_step < V: one XLA top_k pre-prunes the vocabulary and
    # the kernel searches the reduced candidate stream (the BPE-vocab path)
    rng = np.random.default_rng(500 + seed)
    B, T, V = 3, 31, 40
    logits = _random_logits(rng, B, T, V)
    lengths = np.array([31, 20, 4])
    kw = dict(blank=V - 1, beam_width=6, prune_logp=-10.0, max_tokens_per_step=7)
    host = beam_search_decode(logits, lengths=lengths, **kw)
    pal = beam_search_device(logits, lengths=lengths, use_pallas=True, **kw)
    for h, d in zip(host, pal):
        assert h.tolist() == d.tolist()


def test_pallas_rejects_oversized_candidate_block():
    logits = np.zeros((1, 5, 3000), np.float32)
    with pytest.raises(ValueError, match="beam_width"):
        beam_search_device(logits, beam_width=16, max_tokens_per_step=None, use_pallas=True)


def test_module_predict_device_backend(tiny_module):
    audio = np.random.default_rng(0).normal(0, 0.1, (2, 4000)).astype(np.float32)
    host = tiny_module.predict(audio, beam_width=8)
    dev = tiny_module.predict(audio, beam_width=8, beam_backend="device")
    assert host == dev
    ranked_h = tiny_module.predict(audio, beam_width=8, nbest=2)
    ranked_d = tiny_module.predict(audio, beam_width=8, nbest=2, beam_backend="device")
    for hrow, drow in zip(ranked_h, ranked_d):
        assert [t for t, _ in hrow] == [t for t, _ in drow]
        for (_, hs), (_, ds) in zip(hrow, drow):
            assert hs == pytest.approx(ds, abs=2e-3)


def test_module_device_backend_rejects_stray_args(tiny_module):
    audio = np.zeros((1, 4000), np.float32)
    # an lm on the device backend is accepted (host-side rescoring of the
    # surviving beam — tests/test_streaming_lm.py covers the semantics)
    out = tiny_module.predict(audio, beam_width=4, beam_backend="device", lm=lambda ids, tok: 0.0)
    assert isinstance(out, list) and len(out) == 1
    with pytest.raises(TypeError, match="beam_backend"):
        tiny_module.predict(audio, beam_backend="device")
    with pytest.raises(ValueError, match="unknown beam_backend"):
        tiny_module.predict(audio, beam_width=4, beam_backend="gpu")


def test_device_stream_matches_full_and_host():
    # windows tiling the utterance == one full-utterance search (device),
    # and == the host cross-chunk stream (BeamState) — same guarantee the
    # host beam_search_stream pins in tests/test_ctc_beam.py
    from thunder_tpu.ops.ctc_beam import BeamState, beam_search_stream, log_softmax
    from thunder_tpu.ops.ctc_beam_device import beam_search_device_stream

    rng = np.random.default_rng(77)
    B, T, V, W = 2, 45, 9, 8
    logits = rng.normal(0, 2.0, (B, T, V)).astype(np.float32)
    blank = V - 1
    kw = dict(blank=blank, beam_width=W, prune_logp=-12.0, max_tokens_per_step=None)

    full = beam_search_device(logits, use_pallas=True, **kw)

    state = None
    for lo, hi in [(0, 17), (17, 30), (30, 45)]:
        state = beam_search_device_stream(logits[:, lo:hi], state=state, **kw)
    chunked = state.best()
    for f, c in zip(full, chunked):
        assert f.tolist() == c.tolist()

    # host stream (per sample) must agree too
    for b in range(B):
        hs = None
        for lo, hi in [(0, 17), (17, 30), (30, 45)]:
            hs = beam_search_stream(
                log_softmax(logits[b, lo:hi]), blank, beam_width=W,
                prune_logp=-12.0, max_tokens_per_step=V, state=hs,
            )
        assert hs.best.tolist() == chunked[b].tolist()


def test_device_stream_ragged_windows_and_lengths():
    from thunder_tpu.ops.ctc_beam_device import beam_search_device_stream

    rng = np.random.default_rng(99)
    B, T, V, W = 3, 40, 7, 6
    logits = rng.normal(0, 2.0, (B, T, V)).astype(np.float32)
    lengths = np.array([40, 26, 9])
    kw = dict(blank=V - 1, beam_width=W, max_tokens_per_step=None)

    full = beam_search_device(logits, lengths=lengths, use_pallas=True, **kw)

    # stream in ragged windows; per-window lengths clip at each row's total
    state = None
    for lo, hi in [(0, 7), (7, 8), (8, 31), (31, 40)]:
        win_len = np.clip(lengths - lo, 0, hi - lo)
        state = beam_search_device_stream(
            logits[:, lo:hi], lengths=win_len, state=state, **kw
        )
    for f, c in zip(full, state.best()):
        assert f.tolist() == c.tolist()


def test_device_stream_zero_frame_window_is_noop():
    # host stream treats an empty window as a no-op; the device stream must
    # too (review finding: it used to crash compiling a grid-0 kernel)
    from thunder_tpu.ops.ctc_beam_device import beam_search_device_stream

    rng = np.random.default_rng(13)
    B, T, V, W = 2, 20, 7, 6
    logits = rng.normal(0, 2.0, (B, T, V)).astype(np.float32)
    kw = dict(blank=V - 1, beam_width=W, max_tokens_per_step=None)

    # fresh state + empty window: one live empty prefix
    st0 = beam_search_device_stream(logits[:, 0:0], **kw)
    assert [p.tolist() for p in st0.best()] == [[], []]

    full = beam_search_device(logits, use_pallas=True, **kw)
    st = None
    for lo, hi in [(0, 8), (8, 8), (8, 20), (20, 20)]:
        st = beam_search_device_stream(logits[:, lo:hi], state=st, **kw)
    for f, c in zip(full, st.best()):
        assert f.tolist() == c.tolist()


def test_device_stream_rejects_oversized_candidate_block():
    from thunder_tpu.ops.ctc_beam_device import beam_search_device_stream

    logits = np.zeros((1, 5, 3000), np.float32)
    with pytest.raises(ValueError, match="beam_width"):
        beam_search_device_stream(logits, beam_width=16, max_tokens_per_step=None)
