"""Continuous LM fusion across chunk boundaries (round-4 VERDICT item 5).

Host backend: windows seeded with carried beams ARE one continuous
shallow-fusion search — tiling a full utterance's log-probs into windows
must reproduce the full-utterance search exactly, LM and all, including a
word straddling the window boundary.

Device backend: the LM never enters the accelerator search; partial AND
final rankings apply it continuously on the host
(``DeviceBeamState.best_ranked`` / ``beam_search_device(lm=...)``).
"""

import numpy as np
import pytest

from thunder_tpu.ops.ctc_beam import BeamState, beam_search_stream, log_softmax
from thunder_tpu.ops.ctc_beam_device import (
    DeviceBeamState,
    beam_search_device,
    beam_search_device_stream,
    lm_prefix_score,
)
from thunder_tpu.text import BatchTextTransformer
from thunder_tpu.text.lm import NGramLM
from thunder_tpu.text.word_fusion import WordFusionLM, WordNGramLM

TT = BatchTextTransformer(tokens=list("abc "))
BLANK = TT.vocab.blank_idx


def _rand_logp(T, rng, peaky=1.5):
    V = TT.num_tokens
    return log_softmax((rng.standard_normal((T, V)) * peaky).astype(np.float32))


def _window_starts(T, win):
    return list(range(0, T, win))


def _lms():
    return [
        ("ngram", NGramLM.from_texts(["abc cab", "cab abc", "a b c"], TT, order=3), 0.8),
        (
            "fusion",
            WordFusionLM(
                WordNGramLM(order=2).fit(["cab a", "a cab"]), TT, word_score=-0.2
            ),
            0.8,
        ),
    ]


@pytest.mark.parametrize("use_native", [False, True])
@pytest.mark.parametrize("name,lm,w", _lms(), ids=[n for n, _, _ in _lms()])
def test_host_windowed_lm_fusion_equals_full(name, lm, w, use_native):
    """Tiled windows + carried state + LM == one full-utterance fused search."""
    rng = np.random.default_rng(7)
    lp = _rand_logp(240, rng)
    full = beam_search_stream(
        lp, BLANK, beam_width=6, lm=lm, lm_weight=w, use_native=use_native
    ).best_final(lm, w)
    for win in (37, 80, 120):  # uneven tilings straddle tokens arbitrarily
        st = None
        for s in _window_starts(lp.shape[0], win):
            st = beam_search_stream(
                lp[s : s + win], BLANK, beam_width=6, lm=lm, lm_weight=w,
                state=st, use_native=use_native,
            )
        got = st.best_final(lm, w)
        np.testing.assert_array_equal(got, full), (win, name)


def test_boundary_straddling_word_host():
    """A word whose letters straddle the window boundary gets its fusion
    bonus exactly as in the full search — and the LM (not acoustics) decides
    the word."""
    a, b, c, sp = (TT.vocab.stoi[t] for t in ("a", "b", "c", " "))
    V = TT.num_tokens
    T = 8
    logits = np.full((T, V), -8.0, np.float32)
    # frames: c a [boundary] ? ' '  where ? is acoustically ambiguous b-vs-c
    logits[0, c] = 0.0
    logits[1, a] = 0.0
    logits[2] = -8.0
    logits[2, BLANK] = 0.0
    logits[3, b] = 0.05   # acoustics slightly prefer "cab"
    logits[3, c] = 0.0
    logits[4, sp] = 0.0
    logits[5, a] = 0.0
    logits[6, BLANK] = 0.0
    logits[7, BLANK] = 0.0
    lp = log_softmax(logits)

    # LM trained on "cac": must flip the straddling third letter b -> c
    fus = WordFusionLM(
        WordNGramLM(order=2).fit(["cac a", "a cac", "cac"]), TT,
        word_score=0.0,
    )
    # windows split INSIDE the word (after frame 2): 'ca' in window 1, the
    # ambiguous letter + the completing space in window 2
    def run(lm, w, win):
        st = None
        for s in _window_starts(T, win):
            st = beam_search_stream(
                lp[s : s + win], BLANK, beam_width=8, lm=lm, lm_weight=w, state=st
            )
        return st.best_final(lm, w)

    no_lm = run(None, 0.0, 3)
    with_lm = run(fus, 3.0, 3)
    full = beam_search_stream(lp, BLANK, beam_width=8, lm=fus, lm_weight=3.0)
    np.testing.assert_array_equal(with_lm, full.best_final(fus, 3.0))
    assert TT.decode_prediction(no_lm[None], remove_repeated=False)[0] == "cab a"
    assert TT.decode_prediction(with_lm[None], remove_repeated=False)[0] == "cac a"


def test_lm_prefix_score_matches_host_accumulation():
    """lm_prefix_score == the bonus sum the host search accumulates."""
    lm = NGramLM.from_texts(["abc cab", "cab abc"], TT, order=3)
    prefix = [TT.vocab.stoi[t] for t in "cab ab"]
    want = sum(lm(tuple(prefix[:i]), prefix[i]) for i in range(len(prefix)))
    assert lm_prefix_score(lm, np.asarray(prefix), final=True) == pytest.approx(want)

    fus = WordFusionLM(WordNGramLM(order=2).fit(["cab a"]), TT, word_score=-0.5)
    want = sum(fus(tuple(prefix[:i]), prefix[i]) for i in range(len(prefix)))
    assert lm_prefix_score(fus, np.asarray(prefix), final=False) == pytest.approx(
        want + fus.partial_score(tuple(prefix))
    )
    assert lm_prefix_score(fus, np.asarray(prefix), final=True) == pytest.approx(
        want + fus.final_score(tuple(prefix))
    )


@pytest.mark.parametrize("name,lm,w", _lms(), ids=[n for n, _, _ in _lms()])
def test_device_stream_lm_ranking_matches_device_full(name, lm, w):
    """Device stream + continuous LM ranking at flush == the one-shot device
    search with the same LM rescoring."""
    rng = np.random.default_rng(11)
    lp = _rand_logp(160, rng)
    full = beam_search_device(
        lp[None], blank=BLANK, beam_width=6, lm=lm, lm_weight=w
    )[0]
    st = None
    for s in _window_starts(lp.shape[0], 50):
        st = beam_search_device_stream(
            lp[None, s : s + 50], blank=BLANK, beam_width=6, state=st
        )
    got = st.best_ranked(lm, w, final=True)[0]
    np.testing.assert_array_equal(got, full)


def test_device_lm_rescoring_matches_host_fusion_when_beam_is_wide():
    """With a beam wide enough that fusion never changes which prefixes
    survive, device rescoring and host in-search fusion pick the same
    winner."""
    rng = np.random.default_rng(3)
    # short + peaky: the live-prefix set stays well under the beam width, so
    # fused and unfused searches keep identical survivor sets and only the
    # final ranking differs
    lp = _rand_logp(14, rng, peaky=3.0)
    lm = NGramLM.from_texts(["abc cab", "cab abc", "a b c"], TT, order=3)
    host = beam_search_stream(
        lp, BLANK, beam_width=32, lm=lm, lm_weight=0.3, use_native=False
    ).best_final(lm, 0.3)
    device = beam_search_device(
        lp[None], blank=BLANK, beam_width=32, lm=lm, lm_weight=0.3,
        max_tokens_per_step=TT.num_tokens,
    )[0]
    np.testing.assert_array_equal(device, host)


def test_device_partial_ranking_reflects_lm_before_flush():
    """Two acoustically near-tied beams: the LM must re-order the partial
    ranking on the FIRST window — before any flush."""
    a, b = TT.vocab.stoi["a"], TT.vocab.stoi["b"]
    V = TT.num_tokens
    logits = np.full((2, V), -8.0, np.float32)
    logits[0, a] = 0.1   # acoustics slightly prefer "a"
    logits[0, b] = 0.0
    logits[1, BLANK] = 0.0
    lp = log_softmax(logits)
    lm = NGramLM.from_texts(["b b b"], TT, order=2)  # LM strongly prefers "b"
    st = beam_search_device_stream(lp[None], blank=BLANK, beam_width=4)
    acoustic = st.best()[0]
    ranked = st.best_ranked(lm, 5.0, final=False)[0]
    assert TT.decode_prediction(acoustic[None], remove_repeated=False)[0] == "a"
    assert TT.decode_prediction(ranked[None], remove_repeated=False)[0] == "b"


def test_streaming_transcriber_device_lm(tmp_path):
    """Module-level: StreamingTranscriber(device backend, lm) flush equals
    predict_long with the same settings, and partials are LM-ranked."""
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.streaming import StreamingTranscriber

    tt = BatchTextTransformer(tokens=list("abc "))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(filters=(64,), kernel_sizes=(11,), repeat=2, repeat_blocks=1),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=1600,
    )
    lm = NGramLM.from_texts(["abc cab", "cab abc"], tt, order=3)
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(int(4.2 * 16000)) * 0.2).astype(np.float32)
    kw = dict(beam_width=4, beam_backend="device", lm=lm, lm_weight=0.8)

    want = module.predict_long(
        audio, chunk_seconds=2.0, overlap_seconds=0.5, **kw
    )
    st = StreamingTranscriber(
        module, chunk_seconds=2.0, overlap_seconds=0.5, **kw
    )
    partials = [st.push(audio[i : i + 9000]) for i in range(0, len(audio), 9000)]
    assert all(isinstance(p, str) for p in partials)
    assert st.flush() == want


def test_device_predict_lm_nbest_ranked():
    """predict-style nbest on the device backend returns LM-rescored scores
    in descending order."""
    rng = np.random.default_rng(19)
    lp = _rand_logp(40, rng)
    lm = NGramLM.from_texts(["abc cab"], TT, order=2)
    hyps = beam_search_device(
        lp[None], blank=BLANK, beam_width=8, nbest=4, lm=lm, lm_weight=0.6
    )[0]
    assert 1 <= len(hyps) <= 4
    scores = [s for _, s in hyps]
    assert scores == sorted(scores, reverse=True)
    ids, s0 = hyps[0]
    # the reported score includes the LM term
    acoustic = beam_search_device(lp[None], blank=BLANK, beam_width=8, nbest=8)[0]
    match = [sc for pids, sc in acoustic if np.array_equal(pids, ids)]
    assert match and s0 == pytest.approx(
        match[0] + 0.6 * lm_prefix_score(lm, ids, final=True), abs=1e-4
    )
