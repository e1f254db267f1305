"""CTC prefix beam search: brute-force exactness, native parity, decode API."""

import itertools

import numpy as np
import pytest

from thunder_tpu.ops.ctc_beam import beam_search_decode, prefix_beam_search


def brute_force_posteriors(logp, blank):
    """Sum alignment probabilities per collapsed labeling by enumeration."""
    T, V = logp.shape
    scores = {}
    for path in itertools.product(range(V), repeat=T):
        lp = sum(logp[t, v] for t, v in enumerate(path))
        collapsed = []
        prev = None
        for v in path:
            if v != prev and v != blank:
                collapsed.append(v)
            prev = v
        key = tuple(collapsed)
        scores[key] = np.logaddexp(scores.get(key, -np.inf), lp)
    return scores


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_prefix_beam_search_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    T, V = 6, 3
    logits = rng.standard_normal((T, V)) * 2.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    blank = V - 1

    truth = brute_force_posteriors(logp, blank)
    best_true = max(truth.items(), key=lambda kv: kv[1])

    # wide beam: the search is exact (every reachable prefix is kept)
    hyps = prefix_beam_search(logp, blank, beam_width=500)
    assert hyps[0][0] == best_true[0]
    assert hyps[0][1] == pytest.approx(best_true[1], abs=1e-6)
    # every returned hypothesis score matches the true posterior
    for prefix, score in hyps[:10]:
        assert score == pytest.approx(truth[prefix], abs=1e-6)


def test_beam_improves_or_matches_greedy_posterior():
    rng = np.random.default_rng(7)
    T, V = 40, 8
    logits = (rng.standard_normal((T, V)) * 1.5).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    blank = V - 1

    # greedy labeling
    ids = logp.argmax(-1)
    greedy = []
    prev = None
    for v in ids:
        if v != prev and v != blank:
            greedy.append(int(v))
        prev = v

    def posterior(prefix):
        # score a specific labeling via a constrained prefix search
        hyps = dict(prefix_beam_search(logp, blank, beam_width=2000))
        return hyps.get(tuple(prefix), -np.inf)

    hyps = prefix_beam_search(logp, blank, beam_width=64)
    assert hyps[0][1] >= posterior(greedy) - 1e-9


def test_beam_search_decode_batched_and_pruned():
    rng = np.random.default_rng(3)
    B, T, V = 3, 30, 12
    logits = (rng.standard_normal((B, T, V)) * 3).astype(np.float32)
    lengths = [30, 21, 9]
    outs = beam_search_decode(logits, lengths, blank=V - 1, beam_width=8, use_native=False)
    assert len(outs) == B
    for ids in outs:
        assert ids.dtype == np.int32
        assert all(0 <= i < V - 1 for i in ids.tolist())
    # pruning at -inf vs default must agree on a peaked distribution
    peaked = (logits * 4).astype(np.float32)
    a = beam_search_decode(peaked, lengths, blank=V - 1, beam_width=8, prune_logp=-np.inf, use_native=False)
    b = beam_search_decode(peaked, lengths, blank=V - 1, beam_width=8, use_native=False)
    for x, y in zip(a, b):
        assert x.tolist() == y.tolist()


def test_native_beam_search_matches_numpy_reference():
    from thunder_tpu.native import native_available, native_ctc_beam_search

    if not native_available():
        pytest.skip("native library unavailable")
    for seed in range(8):
        rng = np.random.default_rng(seed)
        T, V = 60, 29
        logits = rng.standard_normal((T, V)).astype(np.float32) * 2
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        got = native_ctc_beam_search(logp, V - 1, 16, return_score=True)
        ids, score = got
        hyps = prefix_beam_search(logp, V - 1, 16)
        assert tuple(ids.tolist()) == hyps[0][0]
        assert score == pytest.approx(hyps[0][1], abs=1e-4)


def test_module_predict_beam_width():
    import jax
    import jax.numpy as jnp

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("ab "))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=1600,
    )
    wav = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.1
    lengths = np.array([16000, 9000], np.int32)
    greedy = module.predict(wav, lengths)
    beam1 = module.predict(wav, lengths, beam_width=1)
    beam8 = module.predict(wav, lengths, beam_width=8)
    assert len(beam1) == len(beam8) == len(greedy) == 2
    # all are valid strings over the vocab
    for s in beam1 + beam8:
        assert set(s) <= set("ab ")


def test_engine_predict_beam_width():
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.engine import InferenceEngine
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("ab "))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=1600,
    )
    engine = InferenceEngine(module)
    wav = np.random.default_rng(1).standard_normal((2, 16000)).astype(np.float32) * 0.1
    lengths = np.array([16000, 8000], np.int32)
    beam = engine.predict(wav, lengths, beam_width=8)
    # engine and module run the same weights: beam decodes must agree (f32 CPU)
    assert beam == module.predict(wav, lengths, beam_width=8)


def test_lm_shallow_fusion_steers_ambiguous_decode():
    from thunder_tpu.text.lm import NGramLM

    V, blank = 4, 3  # tokens 0,1,2 + blank
    # logits truly ambiguous between [0,1] and [0,2]
    T = 4
    logp = np.full((T, V), -10.0, np.float32)
    logp[0, 0] = -0.1
    logp[1, blank] = -0.1
    logp[2, 1] = -0.69
    logp[2, 2] = -0.70  # near-tie, [0,1] barely wins acoustically
    logp[3, blank] = -0.1

    base = prefix_beam_search(logp, blank, beam_width=8)
    assert base[0][0] == (0, 1)

    # LM trained on sequences ending 0->2 flips the near-tie
    lm = NGramLM(order=2).fit([[0, 2]] * 50 + [[0, 1]] * 1)
    fused = prefix_beam_search(logp, blank, beam_width=8, lm=lm, lm_weight=1.0)
    assert fused[0][0] == (0, 2)

    # zero weight reduces to the acoustic-only result
    off = prefix_beam_search(logp, blank, beam_width=8, lm=lm, lm_weight=0.0)
    assert off[0][0] == base[0][0]
    assert off[0][1] == pytest.approx(base[0][1])


def test_ngram_lm_backoff_scores():
    from thunder_tpu.text.lm import NGramLM

    lm = NGramLM(order=3).fit([[1, 2, 3], [1, 2, 4], [1, 2, 3]])
    # trigram: P(3 | 1,2) = 2/3, P(4 | 1,2) = 1/3
    assert lm.score([1, 2], 3) == pytest.approx(np.log(2 / 3))
    assert lm.score([1, 2], 4) == pytest.approx(np.log(1 / 3))
    # unseen trigram backs off toward the bigram with the backoff penalty
    assert lm.score([9, 2], 3) == pytest.approx(np.log(0.4) + lm.score([2], 3))
    # unseen everything hits the OOV floor (+ two backoffs)
    assert lm.score([7, 8], 9) == pytest.approx(2 * np.log(0.4) + lm.oov_logp)


def test_fully_pruned_frame_skipped_not_wiped():
    """A frame where every token is below the floor must be skipped (C++
    behavior), not wipe the beam set and return an empty transcript."""
    V, blank, T = 29, 28, 12
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((T, V)).astype(np.float32) * 3
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    logp[5, :] = np.log(1.0 / V)  # flat frame: all ~ -3.37

    strict = prefix_beam_search(logp, blank, beam_width=8, prune_logp=-3.0)
    assert strict and strict[0][0] != ()

    from thunder_tpu.native import native_available, native_ctc_beam_search

    if native_available():
        ids = native_ctc_beam_search(logp, blank, 8, -3.0)
        assert tuple(ids.tolist()) == strict[0][0]


# ---------------------------------------------------------------------------
# cross-chunk carried beam state (VERDICT: chunked beam == full-utterance beam)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_native", [False, True], ids=["numpy", "native"])
def test_stream_state_equals_full_search(use_native):
    """Window-by-window search with carried state must equal the one-shot
    full-utterance search exactly — prefixes and scores — at any cut."""
    from thunder_tpu.ops.ctc_beam import BeamState, beam_search_stream, log_softmax

    rng = np.random.default_rng(11)
    T, V = 40, 6
    logp = log_softmax(rng.standard_normal((T, V)).astype(np.float32) * 2)
    full = prefix_beam_search(logp, blank=0, beam_width=8, prune_logp=-12.0, max_tokens_per_step=50)
    for cuts in ([1], [7], [17], [39], [11, 27], [5, 6, 30]):
        bounds = [0] + cuts + [T]
        state = None
        for a, b in zip(bounds, bounds[1:]):
            state = beam_search_stream(
                logp[a:b], 0, beam_width=8, prune_logp=-12.0,
                max_tokens_per_step=50, state=state, use_native=use_native,
            )
        assert tuple(state.best.tolist()) == full[0][0], cuts
        assert state.best_score == pytest.approx(full[0][1], abs=1e-9)


@pytest.mark.parametrize("use_native", [False, True], ids=["numpy", "native"])
def test_cross_chunk_token_merges(use_native):
    """A token emitted on both sides of the window boundary (no blank
    between) must merge into ONE label — chunk-local searches double it."""
    from thunder_tpu.ops.ctc_beam import beam_search_stream, log_softmax

    blank, a = 2, 0
    frames = [blank, blank, a, a, blank, blank]
    logits = np.full((len(frames), 3), -4.0, np.float32)
    for t, v in enumerate(frames):
        logits[t, v] = 4.0
    logp = log_softmax(logits)
    cut = 3  # splits the two 'a' frames across windows

    # old behavior: independent windows, concatenated labels -> doubled token
    left = prefix_beam_search(logp[:cut], blank, beam_width=4)[0][0]
    right = prefix_beam_search(logp[cut:], blank, beam_width=4)[0][0]
    assert left + right == (a, a)

    # carried state: one continuous search -> single token, equal to full
    state = beam_search_stream(logp[:cut], blank, beam_width=4, use_native=use_native)
    state = beam_search_stream(logp[cut:], blank, beam_width=4, state=state, use_native=use_native)
    full = prefix_beam_search(logp, blank, beam_width=4)
    assert tuple(state.best.tolist()) == (a,)
    assert full[0][0] == (a,)
    assert state.best_score == pytest.approx(full[0][1], abs=1e-9)


def test_stream_state_with_lm_carries_prefix_context():
    """LM shallow fusion across windows scores against the carried prefix
    (chunk-local search could only see the fragment)."""
    from thunder_tpu.ops.ctc_beam import beam_search_stream, log_softmax
    from thunder_tpu.text.lm import NGramLM

    lm = NGramLM(order=2)
    lm.fit([[0, 1]] * 20)  # after token 0, token 1 is likely

    blank = 3
    # frame 0-1: token 0 certain; frames 2-3 (next window): tokens 0/1 tied
    logits = np.full((4, 4), -3.0, np.float32)
    logits[0, 0] = logits[1, blank] = 3.0
    logits[2, 0] = logits[2, 1] = 3.0
    logits[3, blank] = 3.0
    logp = log_softmax(logits)

    state = beam_search_stream(logp[:2], blank, beam_width=8, lm=lm, lm_weight=2.0)
    state = beam_search_stream(logp[2:], blank, beam_width=8, lm=lm, lm_weight=2.0, state=state)
    # the LM tiebreak needs the carried prefix (0,) from window 1
    assert tuple(state.best.tolist()) == (0, 1)


# ---------------------------------------------------------------------------
# native (C++) LM fusion: NGramLM mirrors into tn_lm_*, beam fuses in C++
# ---------------------------------------------------------------------------


def test_native_lm_score_parity():
    """The C++ stupid-backoff scorer must match the Python NGramLM exactly
    (same counts, same backoff walk, same OOV floor)."""
    from thunder_tpu.text.lm import NGramLM

    rng = np.random.default_rng(3)
    V = 12
    corpus = [rng.integers(0, V - 1, size=rng.integers(3, 30)).tolist() for _ in range(40)]
    lm = NGramLM(order=4, backoff=0.3, oov_logp=-9.5).fit(corpus)
    nat = lm.native()
    if nat is None:
        pytest.skip("native library unavailable")
    for _ in range(300):
        ctx = rng.integers(0, V - 1, size=rng.integers(0, 7)).tolist()
        tok = int(rng.integers(0, V - 1))
        assert nat.score(ctx, tok) == pytest.approx(lm.score(ctx, tok), abs=1e-12)


def test_native_lm_fused_beam_matches_numpy():
    """beam_search_decode / beam_search_stream with an NGramLM must produce
    identical results on the native path and the numpy reference (the native
    path fuses the LM inside the C++ search instead of falling back)."""
    from thunder_tpu.native import native_available
    from thunder_tpu.ops.ctc_beam import beam_search_stream, log_softmax
    from thunder_tpu.text.lm import NGramLM

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    V, blank, T = 10, 9, 35
    corpus = [rng.integers(0, blank, size=rng.integers(3, 20)).tolist() for _ in range(30)]
    lm = NGramLM(order=3).fit(corpus)
    logits = (rng.standard_normal((2, T, V)) * 2).astype(np.float32)

    res_nat = beam_search_decode(logits, blank=blank, beam_width=8, lm=lm, lm_weight=0.7)
    res_np = beam_search_decode(
        logits, blank=blank, beam_width=8, lm=lm, lm_weight=0.7, use_native=False
    )
    for a, b in zip(res_nat, res_np):
        assert np.array_equal(a, b)

    lp = log_softmax(logits[0])
    st_nat = st_np = None
    for chunk in np.array_split(lp, 3):
        st_nat = beam_search_stream(
            chunk, blank, beam_width=8, lm=lm, lm_weight=0.7, state=st_nat
        )
        st_np = beam_search_stream(
            chunk, blank, beam_width=8, lm=lm, lm_weight=0.7, state=st_np, use_native=False
        )
    assert np.array_equal(st_nat.best, st_np.best)
    assert st_nat.best_score == pytest.approx(st_np.best_score, abs=1e-9)


def test_native_batch_beam_matches_per_sample():
    """The threaded batch entry point must equal per-sample searches exactly,
    including ragged lengths and LM fusion, for any thread count."""
    from thunder_tpu.native import (
        native_available,
        native_ctc_beam_search,
        native_ctc_beam_search_batch,
    )
    from thunder_tpu.ops.ctc_beam import log_softmax
    from thunder_tpu.text.lm import NGramLM

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(21)
    B, T, V, blank = 7, 60, 11, 10
    logp = log_softmax((rng.standard_normal((B, T, V)) * 2).astype(np.float32))
    lengths = rng.integers(1, T + 1, size=B).tolist()
    lm = NGramLM(order=2).fit([rng.integers(0, blank, size=15).tolist() for _ in range(20)])
    nat_lm = lm.native()

    for use_lm in (False, True):
        kw = dict(lm=nat_lm, lm_weight=0.4) if use_lm else {}
        single = [
            native_ctc_beam_search(
                logp[b, : lengths[b]], blank, 8, -12.0, max_tokens_per_step=50, **kw
            )
            for b in range(B)
        ]
        for n_threads in (1, 4):
            batch = native_ctc_beam_search_batch(
                logp, lengths, blank, 8, -12.0,
                max_tokens_per_step=50, n_threads=n_threads, **kw,
            )
            assert batch is not None
            assert all(np.array_equal(a, b) for a, b in zip(batch, single)), (use_lm, n_threads)


def test_nbest_top1_matches_decode_and_scores_sorted():
    from thunder_tpu.ops.ctc_beam import beam_search_nbest
    from thunder_tpu.text.lm import NGramLM

    rng = np.random.default_rng(17)
    V, blank, T = 8, 7, 30
    logits = (rng.standard_normal((3, T, V)) * 2).astype(np.float32)
    lengths = [30, 22, 9]
    lm = NGramLM(order=2).fit([rng.integers(0, blank, size=12).tolist() for _ in range(20)])
    for kw in ({}, {"lm": lm, "lm_weight": 0.6}):
        best = beam_search_decode(logits, lengths, blank=blank, beam_width=8, **kw)
        ranked = beam_search_nbest(logits, lengths, blank=blank, beam_width=8, nbest=4, **kw)
        for b in range(3):
            assert 1 <= len(ranked[b]) <= 4
            scores = [s for _, s in ranked[b]]
            assert scores == sorted(scores, reverse=True)
            assert np.array_equal(ranked[b][0][0], best[b]), b


def test_nbest_finalized_ranking_with_word_fusion():
    """nbest scores include the end-of-utterance fusion bonus, so the
    hotworded hypothesis outranks the acoustically-better one."""
    from thunder_tpu.ops.ctc_beam import beam_search_nbest
    from thunder_tpu.text.transform import BatchTextTransformer
    from thunder_tpu.text.word_fusion import WordFusionLM

    tt = BatchTextTransformer(tokens=list("abct "))
    fus = WordFusionLM(None, tt, hotwords={"cat": 4.0})
    stoi = tt.vocab.stoi
    frames = [stoi["c"], stoi["a"], None]
    logits = np.full((1, len(frames), tt.num_tokens), -6.0, np.float32)
    for t, v in enumerate(frames):
        if v is None:
            logits[0, t, stoi["b"]] = 3.00
            logits[0, t, stoi["t"]] = 2.95
        else:
            logits[0, t, v] = 3.0
    ranked = beam_search_nbest(
        logits, blank=tt.vocab.blank_idx, beam_width=8, nbest=3, lm=fus, lm_weight=1.0
    )[0]

    def text(ids):
        return "".join(tt.vocab.itos[int(i)] for i in ids)

    assert text(ranked[0][0]) == "cat"
    assert "cab" in [text(ids) for ids, _ in ranked[1:]]


def test_module_predict_nbest():
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("abct "))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(filters=(64,), kernel_sizes=(11,), repeat=1, repeat_blocks=1),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=1600,
    )
    wav = (np.random.default_rng(0).standard_normal((2, 8000)) * 0.2).astype(np.float32)
    lens = np.asarray([8000, 6000], np.int32)
    single = module.predict(wav, lens, beam_width=8)
    ranked = module.predict(wav, lens, beam_width=8, nbest=3)
    assert len(ranked) == 2
    for b in range(2):
        assert ranked[b][0][0] == single[b]  # top-1 text == plain beam
        scores = [s for _, s in ranked[b]]
        assert scores == sorted(scores, reverse=True)
        assert all(isinstance(t, str) for t, _ in ranked[b])
    with pytest.raises(TypeError):
        module.predict(wav, lens, nbest=3)  # nbest is beam-only


def test_native_lm_invalidated_by_refit():
    """fit() after native() must rebuild the C++ mirror with the new counts."""
    from thunder_tpu.text.lm import NGramLM

    lm = NGramLM(order=2)
    lm.fit([[1, 2]] * 5)
    first = lm.native()
    if first is None:
        pytest.skip("native library unavailable")
    before = first.score([1], 2)
    lm.fit([[1, 3]] * 50)  # incremental corpus shifts P(2|1) down
    second = lm.native()
    assert second is not first
    assert second.score([1], 2) == pytest.approx(lm.score([1], 2), abs=1e-12)
    assert second.score([1], 2) < before


def test_chunked_transcribe_beam_equals_full_utterance():
    """End-to-end done-bar: with a context-free frame classifier (window
    log-probs tile the full utterance's exactly), chunked beam decoding
    equals the full-utterance beam decode — including a token astride the
    chunk-grid boundary."""
    from thunder_tpu.module import chunked_transcribe
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("abc "))
    blank = tt.vocab.blank_idx
    ids_a = int(tt.encode(["a"])[0][0, 0])
    V = tt.num_tokens
    spf = 100  # samples per frame

    # chunk grid: chunk=2000, overlap=400 -> trim=2 frames; two chunks over
    # 3600 samples; the stitched boundary falls at global frame 18
    frame_tokens = np.full(36, blank, np.int64)
    frame_tokens[17] = ids_a  # token astride the boundary:
    frame_tokens[18] = ids_a  # frames 17 (chunk 1) and 18 (chunk 2)
    frame_tokens[[5, 30]] = int(tt.encode(["b"])[0][0, 0])
    audio = np.repeat(frame_tokens.astype(np.float32), spf)

    def logits_fn(padded, lengths):
        n = int(lengths[0]) // spf
        blocks = padded[0, : n * spf].reshape(n, spf).mean(axis=1)
        logits = np.full((1, n, V), -4.0, np.float32)
        for t, v in enumerate(np.rint(blocks).astype(int)):
            logits[0, t, v] = 4.0
        return logits, np.asarray([n])

    full_logits, _ = logits_fn(audio[None], [audio.shape[0]])
    full = beam_search_decode(full_logits, [36], blank=blank, beam_width=4)[0]
    want = tt.decode_prediction(full[None].astype(np.int64), remove_repeated=False)[0]
    # the boundary-straddling 'a' must appear ONCE in the full-utterance decode
    assert want == "bab"

    got = chunked_transcribe(
        infer_fn=None,
        text_transform=tt,
        audio=audio,
        chunk_seconds=2000 / 16000,
        overlap_seconds=400 / 16000,
        logits_fn=logits_fn,
        blank_idx=blank,
        beam_width=4,
    )
    assert got == want
