"""ARPA LM loading + word-level shallow fusion (beyond-parity serving).

The reference decodes greedily only (/root/reference/src/thunder/module.py:88-100);
these cover the word-LM decode stack: ArpaLM (Katz backoff, KenLM format),
WordNGramLM, the WordFusionLM boundary adapter, and the native C++ mirrors.
"""

import math

import numpy as np
import pytest

from thunder_tpu.ops.ctc_beam import (
    beam_search_decode,
    beam_search_stream,
    log_softmax,
    prefix_beam_search,
)
from thunder_tpu.text.lm import ArpaLM
from thunder_tpu.text.transform import BatchTextTransformer
from thunder_tpu.text.word_fusion import WordFusionLM, WordNGramLM

L10 = math.log(10.0)

ARPA = """\\data\\
ngram 1=5
ngram 2=4
ngram 3=2

\\1-grams:
-1.0 <s> -0.30103
-0.7 the -0.2
-0.9 cat -0.15
-1.2 sat
-2.0 <unk>

\\2-grams:
-0.3 <s> the -0.1
-0.5 the cat -0.05
-0.8 cat sat
-1.1 sat the

\\3-grams:
-0.2 <s> the cat
-0.6 the cat sat

\\end\\
"""


@pytest.fixture()
def arpa_lm(tmp_path):
    path = tmp_path / "test.arpa"
    path.write_text(ARPA)
    return ArpaLM.load(path)


# ---------------------------------------------------------------------------
# ArpaLM: Katz-backoff scoring
# ---------------------------------------------------------------------------


def test_arpa_scoring(arpa_lm):
    lm = arpa_lm
    assert lm.order == 3
    # explicit trigram
    assert lm.score(["<s>", "the"], "cat") == pytest.approx(-0.2 * L10)
    # backoff: trigram (the,cat,the) missing -> bow("the cat") + bigram
    # (cat,the) missing -> bow("cat") + unigram "the"
    want = (-0.05 + -0.15 + -0.7) * L10
    assert lm.score(["the", "cat"], "the") == pytest.approx(want)
    # OOV word walks to the <unk> unigram through the same bow chain
    want = (-0.05 + -0.15 + -2.0) * L10
    assert lm.score(["the", "cat"], "zebra") == pytest.approx(want)
    # context with an unknown word backs off silently (no bow for it)
    assert lm.score(["zebra"], "the") == pytest.approx(-0.7 * L10)


def test_arpa_gzip_load(arpa_lm, tmp_path):
    import gzip

    gz = tmp_path / "test.arpa.gz"
    with gzip.open(gz, "wt") as f:
        f.write(ARPA)
    lm2 = ArpaLM.load(gz)
    assert lm2.score(["<s>", "the"], "cat") == arpa_lm.score(["<s>", "the"], "cat")


def test_arpa_malformed_files_raise_cleanly(tmp_path):
    cases = {
        "empty.arpa": "",
        "no_sections.arpa": "\\data\\\nngram 1=2\n\\end\\\n",
        "no_data.arpa": "\\1-grams:\n-1.0 the\n\\end\\\n",
        "bad_line.arpa": "\\data\\\nngram 1=1\n\n\\1-grams:\n-1.0 the extra tok here\n\\end\\\n",
    }
    for name, content in cases.items():
        path = tmp_path / name
        path.write_text(content)
        with pytest.raises(ValueError):
            ArpaLM.load(path)


def test_arpa_native_score_parity(arpa_lm):
    nat = arpa_lm.native()
    if nat is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    V = len(arpa_lm.words)
    for _ in range(500):
        ctx = [c for c in rng.integers(-1, V, size=rng.integers(0, 5)).tolist() if c >= 0]
        tok = int(rng.integers(-1, V))
        py = arpa_lm.score_ids(ctx, tok if tok >= 0 else None)
        assert nat.score(ctx, tok) == pytest.approx(py, abs=1e-12), (ctx, tok)


# ---------------------------------------------------------------------------
# WordFusionLM: boundary mechanics
# ---------------------------------------------------------------------------


def test_fusion_state_char_style():
    tt = BatchTextTransformer(tokens=list("abct "))
    wlm = WordNGramLM(order=2).fit(["cat cab", "cat a"])
    fus = WordFusionLM(wlm, tt)
    assert fus.style == "char"
    ids = [tt.vocab.stoi[c] for c in "cat c"]
    hist, partial = fus.state_of(ids)
    assert partial == "c"
    assert [wlm.words[h] for h in hist] == ["cat"]
    # non-boundary tokens contribute no bonus
    assert fus(ids, tt.vocab.stoi["a"]) == 0.0
    # completing a known word scores better than an OOV word
    known = fus([tt.vocab.stoi[c] for c in "cat cab"], fus.space_id)
    oov = fus([tt.vocab.stoi[c] for c in "cat cbt"], fus.space_id)
    assert known > oov
    # double space: second space sees an empty partial -> no bonus
    after_space = [tt.vocab.stoi[c] for c in "cat "]
    assert fus(after_space, fus.space_id) == 0.0


def test_fusion_state_sentencepiece_style():
    tt = BatchTextTransformer(tokens=["▁ca", "t", "b", "▁go"])
    wlm = WordNGramLM(order=2).fit(["cat go", "cat go"])
    fus = WordFusionLM(wlm, tt)
    assert fus.style == "sentencepiece"
    s = [tt.vocab.stoi[p] for p in ["▁ca", "t", "▁go"]]
    hist, partial = fus.state_of(s)
    assert partial == "go"
    assert [wlm.words[h] for h in hist] == ["cat"]
    # a new ▁piece completes the previous word
    assert fus(s[:2], tt.vocab.stoi["▁go"]) != 0.0
    # continuation pieces do not
    assert fus(s[:1], tt.vocab.stoi["t"]) == 0.0


def test_fusion_bos_seeding(arpa_lm):
    tt = BatchTextTransformer(tokens=list("thecas "))
    fus = WordFusionLM(arpa_lm, tt)  # bos=True, <s> in the ARPA vocab
    hist, _ = fus.state_of([])
    assert [arpa_lm.words[h] for h in hist] == ["<s>"]
    # first completed word scores the (<s>, w) bigram, not the unigram
    ids = [tt.vocab.stoi[c] for c in "the"]
    assert fus(ids, fus.space_id) == pytest.approx(-0.3 * L10)
    nobos = WordFusionLM(arpa_lm, tt, bos=False)
    assert nobos(ids, nobos.space_id) == pytest.approx(-0.7 * L10)


def test_fusion_steers_ambiguous_decode():
    """The word LM flips an acoustically near-tied word — the WER mechanism."""
    tt = BatchTextTransformer(tokens=list("abct "))
    wlm = WordNGramLM(order=2).fit(["cat cat", "cat cat", "cab a"])
    fus = WordFusionLM(wlm, tt)
    stoi = tt.vocab.stoi
    frames = [stoi["c"], stoi["a"], stoi["t"], stoi[" "], stoi["c"], stoi["a"], None, stoi[" "]]
    logits = np.full((len(frames), tt.num_tokens), -6.0, np.float32)
    for t, v in enumerate(frames):
        if v is None:  # near-tie, acoustics barely prefer "cab"
            logits[t, stoi["b"]] = 3.00
            logits[t, stoi["t"]] = 2.95
        else:
            logits[t, v] = 3.0
    lp = log_softmax(logits)
    blank = tt.vocab.blank_idx

    def text(pref):
        return "".join(tt.vocab.itos[i] for i in pref)

    base = prefix_beam_search(lp, blank, beam_width=8)
    fused = prefix_beam_search(lp, blank, beam_width=8, lm=fus, lm_weight=1.0)
    assert text(base[0][0]) == "cat cab "
    assert text(fused[0][0]) == "cat cat "


def test_lm_save_load_round_trip(tmp_path):
    """Fitted LMs persist (counts + vocab) and score identically after load."""
    from thunder_tpu.text.lm import NGramLM

    rng = np.random.default_rng(2)
    lm = NGramLM(order=3, backoff=0.35, oov_logp=-10.0).fit(
        [rng.integers(0, 20, size=15).tolist() for _ in range(30)]
    )
    p = tmp_path / "lm.npz"
    lm.save(p)
    lm2 = NGramLM.load(p)
    for _ in range(200):
        ctx = rng.integers(0, 20, size=rng.integers(0, 5)).tolist()
        tok = int(rng.integers(0, 20))
        assert lm2.score(ctx, tok) == lm.score(ctx, tok)

    wlm = WordNGramLM(order=2).fit(["cat a cat", "cab a", "the cat sat"])
    pw = tmp_path / "wlm.npz"
    wlm.save(pw)
    wlm2 = WordNGramLM.load(pw)
    assert wlm2.words == wlm.words and wlm2.vocab == wlm.vocab
    for ctx in ([0], [1, 2], []):
        for tok in range(len(wlm.words)):
            assert wlm2.score_ids(ctx, tok) == wlm.score_ids(ctx, tok)

    empty = WordNGramLM(order=2).fit([])
    pe = tmp_path / "e.npz"
    empty.save(pe)
    assert WordNGramLM.load(pe).words == []


def test_hotword_boost_flips_near_tie():
    """Pure hotword fusion (no word LM): contextual biasing for names/terms."""
    tt = BatchTextTransformer(tokens=list("abct "))
    fus = WordFusionLM(None, tt, hotwords={"cat": 4.0})
    stoi = tt.vocab.stoi
    frames = [stoi["c"], stoi["a"], None, stoi[" "]]
    logits = np.full((len(frames), tt.num_tokens), -6.0, np.float32)
    for t, v in enumerate(frames):
        if v is None:
            logits[t, stoi["b"]] = 3.00
            logits[t, stoi["t"]] = 2.95
        else:
            logits[t, v] = 3.0
    lp = log_softmax(logits)
    blank = tt.vocab.blank_idx

    def text(pref):
        return "".join(tt.vocab.itos[i] for i in pref)

    base = prefix_beam_search(lp, blank, beam_width=8)
    boosted = prefix_beam_search(lp, blank, beam_width=8, lm=fus, lm_weight=1.0)
    assert text(base[0][0]) == "cab "
    assert text(boosted[0][0]) == "cat "


def test_word_score_penalizes_word_splits():
    """A negative word_score acts as a word-insertion penalty: with a big
    enough penalty the beam keeps near-tied short words from splitting."""
    tt = BatchTextTransformer(tokens=list("ab "))
    fus = WordFusionLM(None, tt, word_score=-5.0)
    stoi = tt.vocab.stoi
    # near-tie on frame 1 between 'b' (one word "ab") and ' ' (two words)
    frames = [stoi["a"], None, stoi["b"]]
    logits = np.full((len(frames), tt.num_tokens), -6.0, np.float32)
    for t, v in enumerate(frames):
        if v is None:
            logits[t, stoi[" "]] = 3.00
            logits[t, stoi["b"]] = 2.95
        else:
            logits[t, v] = 3.0
    lp = log_softmax(logits)
    blank = tt.vocab.blank_idx
    base = prefix_beam_search(lp, blank, beam_width=8)
    penalized = prefix_beam_search(lp, blank, beam_width=8, lm=fus, lm_weight=1.0)
    base_txt = "".join(tt.vocab.itos[i] for i in base[0][0])
    pen_txt = "".join(tt.vocab.itos[i] for i in penalized[0][0])
    assert " " in base_txt
    assert " " not in pen_txt


# ---------------------------------------------------------------------------
# native C++ fusion parity
# ---------------------------------------------------------------------------


def _native_or_skip(fus):
    nat = fus.native()
    if nat is None:
        pytest.skip("native library unavailable")
    return nat


def test_native_fusion_decode_parity():
    rng = np.random.default_rng(5)
    tt = BatchTextTransformer(tokens=list("abct "))
    wlm = WordNGramLM(order=3).fit(["cat cat a", "cab a cat", "a cat cab"])
    fus = WordFusionLM(wlm, tt)
    _native_or_skip(fus)
    blank = tt.vocab.blank_idx
    logits = (rng.standard_normal((3, 50, tt.num_tokens)) * 2).astype(np.float32)
    lengths = [50, 37, 12]
    r_nat = beam_search_decode(logits, lengths, blank=blank, beam_width=8, lm=fus, lm_weight=1.3)
    r_np = beam_search_decode(
        logits, lengths, blank=blank, beam_width=8, lm=fus, lm_weight=1.3, use_native=False
    )
    assert all(np.array_equal(a, b) for a, b in zip(r_nat, r_np))


def test_native_fusion_stream_parity_carries_word_state():
    """Chunked decoding must carry partial words and word history across
    windows identically on both paths."""
    rng = np.random.default_rng(6)
    tt = BatchTextTransformer(tokens=list("abct "))
    fus = WordFusionLM(WordNGramLM(order=3).fit(["cat cat a", "cab a"]), tt)
    _native_or_skip(fus)
    blank = tt.vocab.blank_idx
    lp = log_softmax((rng.standard_normal((48, tt.num_tokens)) * 2).astype(np.float32))
    st_nat = st_np = None
    for chunk in np.array_split(lp, 5):
        st_nat = beam_search_stream(chunk, blank, beam_width=8, lm=fus, lm_weight=1.3, state=st_nat)
        st_np = beam_search_stream(
            chunk, blank, beam_width=8, lm=fus, lm_weight=1.3, state=st_np, use_native=False
        )
    assert np.array_equal(st_nat.best, st_np.best)
    assert st_nat.best_score == pytest.approx(st_np.best_score, abs=1e-9)


def test_native_fusion_hotwords_word_score_parity():
    rng = np.random.default_rng(9)
    tt = BatchTextTransformer(tokens=list("abct "))
    blank = tt.vocab.blank_idx
    logits = (rng.standard_normal((3, 45, tt.num_tokens)) * 2).astype(np.float32)
    wlm = WordNGramLM(order=2).fit(["cat a cat", "cab a"])
    for fus in (
        WordFusionLM(wlm, tt, word_score=-0.5, hotwords={"cab": 1.5}),
        WordFusionLM(None, tt, hotwords={"cat": 4.0}),  # no word LM at all
        WordFusionLM(None, tt, word_score=-2.0),
    ):
        _native_or_skip(fus)
        r_nat = beam_search_decode(logits, blank=blank, beam_width=8, lm=fus, lm_weight=1.2)
        r_np = beam_search_decode(
            logits, blank=blank, beam_width=8, lm=fus, lm_weight=1.2, use_native=False
        )
        assert all(np.array_equal(a, b) for a, b in zip(r_nat, r_np))


def test_native_fusion_arpa_sentencepiece_parity(arpa_lm):
    rng = np.random.default_rng(7)
    tt = BatchTextTransformer(tokens=["▁the", "▁ca", "t", "▁sat", "x"])
    fus = WordFusionLM(arpa_lm, tt)
    _native_or_skip(fus)
    blank = tt.vocab.blank_idx
    logits = (rng.standard_normal((2, 40, tt.num_tokens)) * 2).astype(np.float32)
    r_nat = beam_search_decode(logits, blank=blank, beam_width=8, lm=fus, lm_weight=1.0)
    r_np = beam_search_decode(
        logits, blank=blank, beam_width=8, lm=fus, lm_weight=1.0, use_native=False
    )
    assert all(np.array_equal(a, b) for a, b in zip(r_nat, r_np))


# ---------------------------------------------------------------------------
# finalization: the pending partial word scores at end-of-utterance
# ---------------------------------------------------------------------------


def test_final_partial_word_gets_fused():
    """A single-word utterance with no trailing separator must still receive
    LM/hotword fusion — applied when ranking FINAL beams only."""
    tt = BatchTextTransformer(tokens=list("abct "))
    fus = WordFusionLM(None, tt, hotwords={"cat": 4.0})
    stoi = tt.vocab.stoi
    frames = [stoi["c"], stoi["a"], None]  # near-tie 'b'/'t', no space after
    logits = np.full((len(frames), tt.num_tokens), -6.0, np.float32)
    for t, v in enumerate(frames):
        if v is None:
            logits[t, stoi["b"]] = 3.00
            logits[t, stoi["t"]] = 2.95
        else:
            logits[t, v] = 3.0
    lp = log_softmax(logits)
    blank = tt.vocab.blank_idx

    def text(pref):
        return "".join(tt.vocab.itos[i] for i in pref)

    # raw search (finalize off, the carried-state semantics) keeps 'cab'
    raw = prefix_beam_search(lp, blank, beam_width=8, lm=fus, lm_weight=1.0)
    assert text(raw[0][0]) == "cab"
    # finalized ranking flips to the hotword
    fin = prefix_beam_search(lp, blank, beam_width=8, lm=fus, lm_weight=1.0, finalize=True)
    assert text(fin[0][0]) == "cat"
    # decode paths finalize on both the native and numpy paths
    for use_native in (True, False):
        ids = beam_search_decode(
            logits[None], blank=blank, beam_width=8, lm=fus, lm_weight=1.0,
            use_native=use_native,
        )[0]
        assert text(ids) == "cat", use_native


def test_stream_flush_finalizes_like_full_decode():
    """flush() must apply the same pending-partial bonus as the one-shot
    decode; partial_text (stream still open) must NOT."""
    from thunder_tpu.ops.ctc_beam import beam_search_stream

    tt = BatchTextTransformer(tokens=list("abct "))
    fus = WordFusionLM(None, tt, hotwords={"cat": 4.0})
    stoi = tt.vocab.stoi
    frames = [stoi["c"], stoi["a"], None]
    logits = np.full((len(frames), tt.num_tokens), -6.0, np.float32)
    for t, v in enumerate(frames):
        if v is None:
            logits[t, stoi["b"]] = 3.00
            logits[t, stoi["t"]] = 2.95
        else:
            logits[t, v] = 3.0
    lp = log_softmax(logits)
    blank = tt.vocab.blank_idx
    state = beam_search_stream(lp, blank, beam_width=8, lm=fus, lm_weight=1.0)

    def text(ids):
        return "".join(tt.vocab.itos[int(i)] for i in ids)

    assert text(state.best) == "cab"  # open stream: raw ranking
    assert text(state.best_final(fus, 1.0)) == "cat"  # finalized
    full = beam_search_decode(logits[None], blank=blank, beam_width=8, lm=fus, lm_weight=1.0)
    assert text(full[0]) == "cat"


# ---------------------------------------------------------------------------
# partial-word lookahead (streaming display ranking)
# ---------------------------------------------------------------------------


def test_partial_lookahead_scores():
    """partial_score = best completion's unigram + hotword boost (+word_score),
    the unk floor when nothing completes the partial, 0 at a word boundary."""
    tt = BatchTextTransformer(tokens=list("abcdorswx "))
    wlm = WordNGramLM(order=2).fit(["cards cards cards cow"])
    fus = WordFusionLM(wlm, tt, hotwords={"cows": 5.0}, word_score=-0.5)
    stoi = tt.vocab.stoi

    def ids(s):
        return [stoi[c] for c in s]

    uni = lambda w: wlm.score_ids((), wlm.word_id(w))
    # "car" completes only into "cards"
    assert fus.partial_score(ids("car")) == pytest.approx(-0.5 + uni("cards"))
    # "co" completes into "cow" (unigram) and the hotword "cows" (0 + 5.0)
    assert fus.partial_score(ids("co")) == pytest.approx(-0.5 + max(uni("cow"), 5.0))
    # nothing in vocab∪hotwords starts with "x": the unk floor
    assert fus.partial_score(ids("x")) == pytest.approx(-0.5 + wlm.score_ids((), None))
    # at a boundary (no partial) there is nothing to look ahead for
    assert fus.partial_score(ids("cow ")) == 0.0
    # a partial that IS a full vocab word counts itself as a completion
    assert fus.partial_score(ids("cow")) >= -0.5 + uni("cow")


def test_best_partial_ranks_in_flight_word():
    """Mid-stream ranking carries the in-flight word's best-case LM evidence;
    carried state and best/best_final are untouched."""
    from thunder_tpu.ops.ctc_beam import BeamState

    tt = BatchTextTransformer(tokens=list("abct "))
    wlm = WordNGramLM(order=2).fit(["cat cat cat cat"])
    fus = WordFusionLM(wlm, tt)
    stoi = tt.vocab.stoi

    def ids(s):
        return tuple(stoi[c] for c in s)

    # acoustics barely prefer the prefix whose pending word can't complete
    beams = {
        ids("cat cb"): (np.log(0.51), float("-inf")),
        ids("cat ca"): (np.log(0.49), float("-inf")),
    }
    state = BeamState(dict(beams))

    def text(arr):
        return "".join(tt.vocab.itos[int(i)] for i in arr)

    assert text(state.best) == "cat cb"  # raw acoustic ranking
    assert text(state.best_partial(fus, 1.0)) == "cat ca"  # lookahead flips it
    # no partial_score hook (plain token LM / None) falls back to .best
    assert text(state.best_partial(None, 1.0)) == "cat cb"
    assert state.beams == beams  # ranking only — state untouched


def test_stream_partial_text_uses_lookahead():
    """Live beam state threaded through beam_search_stream ranks partials
    with the lookahead, while flush finalization is unchanged."""
    from thunder_tpu.ops.ctc_beam import beam_search_stream

    tt = BatchTextTransformer(tokens=list("abct "))
    fus = WordFusionLM(None, tt, hotwords={"cat": 4.0})
    stoi = tt.vocab.stoi
    frames = [stoi["c"], stoi["a"], None]  # near-tie 'b'/'t', word in flight
    logits = np.full((len(frames), tt.num_tokens), -6.0, np.float32)
    for t, v in enumerate(frames):
        if v is None:
            logits[t, stoi["b"]] = 3.00
            logits[t, stoi["t"]] = 2.95
        else:
            logits[t, v] = 3.0
    state = beam_search_stream(
        log_softmax(logits), tt.vocab.blank_idx, beam_width=8, lm=fus, lm_weight=1.0
    )

    def text(ids):
        return "".join(tt.vocab.itos[int(i)] for i in ids)

    # hotword lookahead surfaces "cat" in the live display ranking even
    # though the raw carried ranking still holds "cab"
    assert text(state.best) == "cab"
    assert text(state.best_partial(fus, 1.0)) == "cat"
    assert text(state.best_final(fus, 1.0)) == "cat"


# ---------------------------------------------------------------------------
# end-to-end through the module API
# ---------------------------------------------------------------------------


def test_module_predict_with_word_fusion():
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule

    tt = BatchTextTransformer(tokens=list("abct "))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(filters=(64,), kernel_sizes=(11,), repeat=1, repeat_blocks=1),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=1600,
    )
    fus = WordFusionLM(WordNGramLM(order=2).fit(["cat a", "a cat"]), tt)
    wav = (np.random.default_rng(0).standard_normal((1, 8000)) * 0.2).astype(np.float32)
    lens = np.asarray([8000], np.int32)
    out = module.predict(wav, lens, beam_width=8, lm=fus, lm_weight=0.5)
    assert isinstance(out[0], str)
    # matches a forced numpy-path decode of the same logits
    logits, _, out_lengths = module._eval_fn()(module.variables, wav, lens)
    ids = beam_search_decode(
        np.asarray(logits, np.float32),
        np.asarray(out_lengths),
        blank=module.blank_idx,
        beam_width=8,
        lm=fus,
        lm_weight=0.5,
        use_native=False,
    )
    want = tt.decode_prediction(ids[0][None].astype(np.int64), remove_repeated=False)[0]
    assert out[0] == want
