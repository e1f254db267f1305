"""CTC forced alignment (Viterbi) — pinned against brute-force enumeration.

Beyond-parity tool (the reference has no alignment support); the kernel is
a scan-based jitted Viterbi over the same extended lattice as the loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thunder_tpu.ops.ctc import alignment_segments, ctc_forced_align


def brute_force(logp, target, blank):
    """Best (score, path) over all valid extended-state CTC paths."""
    T, _ = logp.shape
    L = len(target)
    S = 2 * L + 1
    z = [blank] * S
    z[1::2] = target
    best = (-np.inf, None)

    def ok_next(s, s2):
        if s2 in (s, s + 1):
            return True
        return s2 == s + 2 and s2 % 2 == 1 and z[s2] != z[s2 - 2]

    stack = [((0,), logp[0, z[0]])] + ([((1,), logp[0, z[1]])] if L else [])
    while stack:
        path, score = stack.pop()
        t = len(path)
        if t == T:
            done = path[-1] in (S - 1, S - 2) if L else path[-1] == 0
            if done and score > best[0]:
                best = (score, path)
            continue
        for s2 in (path[-1], path[-1] + 1, path[-1] + 2):
            if s2 < S and ok_next(path[-1], s2):
                stack.append((path + (s2,), score + logp[t, z[s2]]))
    return best


def test_forced_align_matches_brute_force():
    rng = np.random.default_rng(0)
    V, blank = 5, 4
    for trial in range(25):
        T = int(rng.integers(3, 8))
        L = int(rng.integers(0, min(3, T // 2) + 1))
        target = rng.integers(0, blank, size=L).tolist()
        logits = rng.standard_normal((T, V)).astype(np.float32) * 2
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        want_score, want_path = brute_force(logp, target, blank)

        tgt = np.zeros((1, max(L, 1)), np.int32)
        tgt[0, :L] = target
        states, labels, scores = ctc_forced_align(
            jnp.asarray(logp)[None], jnp.asarray([T]), jnp.asarray(tgt), jnp.asarray([L]), blank
        )
        if want_path is None:
            assert float(scores[0]) == -np.inf
            continue
        assert float(scores[0]) == pytest.approx(want_score, abs=1e-4)
        # ties may pick a different argmax path; the returned path must be
        # valid and score identically
        z = [blank] * (2 * L + 1)
        z[1::2] = target
        path = states[0, :T].tolist()
        path_score = sum(logp[t, z[s]] for t, s in enumerate(path))
        assert path_score == pytest.approx(want_score, abs=1e-4)
        np.testing.assert_array_equal(
            np.asarray(labels)[0, :T], np.asarray([z[s] for s in path])
        )


def test_forced_align_batched_ragged():
    """Batched call must equal per-sample calls despite padding (both axes)."""
    rng = np.random.default_rng(1)
    V, blank, max_t = 6, 5, 12
    lengths = [12, 7, 4]
    tgt_lens = [3, 2, 0]
    logits = rng.standard_normal((3, max_t, V)).astype(np.float32) * 2
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    targets = np.zeros((3, 3), np.int32)
    targets[0, :3] = [0, 1, 0]
    targets[1, :2] = [2, 2]

    states_b, labels_b, scores_b = ctc_forced_align(
        jnp.asarray(logp), jnp.asarray(lengths), jnp.asarray(targets), jnp.asarray(tgt_lens), blank
    )
    for b in range(3):
        lone_tgt = targets[b : b + 1, : max(tgt_lens[b], 1)]
        s1, l1, sc1 = ctc_forced_align(
            jnp.asarray(logp[b : b + 1, : lengths[b]]),
            jnp.asarray([lengths[b]]),
            jnp.asarray(lone_tgt),
            jnp.asarray([tgt_lens[b]]),
            blank,
        )
        assert float(scores_b[b]) == pytest.approx(float(sc1[0]), abs=1e-4)
        np.testing.assert_array_equal(
            np.asarray(states_b)[b, : lengths[b]], np.asarray(s1)[0]
        )


def test_alignment_segments_and_repeated_tokens():
    """State (not label) tracking separates repeated tokens ('aa') cleanly."""
    blank = 2
    # frames: a a blank a a blank   -> target "aa": token 0 then token 1
    frames = [0, 0, blank, 0, 0, blank]
    logp = np.full((6, 3), -8.0, np.float32)
    for t, v in enumerate(frames):
        logp[t, v] = 0.0
    states, labels, scores = ctc_forced_align(
        jnp.asarray(logp)[None], jnp.asarray([6]), jnp.asarray([[0, 0]]), jnp.asarray([2]), blank
    )
    segs = alignment_segments(states, [6], [2])
    assert segs[0] == [(0, 2), (3, 5)]
    assert float(scores[0]) == pytest.approx(0.0, abs=1e-5)


def test_module_align_end_to_end():
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
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 16000)) * 0.2).astype(np.float32)
    lengths = np.asarray([16000, 12000], np.int32)
    texts = ["cat", "ab"]
    spans, scores = module.align(audio, texts, lengths)
    assert [len(s) for s in spans] == [3, 2]
    for b, text in enumerate(texts):
        assert "".join(tok for tok, _, _ in spans[b]) == text
        assert np.isfinite(scores[b])
        duration = lengths[b] / 16000
        prev_end = 0.0
        for _, start, end in spans[b]:
            assert 0.0 <= start < end <= duration + 1e-6
            assert start >= prev_end - 1e-6  # tokens in temporal order
            prev_end = start


# ---------------------------------------------------------------------------
# word spans + subtitle rendering (host-side, on top of align output)
# ---------------------------------------------------------------------------


def test_word_spans_char_and_sentencepiece():
    from thunder_tpu.text.subtitles import word_spans

    # char style: separators end words and are dropped
    toks = [("c", 0.0, 0.1), ("a", 0.1, 0.2), ("t", 0.2, 0.3), (" ", 0.3, 0.35),
            ("g", 0.4, 0.5), ("o", 0.5, 0.6)]
    assert word_spans(toks) == [("cat", 0.0, 0.3), ("go", 0.4, 0.6)]
    # sentencepiece style: ▁ starts a word
    toks = [("▁ca", 0.0, 0.2), ("t", 0.2, 0.3), ("▁go", 0.4, 0.6)]
    assert word_spans(toks) == [("cat", 0.0, 0.3), ("go", 0.4, 0.6)]
    # trailing partial word still closes
    assert word_spans([("a", 0.0, 0.1)]) == [("a", 0.0, 0.1)]
    assert word_spans([]) == []
    # vocabulary specials are dropped, not glued into words
    toks = [("<s>", 0.0, 0.1), ("c", 0.1, 0.2), ("<unk>", 0.2, 0.3), ("a", 0.3, 0.4),
            (" ", 0.4, 0.45), ("</s>", 0.5, 0.6)]
    assert word_spans(toks) == [("ca", 0.1, 0.4)]
    # explicit specials override the <...> default
    assert word_spans([("<x>", 0.0, 0.1), ("a", 0.1, 0.2)], specials={"a"}) == [
        ("<x>", 0.0, 0.1)
    ]


def test_srt_and_vtt_rendering():
    from thunder_tpu.text.subtitles import to_srt, to_vtt

    toks = [("h", 0.0, 0.2), ("i", 0.2, 0.4), (" ", 0.4, 0.45),
            ("t", 1.0, 1.2), ("u", 1.2, 1.5)]
    srt = to_srt(toks)
    assert srt.startswith("1\n00:00:00,000 --> 00:00:01,500\nhi tu")
    vtt = to_vtt(toks)
    assert vtt.startswith("WEBVTT")
    assert "00:00:00.000 --> 00:00:01.500" in vtt

    # cue splitting by max_chars
    many = []
    t = 0.0
    for w in ["alpha", "beta", "gamma", "delta"]:
        for ch in w:
            many.append((ch, t, t + 0.1))
            t += 0.1
        many.append((" ", t, t))
    srt = to_srt(many, max_chars=11)
    blocks = [b for b in srt.split("\n\n") if b.strip()]
    assert len(blocks) == 2
    assert "alpha beta" in blocks[0] and "gamma delta" in blocks[1]


def test_align_to_srt_end_to_end():
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer
    from thunder_tpu.text.subtitles import to_srt, word_spans

    tt = BatchTextTransformer(tokens=list("abct "))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(filters=(64,), kernel_sizes=(11,), repeat=1, repeat_blocks=1),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=1600,
    )
    audio = (np.random.default_rng(0).standard_normal((1, 16000)) * 0.2).astype(np.float32)
    spans, _ = module.align(audio, ["cat ab"], np.asarray([16000], np.int32))
    words = word_spans(spans[0])
    assert [w for w, _, _ in words] == ["cat", "ab"]
    srt = to_srt(spans[0])
    assert "cat ab" in srt and "-->" in srt
