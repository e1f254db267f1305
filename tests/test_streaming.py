"""StreamingTranscriber must reproduce chunked_transcribe exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule, chunked_transcribe
from thunder_tpu.streaming import StreamingTranscriber
from thunder_tpu.text import BatchTextTransformer


@pytest.fixture(scope="module")
def module():
    tt = BatchTextTransformer(tokens=list("abc "))
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(filters=(64,), kernel_sizes=(11,), repeat=2, repeat_blocks=1),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=1600,
    )


def reference(module, audio, chunk_s, overlap_s):
    def infer(padded, lengths):
        _, preds, out_lengths = module._eval_fn()(
            module.variables, jnp.asarray(padded), jnp.asarray(lengths)
        )
        return preds, out_lengths

    return chunked_transcribe(
        infer, module.text_transform, audio,
        chunk_seconds=chunk_s, overlap_seconds=overlap_s, sample_rate=16000,
    )


@pytest.mark.parametrize(
    "total_s,push_sizes",
    [
        (3.7, [1600, 4000, 16000, 7000]),      # ragged pushes
        (4.0, [16000]),                          # exact chunk-grid boundary
        (1.0, [16000]),                          # shorter than one chunk
        (2.0, [100]),                            # exactly one chunk, tiny pushes
    ],
)
def test_streaming_matches_chunked(module, total_s, push_sizes):
    chunk_s, overlap_s = 2.0, 0.5
    rng = np.random.default_rng(int(total_s * 10))
    audio = (rng.standard_normal(int(total_s * 16000)) * 0.2).astype(np.float32)

    want = reference(module, audio, chunk_s, overlap_s)

    st = StreamingTranscriber(module, chunk_seconds=chunk_s, overlap_seconds=overlap_s)
    i = 0
    k = 0
    partials = []
    while i < len(audio):
        n = push_sizes[k % len(push_sizes)]
        partials.append(st.push(audio[i : i + n]))
        i += n
        k += 1
    got = st.flush()
    assert got == want
    # partials are stable prefixes of the final transcript
    for p in partials:
        assert want.startswith(p)


def test_streaming_engine_predictor(module):
    from thunder_tpu.engine import InferenceEngine

    engine = InferenceEngine(module, compute_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(int(3.2 * 16000)) * 0.2).astype(np.float32)
    st = StreamingTranscriber(engine, chunk_seconds=2.0, overlap_seconds=0.5)
    st.push(audio)
    got = st.flush()
    assert got == reference(module, audio, 2.0, 0.5)
    with pytest.raises(RuntimeError):
        st.push(audio[:100])


def test_streaming_matches_chunked_randomized(module):
    """Randomized sweep over stream lengths, push patterns, and chunk grids."""
    rng = np.random.default_rng(123)
    for trial in range(6):
        # coarse grid for chunk_s so trials share compiled executables
        chunk_s = 1.25 + 0.25 * int(rng.integers(0, 5))
        overlap_s = float(rng.uniform(0.2, 0.8))
        total = int(rng.uniform(0.5, 6.0) * 16000)
        audio = (rng.standard_normal(total) * 0.2).astype(np.float32)
        want = reference(module, audio, chunk_s, overlap_s)
        st = StreamingTranscriber(module, chunk_seconds=chunk_s, overlap_seconds=overlap_s)
        i = 0
        partials = []
        while i < total:
            n = int(rng.integers(50, 20000))
            partials.append(st.push(audio[i : i + n]))
            i += n
        got = st.flush()
        assert got == want, (trial, chunk_s, overlap_s, total)
        for p_ in partials:
            assert got.startswith(p_), (trial, p_, got)


def test_streaming_beam_flush_matches_predict_long(module):
    """Beam mode: flush() must equal predict_long(beam_width=...) — the
    carried-state search is the same continuous search either way."""
    from thunder_tpu.streaming import StreamingTranscriber

    rng = np.random.default_rng(21)
    audio = (rng.standard_normal(4 * 16000) * 0.2).astype(np.float32)
    want = module.predict_long(audio, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8)

    st = StreamingTranscriber(module, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8)
    i = 0
    for size in (7000, 16000, 1000, 25000, 9000, 100000):
        st.push(audio[i : i + size])
        i += size
        if i >= audio.shape[0]:
            break
    assert isinstance(st.partial_text, str)
    assert st.flush() == want

    # short audio (single window) equals predict's beam path via predict_long
    short = audio[:16000]
    want_short = module.predict_long(short, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8)
    st2 = StreamingTranscriber(module, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8)
    st2.push(short)
    assert st2.flush() == want_short


def test_streaming_beam_kwargs_without_width_raise(module):
    from thunder_tpu.streaming import StreamingTranscriber

    with pytest.raises(TypeError):
        StreamingTranscriber(module, prune_logp=-5.0)
    with pytest.raises(TypeError):
        StreamingTranscriber(module, lm_weight=0.3)
    with pytest.raises(TypeError):
        StreamingTranscriber(module, beam_backend="device")


def test_streaming_device_beam_flush_matches_predict_long(module):
    """Device-backend streaming: flush() == predict_long(beam_backend=
    'device') — the carried device state is the same continuous search, and
    the chunk logits never cross to the host."""
    from thunder_tpu.streaming import StreamingTranscriber

    rng = np.random.default_rng(33)
    audio = (rng.standard_normal(4 * 16000) * 0.2).astype(np.float32)
    want = module.predict_long(
        audio, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8, beam_backend="device"
    )

    st = StreamingTranscriber(
        module, chunk_seconds=1.5, overlap_seconds=0.5, beam_width=8, beam_backend="device"
    )
    i = 0
    for size in (7000, 16000, 1000, 25000, 9000, 100000):
        st.push(audio[i : i + size])
        i += size
        if i >= audio.shape[0]:
            break
    assert isinstance(st.partial_text, str)
    assert st.flush() == want

    # an LM on the device backend is accepted (continuous host-side ranking
    # of the carried device beam — see test_device_stream_lm_ranking)
    StreamingTranscriber(module, beam_width=4, beam_backend="device", lm=lambda ids, tok: 0.0)


def test_pool_device_beam_matches_individual(module):
    from thunder_tpu.streaming import StreamingPool, StreamingTranscriber

    rng = np.random.default_rng(11)
    feeds = [
        (rng.standard_normal(int(s * 16000)) * 0.2).astype(np.float32)
        for s in (3.0, 4.5)
    ]
    want = []
    for f in feeds:
        st = StreamingTranscriber(
            module, chunk_seconds=2.0, overlap_seconds=0.5, beam_width=4, beam_backend="device"
        )
        st.push(f)
        want.append(st.flush())

    pool = StreamingPool(
        module, batch_size=2, chunk_seconds=2.0, overlap_seconds=0.5,
        beam_width=4, beam_backend="device",
    )
    ids = [pool.open() for _ in feeds]
    for sid, f in zip(ids, feeds):
        pool.push(sid, f)
    got = [pool.flush(sid) for sid in ids]
    assert got == want


# ---------------------------------------------------------------------------
# StreamingPool: batched concurrent streams == independent transcribers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("batch_size", [1, 3, 8])
@pytest.mark.parametrize("beam", [False, True], ids=["greedy", "beam"])
def test_pool_matches_individual_streams(module, batch_size, beam):
    from thunder_tpu.streaming import StreamingPool

    kw = dict(chunk_seconds=2.0, overlap_seconds=0.5)
    if beam:
        kw["beam_width"] = 4
    rng = np.random.default_rng(7)
    feeds = [
        (rng.standard_normal(int(s * 16000)) * 0.2).astype(np.float32)
        for s in (3.7, 5.2, 2.0)
    ]

    want = []
    for audio in feeds:
        st = StreamingTranscriber(module, **kw)
        st.push(audio)
        want.append(st.flush())

    pool = StreamingPool(module, batch_size=batch_size, **kw)
    sids = [pool.open() for _ in feeds]
    # interleave ragged pushes across the streams
    cursors = [0] * len(feeds)
    sizes = [4100, 16000, 7000]
    done = False
    while not done:
        done = True
        for k, (sid, audio) in enumerate(zip(sids, feeds)):
            if cursors[k] < len(audio):
                step = sizes[(k + cursors[k] // 5000) % len(sizes)]
                pool.push(sid, audio[cursors[k] : cursors[k] + step])
                cursors[k] += step
                done = False
    got = [pool.flush(sid) for sid in sids]
    assert got == want


def test_pool_with_word_fusion_matches_lone_stream(module):
    from thunder_tpu.streaming import StreamingPool
    from thunder_tpu.text.word_fusion import WordFusionLM, WordNGramLM

    fus = WordFusionLM(
        WordNGramLM(order=2).fit(["cat a", "a cat"]), module.text_transform, word_score=-0.2
    )
    kw = dict(chunk_seconds=2.0, overlap_seconds=0.5, beam_width=4, lm=fus, lm_weight=0.8)
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal(int(4.4 * 16000)) * 0.2).astype(np.float32)

    lone = StreamingTranscriber(module, **kw)
    lone.push(audio)
    want = lone.flush()

    pool = StreamingPool(module, batch_size=4, **kw)
    a = pool.open("a")
    b = pool.open("b")
    for i in range(0, len(audio), 9000):
        pool.push(a, audio[i : i + 9000])
        pool.push(b, audio[i : i + 9000])
    pool.drain()
    assert pool.flush(a) == want
    assert pool.flush(b) == want


def test_pool_stream_lifecycle_errors(module):
    from thunder_tpu.streaming import StreamingPool

    pool = StreamingPool(module, batch_size=2, chunk_seconds=2.0, overlap_seconds=0.5)
    sid = pool.open()
    with pytest.raises(ValueError):
        pool.open(sid)
    with pytest.raises(KeyError):
        pool.push("nope", np.zeros(10, np.float32))
    pool.flush(sid)
    with pytest.raises(KeyError):
        pool.push(sid, np.zeros(10, np.float32))  # closed streams are removed
    # mixing user-chosen and auto ids must not collide
    pool.open(1)
    assert pool.open() not in (1,)
    # beam-only kwargs without beam_width fail AT CONSTRUCTION
    with pytest.raises(TypeError):
        StreamingPool(module, lm_weight=0.3)


def test_pool_threaded_pushes_match_lone_streams(module):
    """Per-stream results stay exact when feeds push from separate threads
    (the pool's pending queue and state advance under one lock)."""
    import threading

    from thunder_tpu.streaming import StreamingPool

    kw = dict(chunk_seconds=2.0, overlap_seconds=0.5)
    rng = np.random.default_rng(13)
    feeds = [
        (rng.standard_normal(int(s * 16000)) * 0.2).astype(np.float32)
        for s in (3.3, 4.1, 2.6, 3.8)
    ]
    want = []
    for audio in feeds:
        st = StreamingTranscriber(module, **kw)
        st.push(audio)
        want.append(st.flush())

    pool = StreamingPool(module, batch_size=3, **kw)
    sids = [pool.open() for _ in feeds]

    def feed(sid, audio):
        for i in range(0, len(audio), 6000):
            pool.push(sid, audio[i : i + 6000])

    threads = [
        threading.Thread(target=feed, args=(sid, audio))
        for sid, audio in zip(sids, feeds)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    got = [pool.flush(sid) for sid in sids]
    assert got == want
