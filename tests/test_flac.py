"""Native FLAC decoder vs the in-test encoder, across subframe types."""

import numpy as np
import pytest

native = pytest.importorskip("thunder_tpu.native")

from tests.flac_writer import write_flac  # noqa: E402
from thunder_tpu.data import load_audio  # noqa: E402


def _signal(n, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    out = []
    for c in range(channels):
        s = 0.4 * np.sin(2 * np.pi * (220 + 80 * c) * t) + 0.02 * rng.standard_normal(n)
        out.append(np.clip(s * 32767, -32768, 32767).astype(np.int64))
    return np.stack(out)


def _roundtrip(tmp_path, samples, **kw):
    p = tmp_path / "x.flac"
    write_flac(str(p), samples, **kw)
    audio, sr = load_audio(p)
    assert sr == kw.get("sample_rate", 16000)
    want = samples.astype(np.float64) / 32768.0
    np.testing.assert_allclose(np.asarray(audio, dtype=np.float64), want, atol=1e-4)
    return audio


@pytest.mark.parametrize("kind", ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"])
def test_flac_subframe_types(tmp_path, kind):
    _roundtrip(tmp_path, _signal(3000), kind=kind)


def test_flac_constant(tmp_path):
    samples = np.full((1, 2048), 1234, dtype=np.int64)
    _roundtrip(tmp_path, samples, kind="constant")


def test_flac_multiframe_partial_last(tmp_path):
    # 2.5 blocks -> partial last frame
    _roundtrip(tmp_path, _signal(2560), blocksize=1024, kind="fixed2")


def test_flac_stereo_independent(tmp_path):
    _roundtrip(tmp_path, _signal(2000, channels=2), kind="fixed2")


def test_flac_stereo_mid_side(tmp_path):
    _roundtrip(tmp_path, _signal(2000, channels=2), kind="fixed2", stereo_mode="mid_side")


def test_flac_rice_partitions(tmp_path):
    _roundtrip(tmp_path, _signal(4096), blocksize=2048, kind="fixed2", partition_order=2)


def test_flac_through_loader(tmp_path):
    from thunder_tpu.data import AudioFileLoader

    samples = _signal(3200, channels=2)
    p = tmp_path / "s.flac"
    write_flac(str(p), samples, sample_rate=8000, kind="fixed2")
    loader = AudioFileLoader(force_mono=True, sample_rate=16000)
    out = loader(p)
    assert out.shape == (1, 6400)  # mono + resampled 8k -> 16k


def test_flac_audio_info(tmp_path):
    from thunder_tpu.data import audio_info

    p = tmp_path / "i.flac"
    write_flac(str(p), _signal(4000, channels=2), sample_rate=22050)
    info = audio_info(p)
    assert (info.sample_rate, info.num_frames, info.num_channels) == (22050, 4000, 2)


def test_flac_bad_file_rejected(tmp_path):
    p = tmp_path / "bad.flac"
    p.write_bytes(b"fLaC" + b"\x00" * 10)
    with pytest.raises(ValueError):
        load_audio(p)
