import os
from pathlib import Path

import pytest

from thunder_tpu.utils import BaseCheckpoint, chain_calls, download_checkpoint, get_default_cache_folder, get_files


def test_chain_calls():
    g = chain_calls(lambda x: 2 * x, lambda x: 3 * x, lambda x: 4 * x)
    assert g(1) == 24


def test_get_files(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.wav").write_text("")
    (tmp_path / "y.wav").write_text("")
    (tmp_path / "z.txt").write_text("")
    files = get_files(tmp_path, ".wav")
    assert sorted(f.name for f in files) == ["x.wav", "y.wav"]


def test_get_default_cache_folder():
    folder = get_default_cache_folder()
    assert folder.name == ".thunder_tpu"
    assert folder.exists()


class _FakeCheckpoint(BaseCheckpoint):
    something = "https://example.invalid/files/something.bin"


def test_base_checkpoint_from_string():
    assert _FakeCheckpoint.from_string("something") is _FakeCheckpoint.something
    with pytest.raises(ValueError):
        _FakeCheckpoint.from_string("missing")


def test_download_checkpoint_uses_cache(tmp_path):
    # pre-populate the cache file: no network touched
    cached = tmp_path / "something.bin"
    cached.write_bytes(b"weights")
    path = download_checkpoint(_FakeCheckpoint.something, checkpoint_folder=str(tmp_path))
    assert path == cached
    assert path.read_bytes() == b"weights"
