import pytest

from thunder_tpu.registry import CHECKPOINT_REGISTRY, load_pretrained
from thunder_tpu.compat import CitrinetCheckpoint, QuartznetCheckpoint
from thunder_tpu.utils import BaseCheckpoint


def test_all_quartznet_checkpoints_registered():
    for ckpt in QuartznetCheckpoint:
        assert ckpt.name in CHECKPOINT_REGISTRY
    assert len([c for c in QuartznetCheckpoint]) == 13


def test_all_citrinet_checkpoints_registered():
    for ckpt in CitrinetCheckpoint:
        assert ckpt.name in CHECKPOINT_REGISTRY
    assert len([c for c in CitrinetCheckpoint]) == 4


def test_from_string():
    assert QuartznetCheckpoint.from_string("QuartzNet5x5LS_En") is QuartznetCheckpoint.QuartzNet5x5LS_En
    with pytest.raises(ValueError):
        QuartznetCheckpoint.from_string("nope")


def test_load_pretrained_unknown_name_raises():
    with pytest.raises(KeyError):
        load_pretrained("definitely_not_registered")


def test_urls_point_at_ngc():
    for ckpt in list(QuartznetCheckpoint) + list(CitrinetCheckpoint):
        assert ckpt.value.startswith("https://api.ngc.nvidia.com/")
        assert ckpt.value.endswith(".nemo")
