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


def test_load_pretrained_dispatches_local_nemo(tmp_path, monkeypatch):
    """Local .nemo paths go to the NeMo loaders (not HF, despite the '/')."""
    import io
    import tarfile

    called = {}

    import thunder_tpu.registry as reg

    monkeypatch.setattr(reg, "load_quartznet_checkpoint", lambda p, **kw: called.setdefault("qn", p))
    monkeypatch.setattr(reg, "load_citrinet_checkpoint", lambda p, **kw: called.setdefault("cn", p))

    def make_nemo(path, with_tokenizer):
        with tarfile.open(path, "w") as tar:
            for name in ["model_config.yaml", "model_weights.ckpt"] + (
                ["tokenizer.model"] if with_tokenizer else []
            ):
                info = tarfile.TarInfo(name)
                info.size = 1
                tar.addfile(info, io.BytesIO(b"x"))

    qn = tmp_path / "q.nemo"
    make_nemo(qn, with_tokenizer=False)
    reg.load_pretrained(str(qn))
    assert called.pop("qn") == str(qn)

    cn = tmp_path / "c.nemo"
    make_nemo(cn, with_tokenizer=True)
    reg.load_pretrained(str(cn))
    assert called.pop("cn") == str(cn)


def test_urls_point_at_ngc():
    for ckpt in list(QuartznetCheckpoint) + list(CitrinetCheckpoint):
        assert ckpt.value.startswith("https://api.ngc.nvidia.com/")
        assert ckpt.value.endswith(".nemo")
