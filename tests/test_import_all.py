"""Every module imports cleanly (reference `tests/test_import.py` analogue)."""

import importlib
import pkgutil

import pytest

import thunder_tpu


def _all_modules():
    mods = ["thunder_tpu"]
    for info in pkgutil.walk_packages(thunder_tpu.__path__, prefix="thunder_tpu."):
        if info.name.endswith("__main__") or "libthunder" in info.name:
            continue
        mods.append(info.name)
    return mods


@pytest.mark.parametrize("name", _all_modules())
def test_module_imports(name):
    importlib.import_module(name)


def test_lazy_top_level_exports():
    assert callable(thunder_tpu.load_pretrained)
    assert thunder_tpu.CTCModule is not None
    assert thunder_tpu.Trainer is not None
    with pytest.raises(AttributeError):
        thunder_tpu.not_a_thing


def test_version():
    assert thunder_tpu.__version__
