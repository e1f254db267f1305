"""On-hardware kernel tier: runs ONLY on a real TPU backend.

Unlike tests/ (which forces CPU + 8 virtual devices), this directory leaves
the ambient backend alone and skips everything when it isn't a TPU.  Run on
a TPU host with:

    python -m pytest tests_tpu/ -q
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason=f"requires TPU (backend: {jax.default_backend()})")
    for item in items:
        item.add_marker(skip)
