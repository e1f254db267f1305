"""Test configuration.

Tests always run on CPU with 8 virtual XLA devices so that multi-chip
sharding code paths (jax.sharding.Mesh over data/model axes) are exercised
without TPU hardware.  This must happen before jax initializes its backends.
"""

import os

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a TPU platform
# and register a PJRT plugin at sitecustomize time, which wins over the env
# var — jax.config.update is the reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

RUN_SLOW = os.environ.get("RUN_SLOW", "0") == "1"

mark_slow = pytest.mark.skipif(not RUN_SLOW, reason="slow test, set RUN_SLOW=1 to run")


@pytest.fixture()
def rng_np():
    return np.random.default_rng(seed=0)


@pytest.fixture(scope="session")
def sample_audio():
    """Deterministic fake speech-like waveform batch: (4, 16000) float32 + lengths."""
    rng = np.random.default_rng(42)
    t = np.arange(16000) / 16000.0
    base = np.stack(
        [
            0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)
            + 0.1 * np.sin(2 * np.pi * (800 + 120 * i) * t)
            + 0.02 * rng.standard_normal(16000)
            for i in range(4)
        ]
    ).astype(np.float32)
    lengths = np.array([16000, 12000, 9000, 4800], dtype=np.int32)
    return base, lengths
