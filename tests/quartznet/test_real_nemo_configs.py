"""Parse the real NeMo model_config.yaml samples shipped with the reference
(read-only fixtures; the same ones its config tests use,
`tests/quartznet/test_compatibility_qn.py:30-52`)."""

from pathlib import Path

import pytest

from thunder_tpu.compat.nemo import load_components_from_quartznet_config

SAMPLES = Path("/root/reference/tests/nemo_config_samples")

pytestmark = pytest.mark.skipif(not SAMPLES.exists(), reason="reference fixtures unavailable")


@pytest.mark.parametrize(
    "name,n_body",
    [("QuartzNet5x5LS-En", 5), ("QuartzNet15x5Base-En", 15), ("QuartzNet15x5NR-En", 15)],
)
def test_parse_real_config(name, n_body):
    encoder, audio_transform, text_transform = load_components_from_quartznet_config(
        SAMPLES / f"{name}.yaml"
    )
    assert len(encoder.filters) == n_body
    assert encoder.repeat == 5
    assert encoder.filters[0] == 256
    assert audio_transform.nfilt == 64
    assert audio_transform.sample_rate == 16000
    assert audio_transform.n_window_size == 320
    assert text_transform.num_tokens == 29  # 28 labels + blank
    # blank appended at the end (NeMo convention)
    assert text_transform.vocab.blank_idx == 28


def test_parse_with_augment_params():
    _, audio_transform, _ = load_components_from_quartznet_config(
        SAMPLES / "QuartzNet5x5LS-En.yaml",
        augment_params={"num_cutout_masks": 5, "mask_time_width": 120},
    )
    assert audio_transform.num_cutout_masks == 5
    assert audio_transform.mask_time_width == 120
