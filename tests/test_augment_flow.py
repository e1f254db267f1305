"""Augment params flow from checkpoint loaders into the frontend (the
reference's AugmentParams path, `quartznet/compatibility.py:62-68`)."""

import io
import tarfile

import jax
import numpy as np
import pytest
import torch
import yaml

from thunder_tpu.audio import FilterbankFeatures


def test_filterbank_validates_conflicting_augments():
    with pytest.raises(ValueError, match="Cutout and SpecAugment"):
        FilterbankFeatures(num_cutout_masks=2, num_time_masks=1)


def test_filterbank_validates_window():
    with pytest.raises(ValueError, match="positive"):
        FilterbankFeatures(n_window_size=0)


def test_filterbank_train_mode_dither_and_masks():
    ft = FilterbankFeatures(num_time_masks=2, num_freq_masks=2, dither=1e-3, use_fused_kernel=False)
    audio = np.random.default_rng(0).standard_normal((1, 8000)).astype(np.float32) * 0.3
    import jax.numpy as jnp

    lengths = jnp.array([8000])
    eval_out, _ = ft.apply({}, jnp.asarray(audio), lengths, train=False)
    train_out, _ = ft.apply(
        {}, jnp.asarray(audio), lengths, train=True, rngs={"augment": jax.random.PRNGKey(0)}
    )
    # train mode differs (dither + specaugment); eval is deterministic
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    eval_out2, _ = ft.apply({}, jnp.asarray(audio), lengths, train=False)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))
    # specaugment zeroed entire bands in train mode
    t = np.asarray(train_out)
    assert (t == 0).any()


def test_augment_params_flow_through_nemo_loader(tmp_path):
    from thunder_tpu.compat.nemo import load_components_from_quartznet_config

    cfg = {
        "labels": ["a", "b"],
        "preprocessor": {
            "params": {
                "sample_rate": 16000,
                "window_size": 0.02,
                "window_stride": 0.01,
                "n_fft": 512,
                "features": 64,
                "dither": 1e-5,
            }
        },
        "encoder": {
            "params": {
                "jasper": [
                    {"filters": 256, "repeat": 1, "kernel": [33], "stride": [2], "separable": True},
                    {"filters": 256, "repeat": 5, "kernel": [33], "stride": [1], "separable": True},
                    {"filters": 512, "repeat": 1, "kernel": [87], "separable": True},
                    {"filters": 1024, "repeat": 1, "kernel": [1], "separable": False},
                ]
            }
        },
    }
    p = tmp_path / "model_config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    encoder, audio_transform, text_transform = load_components_from_quartznet_config(
        p, augment_params={"num_time_masks": 3, "num_freq_masks": 2, "dropout": 0.15}
    )
    assert audio_transform.num_time_masks == 3
    assert audio_transform.num_freq_masks == 2
    assert encoder.dropout == 0.15
    assert text_transform.num_tokens == 3  # a, b + blank
