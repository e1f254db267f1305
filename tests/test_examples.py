"""The custom-data example (docs/custom_data.md companion) runs end-to-end."""

import sys
from pathlib import Path

import numpy as np


def test_custom_csv_dataset_example(tmp_path):
    sys.path.insert(0, str(Path(__file__).parent.parent / "examples"))
    try:
        from custom_csv_dataset import build_corpus, main, make_dataset
    finally:
        sys.path.pop(0)

    # dataset hooks: CSV rows -> (waveform, normalized text)
    csv_file = build_corpus(tmp_path, n=6)
    ds = make_dataset(csv_file)
    assert len(ds) == 6
    audio, text = ds[2]
    # loader convention matches the reference: (channels, time), mono-mixed
    assert audio.dtype == np.float32 and audio.shape[0] == 1
    assert text == "track two please"  # numbers expanded, lowercased
    assert len(ds.all_outputs()) == 6

    # full loop: vocab build + fast_dev_run fit + predict
    module, trainer = main(tmp_path / "run", fast_dev_run=True)
    val = [l for l in trainer.logs if "loss/val_loss" in l]
    assert val and np.isfinite(val[-1]["loss/val_loss"])
