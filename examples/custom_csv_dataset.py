"""Custom data pipeline end-to-end: CSV metadata -> dataset -> vocab -> fit.

Companion script to docs/custom_data.md.  Shows the template-method hooks of
``BaseSpeechDataset`` on a CSV file ("path,transcript,speaker" rows), builds
the vocabulary from the corpus with ``all_outputs()``, and runs a short
training sanity fit.

Run standalone (generates a tiny synthetic corpus under /tmp):

    python examples/custom_csv_dataset.py
"""

from __future__ import annotations

import csv
import wave
from pathlib import Path

import numpy as np


def make_dataset(csv_file: Path):
    """CSV-backed dataset: one row per clip, columns path/transcript/speaker.

    Only three hooks are needed on top of ``BaseSpeechDataset``: how to read
    the metadata rows (``__init__``), where the audio lives (``open_audio``),
    and where the text lives (``open_text``).  ``preprocess_text`` normalizes
    each transcript so the vocabulary and training targets agree.
    """
    from thunder_tpu.data import BaseSpeechDataset
    from thunder_tpu.text.preprocess import expand_numbers, lower_text, normalize_text

    class CsvSpeechDataset(BaseSpeechDataset):
        def __init__(self, csv_file):
            with open(csv_file, newline="") as f:
                items = list(csv.DictReader(f))
            super().__init__(items, force_mono=True, sample_rate=16000)

        def open_audio(self, item):
            return self.loader.open_audio(item["path"])

        def open_text(self, item):
            return item["transcript"]

        def preprocess_text(self, text):
            # "Track 2" -> "track two": normalization must happen before
            # vocab building so targets only contain vocabulary tokens
            return expand_numbers(normalize_text(lower_text(text)), language="en")

    return CsvSpeechDataset(csv_file)


def build_corpus(root: Path, n: int = 12) -> Path:
    """Synthetic corpus: sine-tone WAVs + a CSV manifest."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        path = root / f"clip{i}.wav"
        samples = 8000 + 800 * (i % 5)
        tone = 0.3 * np.sin(2 * np.pi * (150 + 25 * i) * np.arange(samples) / 16000)
        data = tone + 0.01 * rng.standard_normal(samples)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((np.clip(data, -1, 1) * 32767).astype(np.int16).tobytes())
        rows.append({"path": str(path), "transcript": f"Track {i} please", "speaker": f"spk{i % 3}"})
    csv_file = root / "corpus.csv"
    with open(csv_file, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["path", "transcript", "speaker"])
        writer.writeheader()
        writer.writerows(rows)
    return csv_file


def main(data_dir: Path, max_epochs: int = 1, fast_dev_run: bool = True):
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.data import BaseDataModule
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer
    from thunder_tpu.text.tokenizer import get_most_frequent_tokens
    from thunder_tpu.training import Trainer

    csv_file = build_corpus(Path(data_dir))
    dataset = make_dataset(csv_file)

    # vocabulary straight from the (preprocessed) corpus transcripts
    from thunder_tpu.text.tokenizer import char_tokenizer

    corpus = " ".join(dataset.all_outputs())
    tokens = get_most_frequent_tokens(corpus, char_tokenizer, max_number_of_tokens=40)
    text_transform = BatchTextTransformer(tokens=tokens)

    class CsvDataModule(BaseDataModule):
        def __init__(self, csv_file, **kw):
            super().__init__(**kw)
            self.csv_file = csv_file

        def get_dataset(self, split):
            # real projects point each split at its own CSV
            return make_dataset(self.csv_file)

    dm = CsvDataModule(
        csv_file,
        batch_size=4,
        num_workers=2,
        # clips bucket-pad to multiples of 0.5 s: small buckets waste less
        # compute on short clips, at the price of more compiled shapes
        pad_multiple=8000,
    )

    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=text_transform.num_tokens),
        text_transform=text_transform,
        sample_len=8000,
    )
    trainer = Trainer(
        max_epochs=max_epochs,
        fast_dev_run=fast_dev_run,
        optimizer_kwargs={"learning_rate": 1e-4},
    )
    module = trainer.fit(module, datamodule=dm)
    val = [l for l in trainer.logs if "loss/val_loss" in l]
    print(f"val loss {val[-1]['loss/val_loss']:.3f}  wer {val[-1]['metrics/wer']:.3f}")
    print("transcription sample:", module.predict(dataset[0][0])[0][:60])
    return module, trainer


if __name__ == "__main__":
    import tempfile

    main(Path(tempfile.mkdtemp(prefix="thunder_custom_data_")))
