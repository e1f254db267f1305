"""End-to-end learning correctness: overfit 4 clips to exact transcriptions.

This exercises the *entire* stack jointly — WAV decode, mel frontend,
QuartzNet encoder, CTC loss + gradients, AdamW, greedy decode, text
detokenization — and demands perfection: the trained model must reproduce
every training transcription exactly.  The offline analogue of the
reference's golden pretrained-checkpoint tests.
"""

import json
import wave

import jax
import numpy as np

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.data import ManifestDatamodule
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text import BatchTextTransformer
from thunder_tpu.training import Trainer


def test_overfit_to_exact_transcriptions(tmp_path):
    rng = np.random.default_rng(0)
    texts = ["abba", "cab", "back", "cba"]
    items = []
    for i, text in enumerate(texts):
        n = 12000
        p = tmp_path / f"w{i}.wav"
        sig = sum(0.2 * np.sin(2 * np.pi * (100 + 97 * i * (j + 1)) * np.arange(n) / 16000) for j in range(3))
        sig += 0.01 * rng.standard_normal(n)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((np.clip(sig, -1, 1) * 32767).astype(np.int16).tobytes())
        items.append({"audio_filepath": str(p), "text": text, "duration": n / 16000})
    manifest = tmp_path / "m.json"
    manifest.write_text("\n".join(json.dumps(it) for it in items))

    tt = BatchTextTransformer(tokens=list("abck"))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(dither=0.0),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(21,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    dm = ManifestDatamodule(str(manifest), str(manifest), str(manifest), batch_size=4, num_workers=1)
    dm.setup("fit")
    trainer = Trainer(max_epochs=150, optimizer_kwargs={"learning_rate": 2e-3}, log_every=50)
    module = trainer.fit(module, train_loader=dm.train_dataloader())

    audio = np.stack([np.pad(dm.train_dataset[i][0][0], (0, 16000 - 12000)) for i in range(4)])
    preds = module.predict(audio, np.full(4, 12000))
    want = [dm.train_dataset.items[i]["text"] for i in range(4)]
    assert preds == want, (preds, want)
