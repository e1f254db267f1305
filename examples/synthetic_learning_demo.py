"""Reproducible full-system learning demo: synthetic frequency-coded 'speech'.

Each character maps to a pure tone; a QuartzNet-small + CTC system must learn
the code from examples. On one TPU v5e chip: val WER 0.95 -> ~0.05 within
6 epochs / ~2 minutes. Exercises WAV IO, bucketed loading, masked-BN
training, eval-mode inference and WER end to end on hardware.

    python examples/synthetic_learning_demo.py
"""

import json, wave, tempfile
import numpy as np
import jax
from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.data import ManifestDatamodule
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text import BatchTextTransformer
from thunder_tpu.training import Trainer
from thunder_tpu.training.metrics import wer

print("backend:", jax.default_backend(), flush=True)
CHARS = "abcdefgh"; FREQS = {c: 300+150*i for i,c in enumerate(CHARS)}; SR=16000
rng = np.random.default_rng(0)
def synth(text):
    seg = int(0.12*SR)
    sig = np.concatenate([0.4*np.sin(2*np.pi*FREQS[c]*np.arange(seg)/SR)*np.hanning(seg) for c in text])
    return np.clip(sig + 0.02*rng.standard_normal(sig.shape), -1, 1).astype(np.float32)
d = tempfile.mkdtemp(); items=[]
for i in range(2048):
    text = "".join(rng.choice(list(CHARS)) for _ in range(rng.integers(3,9)))
    wav = synth(text); p=f"{d}/{i}.wav"
    with wave.open(p,"wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(SR)
        w.writeframes((wav*32767).astype(np.int16).tobytes())
    items.append({"audio_filepath": p, "text": text, "duration": len(wav)/SR})
mt=f"{d}/t.json"; open(mt,"w").write("\n".join(json.dumps(x) for x in items[:1984]))
mv=f"{d}/v.json"; open(mv,"w").write("\n".join(json.dumps(x) for x in items[1984:]))
tt = BatchTextTransformer(tokens=list(CHARS))
module = CTCModule.create(jax.random.PRNGKey(0), audio_transform=FilterbankFeatures(),
    encoder=QuartznetEncoder(repeat=2, filters=(128,), kernel_sizes=(33,)),
    decoder=Conv1dDecoder(num_classes=tt.num_tokens), text_transform=tt, sample_len=16000)
dm = ManifestDatamodule(mt, mv, mv, batch_size=32, num_workers=8)
import time; t0=time.time()
trainer = Trainer(max_epochs=6, optimizer_kwargs={"learning_rate": 1e-3}, gradient_clip_norm=1.0, log_every=100)
module = trainer.fit(module, datamodule=dm)
vals = [(l["epoch"], round(l["metrics/wer"],3), round(l["metrics/cer"],3)) for l in trainer.logs if "metrics/wer" in l]
print("val (epoch, WER, CER):", vals, flush=True)
print(f"wall {time.time()-t0:.0f}s", flush=True)
