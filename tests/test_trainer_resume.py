import json
import wave

import jax
import numpy as np
import pytest

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.data import ManifestDatamodule
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text import BatchTextTransformer
from thunder_tpu.training import Trainer
from thunder_tpu.training.loggers import JsonlLogger, MultiLogger


@pytest.fixture()
def setup(tmp_path):
    rng = np.random.default_rng(0)
    items = []
    for i in range(4):
        p = tmp_path / f"w{i}.wav"
        n = 8000
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            sig = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(n) / 16000)
            w.writeframes((sig * 32767).astype(np.int16).tobytes())
        items.append({"audio_filepath": str(p), "text": "ab", "duration": 0.5})
    m = tmp_path / "m.json"
    m.write_text("\n".join(json.dumps(it) for it in items))
    tt = BatchTextTransformer(tokens=list("ab "))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    dm = ManifestDatamodule(str(m), str(m), str(m), batch_size=4, num_workers=1)
    dm.setup("fit")
    return module, dm, tmp_path


def test_resume_from_checkpoint(setup):
    module, dm, tmp_path = setup
    ckpt_dir = str(tmp_path / "ckpts")
    t1 = Trainer(max_epochs=2, optimizer_kwargs={"learning_rate": 1e-4}, checkpoint_dir=ckpt_dir, log_every=1)
    m1 = t1.fit(module, train_loader=dm.train_dataloader())

    # resume and keep training; first resumed loss should continue the curve
    t2 = Trainer(
        max_epochs=1,
        optimizer_kwargs={"learning_rate": 1e-4},
        resume_from=f"{ckpt_dir}/step_2",
        log_every=1,
    )
    m2 = t2.fit(module, train_loader=dm.train_dataloader())
    l1 = [l["loss/train_loss"] for l in t1.logs if "loss/train_loss" in l]
    l2 = [l["loss/train_loss"] for l in t2.logs if "loss/train_loss" in l]
    # resumed training starts near where the first run ended, not at scratch
    assert abs(l2[0] - l1[-1]) < abs(l2[0] - l1[0]) or l2[0] < l1[0]


def test_jsonl_logger(setup, tmp_path):
    module, dm, _ = setup
    log_path = tmp_path / "logs" / "metrics.jsonl"
    trainer = Trainer(
        fast_dev_run=True,
        optimizer_kwargs={"learning_rate": 1e-4},
        logger=MultiLogger([JsonlLogger(str(log_path))]),
    )
    trainer.fit(module, datamodule=dm)
    lines = [json.loads(l) for l in log_path.read_text().splitlines()]
    assert any("loss/train_loss" in l for l in lines)
    assert all("time" in l for l in lines)
