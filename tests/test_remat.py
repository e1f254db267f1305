"""Per-block rematerialization (jax.checkpoint) must be gradient-transparent.

``remat=True`` trades one extra forward of compute for ~1/n_blocks the
activation HBM in training — outputs and gradients must be bit-comparable
to the standard path (same params, same dropout rng).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.models import QuartznetEncoder
from thunder_tpu.models.citrinet import CitrinetEncoder
from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder


def _grad_check(make_enc, x, lengths, rngs):
    enc = make_enc(False)
    enc_r = make_enc(True)
    params = enc.init({"params": jax.random.PRNGKey(0), **rngs}, x, lengths, True)
    mutable = ["batch_stats"] if "batch_stats" in params else []

    def loss(p, module):
        (out, _), _ = module.apply(p, x, lengths, True, rngs=rngs, mutable=mutable)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, enc)
    l1, g1 = jax.value_and_grad(loss)(params, enc_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0), jax.tree_util.tree_leaves_with_path(g1)
    ):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.fixture()
def audio():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64)) * 0.3, jnp.float32)  # (B, T, F)
    return x, jnp.array([64, 48], jnp.int32)


def test_quartznet_remat_transparent(audio):
    x, lengths = audio
    _grad_check(
        lambda r: QuartznetEncoder(
            repeat=1, filters=(128,), kernel_sizes=(11,), dropout=0.1, remat=r
        ),
        x,
        lengths,
        {"dropout": jax.random.PRNGKey(7)},
    )


def test_citrinet_remat_transparent(audio):
    x, lengths = audio
    _grad_check(
        lambda r: CitrinetEncoder(
            filters=(128,), kernel_sizes=(11,), strides=(1,), repeat=1, dropout=0.1, remat=r
        ),
        x,
        lengths,
        {"dropout": jax.random.PRNGKey(7)},
    )


def test_wav2vec2_remat_transparent():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8000)) * 0.1, jnp.float32)
    lengths = jnp.array([8000, 6000], jnp.int32)
    cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2, intermediate_size=128,
        conv_dim=(32,) * 7,
    )
    _grad_check(
        lambda r: Wav2Vec2Encoder(cfg, remat=r),
        x,
        lengths,
        {"dropout": jax.random.PRNGKey(7)},
    )


def test_trainer_fit_with_remat(tmp_path):
    # the full Trainer path (jitted train step, mutable batch_stats, dropout
    # rngs) must compose with per-block remat
    import json
    import wave

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.data import ManifestDatamodule
    from thunder_tpu.models import Conv1dDecoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer
    from thunder_tpu.training import Trainer

    rng = np.random.default_rng(0)
    rows = []
    for i, text in enumerate(["ab", "ba"]):
        wav = tmp_path / f"c{i}.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((rng.standard_normal(8000) * 1500).astype(np.int16).tobytes())
        rows.append({"audio_filepath": str(wav), "text": text, "duration": 0.5})
    manifest = tmp_path / "m.json"
    manifest.write_text("\n".join(json.dumps(r) for r in rows))

    tt = BatchTextTransformer(tokens=list("ab '"))
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(dither=0.0),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(11,), remat=True),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=8000,
    )
    dm = ManifestDatamodule(
        train_manifest=str(manifest), val_manifest=str(manifest), test_manifest=str(manifest),
        batch_size=2, num_workers=0,
    )
    trainer = Trainer(max_epochs=1)
    module = trainer.fit(module, datamodule=dm)
    assert trainer.logs and np.isfinite(trainer.logs[-1]["loss/val_loss"])
