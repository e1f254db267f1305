"""Trainer(steps_per_execution=K): the device-side multi-step scan path.

K optimizer steps per dispatch (make_train_scan_step) must be semantically
identical to K single-step dispatches — same per-step losses, same final
parameters — including batch_stats threading and the per-step
fold_in(rng, state.step) key derivation.  No reference counterpart
(Lightning dispatches one step per batch); this is the TPU-native
launch-latency amortization the round-4 training push relies on.
"""

import json
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.data import ManifestDatamodule
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text import BatchTextTransformer
from thunder_tpu.training import Trainer
from thunder_tpu.training.optim import adamw
from thunder_tpu.training.trainer import (
    TrainState,
    make_train_scan_step,
    make_train_step,
)


@pytest.fixture()
def tiny_module():
    tt = BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '"))
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )


def _make_state(module):
    # the jitted steps donate their input state: give each state fresh buffers
    variables = jax.tree_util.tree_map(jnp.array, module.variables)
    return TrainState.create(
        apply_fn=module.model.apply,
        params=variables["params"],
        tx=adamw(learning_rate=1e-3),
        batch_stats=variables.get("batch_stats"),
    )


def _batches(module, K, batch=2, samples=4000, seed=0):
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((K, batch, samples)).astype(np.float32) * 0.1
    lengths = np.full((K, batch), samples, dtype=np.int32)
    targets, target_lengths = module.text_transform.encode(
        ["hello world", "abc def"], pad_to=16
    )
    targets = np.broadcast_to(np.asarray(targets)[None], (K,) + targets.shape).copy()
    target_lengths = np.broadcast_to(
        np.asarray(target_lengths)[None], (K,) + target_lengths.shape
    ).copy()
    return audio, lengths, targets, target_lengths


@pytest.mark.parametrize("with_weights", [False, True])
def test_scan_step_matches_sequential(tiny_module, with_weights):
    K = 3
    audio, lengths, targets, target_lengths = _batches(tiny_module, K)
    sw = (
        np.stack([np.asarray([1.0, 0.0], np.float32)] * K)
        if with_weights
        else None
    )
    rng = jax.random.PRNGKey(7)

    step = make_train_step(tiny_module.model, tiny_module.blank_idx)
    state = _make_state(tiny_module)
    seq_losses = []
    for k in range(K):
        state, loss = step(
            state, audio[k], lengths[k], targets[k], target_lengths[k], rng,
            sample_weights=None if sw is None else sw[k],
        )
        seq_losses.append(float(loss))
    seq_params = jax.device_get(state.params)
    seq_stats = jax.device_get(state.batch_stats)

    scan = make_train_scan_step(tiny_module.model, tiny_module.blank_idx)
    state2 = _make_state(tiny_module)
    state2, losses = scan(
        state2, audio, lengths, targets, target_lengths, rng,
        sample_weights=None if sw is None else jnp.asarray(sw),
    )
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        seq_params,
        jax.device_get(state2.params),
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        seq_stats,
        jax.device_get(state2.batch_stats),
    )
    assert int(state2.step) == K


def _write_wav(path, data, rate=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype(np.int16).tobytes())


@pytest.fixture()
def manifest(tmp_path):
    rng = np.random.default_rng(0)
    items = []
    texts = ["hello world", "testing speech", "the cat sat", "quick brown fox"]
    for i, text in enumerate(texts):
        p = tmp_path / f"t{i}.wav"
        n = 8000  # equal lengths -> equal collate shapes -> scan groups form
        _write_wav(
            p,
            0.3 * np.sin(2 * np.pi * (200 + 40 * i) * np.arange(n) / 16000)
            + 0.01 * rng.standard_normal(n),
        )
        items.append({"audio_filepath": str(p), "text": text, "duration": n / 16000})
    m = tmp_path / "manifest.json"
    m.write_text("\n".join(json.dumps(it) for it in items))
    return str(m)


def test_trainer_steps_per_execution_matches_single(tiny_module, manifest):
    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=2, num_workers=0)
    dm.setup("fit")

    def run(k):
        trainer = Trainer(
            max_epochs=2,
            optimizer_kwargs={"learning_rate": 1e-3},
            log_every=1,
            steps_per_execution=k,
            seed=0,
        )
        module = trainer.fit(tiny_module, train_loader=dm.train_dataloader())
        losses = [l["loss/train_loss"] for l in trainer.logs if "loss/train_loss" in l]
        return module, losses

    m1, losses1 = run(1)
    m2, losses2 = run(2)
    assert len(losses1) == len(losses2) == 4  # 2 epochs x 2 batches, log_every=1
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        jax.device_get(m1.variables["params"]),
        jax.device_get(m2.variables["params"]),
    )


def test_trainer_steps_per_execution_mesh(tiny_module, manifest):
    """steps_per_execution composes with the SPMD data mesh (stacked batches
    shard on axis 1; padding rows ride sample_weights inside the scan)."""
    from thunder_tpu.parallel.mesh import make_mesh

    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=3, num_workers=0)
    dm.setup("fit")
    # batch_size 3 over 4 items -> a 3-row batch (padded to 8 for the mesh)
    # and a 1-row leftover: exercises both the scan flush-on-shape-change and
    # the mesh padding path
    trainer = Trainer(
        max_epochs=2,
        optimizer_kwargs={"learning_rate": 1e-3},
        log_every=1,
        steps_per_execution=2,
        mesh=make_mesh(),
        seed=0,
    )
    module = trainer.fit(tiny_module, train_loader=dm.train_dataloader())
    losses = [l["loss/train_loss"] for l in trainer.logs if "loss/train_loss" in l]
    assert len(losses) == 4 and all(np.isfinite(l) for l in losses)
