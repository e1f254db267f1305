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
from thunder_tpu.training import FinetuneEncoderDecoder, Trainer, cer, wer
from thunder_tpu.training.metrics import edit_distance


def _write_wav(path, data, rate=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype(np.int16).tobytes())


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


@pytest.fixture()
def manifest(tmp_path):
    rng = np.random.default_rng(0)
    items = []
    texts = ["hello world", "testing speech", "the cat sat", "quick brown fox"]
    for i, text in enumerate(texts):
        p = tmp_path / f"t{i}.wav"
        n = 8000 + 1000 * i
        _write_wav(p, 0.3 * np.sin(2 * np.pi * (200 + 40 * i) * np.arange(n) / 16000) + 0.01 * rng.standard_normal(n))
        items.append({"audio_filepath": str(p), "text": text, "duration": n / 16000})
    m = tmp_path / "manifest.json"
    m.write_text("\n".join(json.dumps(it) for it in items))
    return str(m)


def test_metrics():
    assert edit_distance("kitten", "sitting") == 3
    assert wer(["the cat sat"], ["the cat sat"]) == 0.0
    assert wer(["the dog sat"], ["the cat sat"]) == pytest.approx(1 / 3)
    assert cer(["abcd"], ["abcf"]) == pytest.approx(1 / 4)
    assert wer([""], ["a b"]) == 1.0


def test_fast_dev_run(tiny_module, manifest):
    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=2, num_workers=2)
    trainer = Trainer(max_epochs=1, fast_dev_run=True, optimizer_kwargs={"learning_rate": 1e-4})
    module = trainer.fit(tiny_module, datamodule=dm)
    train_logs = [l for l in trainer.logs if "loss/train_loss" in l]
    val_logs = [l for l in trainer.logs if "loss/val_loss" in l]
    assert train_logs and np.isfinite(train_logs[0]["loss/train_loss"])
    assert val_logs and np.isfinite(val_logs[0]["loss/val_loss"])
    assert 0.0 <= val_logs[0]["metrics/wer"]


def test_training_reduces_loss(tiny_module, manifest):
    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=4, num_workers=2)
    trainer = Trainer(
        max_epochs=12,
        optimizer_kwargs={"learning_rate": 3e-4},
        log_every=1,
    )
    dm.setup("fit")
    module = trainer.fit(tiny_module, train_loader=dm.train_dataloader())
    losses = [l["loss/train_loss"] for l in trainer.logs if "loss/train_loss" in l]
    assert losses[-1] < losses[0] * 0.8, losses


def test_onecycle_total_steps_injection(tiny_module, manifest):
    from thunder_tpu.training import onecycle

    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=2, num_workers=2)
    trainer = Trainer(
        max_epochs=2,
        optimizer_kwargs={"learning_rate": 1e-4},
        lr_scheduler_builder=onecycle,
        lr_scheduler_kwargs={"max_lr": 1e-3, "total_steps_arg": "total_steps"},
    )
    dm.setup("fit")
    module = trainer.fit(tiny_module, train_loader=dm.train_dataloader())
    assert module is not None


def test_finetune_callback_freezes_encoder(tiny_module, manifest):
    import flax

    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=4, num_workers=2)
    dm.setup("fit")
    before = flax.traverse_util.flatten_dict(tiny_module.variables["params"]["encoder"])
    trainer = Trainer(
        max_epochs=1,
        optimizer_kwargs={"learning_rate": 1e-3},
        callbacks=[FinetuneEncoderDecoder(unfreeze_encoder_at_epoch=100)],
    )
    module = trainer.fit(tiny_module, train_loader=dm.train_dataloader())
    after = flax.traverse_util.flatten_dict(module.variables["params"]["encoder"])
    for k in before:
        np.testing.assert_array_equal(np.asarray(before[k]), np.asarray(after[k]))
    # decoder must have moved
    dec_before = flax.traverse_util.flatten_dict(tiny_module.variables["params"]["decoder"])
    dec_after = flax.traverse_util.flatten_dict(module.variables["params"]["decoder"])
    assert any(
        not np.array_equal(np.asarray(dec_before[k]), np.asarray(dec_after[k])) for k in dec_before
    )


def test_finetune_callback_unfreezes(tiny_module, manifest):
    import flax

    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=4, num_workers=2)
    dm.setup("fit")
    before = flax.traverse_util.flatten_dict(tiny_module.variables["params"]["encoder"])
    trainer = Trainer(
        max_epochs=2,
        optimizer_kwargs={"learning_rate": 1e-3},
        callbacks=[FinetuneEncoderDecoder(unfreeze_encoder_at_epoch=1, encoder_initial_lr_div=10)],
    )
    module = trainer.fit(tiny_module, train_loader=dm.train_dataloader())
    after = flax.traverse_util.flatten_dict(module.variables["params"]["encoder"])
    assert any(not np.array_equal(np.asarray(before[k]), np.asarray(after[k])) for k in before)


def test_plateau_transform_scales_updates():
    import jax.numpy as jnp
    import optax

    from thunder_tpu.training.optim import plateau_schedule_transform, plateau_update

    kw = {"factor": 0.5, "patience": 1}
    tx = plateau_schedule_transform(optax.sgd(1.0), **kw)
    params = {"w": jnp.ones(3)}
    st = tx.init(params)
    grads = {"w": jnp.ones(3)}
    u, st = tx.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(u["w"]), -1.0)  # scale starts at 1
    # two non-improving validation losses -> scale halves (patience=1)
    st["plateau"] = plateau_update(st["plateau"], 1.0, **kw)
    st["plateau"] = plateau_update(st["plateau"], 1.0, **kw)
    u, st = tx.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(u["w"]), -0.5)


def test_plateau_state_accessors():
    """VERDICT item: named getter/setter instead of ad-hoc opt_state surgery;
    they validate the wrapper shape and fail loudly on anything else."""
    import jax.numpy as jnp
    import optax

    from thunder_tpu.training.optim import (
        get_plateau_state,
        plateau_schedule_transform,
        plateau_update,
        replace_plateau_state,
    )

    kw = {"factor": 0.5, "patience": 0}
    tx = plateau_schedule_transform(optax.sgd(1.0), **kw)
    params = {"w": jnp.ones(2)}
    st = tx.init(params)
    plateau = get_plateau_state(st)
    assert float(plateau.scale) == 1.0
    new_plateau = plateau_update(plateau, 1.0, **kw)
    new_plateau = plateau_update(new_plateau, 1.0, **kw)  # bad epoch -> halve
    st2 = replace_plateau_state(st, new_plateau)
    assert float(get_plateau_state(st2).scale) == 0.5
    assert st2["inner"] is st["inner"]  # inner optimizer state untouched
    # a bare (unwrapped) optimizer state is rejected with a clear error
    with pytest.raises(KeyError, match="plateau"):
        get_plateau_state(optax.sgd(1.0).init(params))


def test_reduce_on_plateau_halves_lr_in_trainer(tiny_module, manifest):
    """VERDICT item: LR scale halves after a plateaued epoch, driven by the
    validation loss from Trainer.validate (torch ReduceLROnPlateau cadence)."""
    from thunder_tpu.training import reduce_on_plateau

    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=4, num_workers=0)
    trainer = Trainer(
        max_epochs=3,
        # lr=0 -> the model cannot improve, guaranteeing a plateau
        optimizer_kwargs={"learning_rate": 0.0},
        lr_scheduler_builder=reduce_on_plateau,
        lr_scheduler_kwargs={"factor": 0.5, "patience": 1},
    )
    dm.setup("fit")
    trainer.fit(tiny_module, train_loader=dm.train_dataloader(), val_loader=dm.val_dataloader())
    scales = [l["lr_scale/plateau"] for l in trainer.logs if "lr_scale/plateau" in l]
    assert len(scales) == 3
    assert scales[0] == 1.0  # first epoch establishes the best value
    assert scales[1] == pytest.approx(0.5)  # plateaued epoch halves the scale
    assert scales[2] <= 0.5


def test_checkpoint_save_restore(tiny_module, manifest, tmp_path):
    from thunder_tpu.training.checkpointing import restore_module_variables, save_module

    path = save_module(str(tmp_path / "ckpt"), tiny_module)
    audio = np.random.default_rng(0).standard_normal((1, 8000)).astype(np.float32)
    before = np.asarray(tiny_module.forward(audio, np.array([8000]))[0])
    restored = restore_module_variables(path, tiny_module)
    after = np.asarray(restored.forward(audio, np.array([8000]))[0])
    np.testing.assert_allclose(before, after)


def test_validate_with_beam_width(tiny_module, manifest):
    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=2, num_workers=0)
    dm.setup()
    val_loader = dm.val_dataloader()
    mg = Trainer(max_epochs=1).validate(tiny_module, val_loader)
    mb = Trainer(max_epochs=1, eval_beam_width=4).validate(tiny_module, val_loader)
    for m in (mg, mb):
        assert 0.0 <= m["metrics/cer"]
        assert np.isfinite(m["loss/val_loss"])


def test_trainer_rbg_prng(tiny_module, manifest):
    """The TPU-default rbg PRNG path must train end-to-end (auto-selected on
    TPU; forced here so CPU CI covers it)."""
    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=2, num_workers=0)
    trainer = Trainer(max_epochs=1, fast_dev_run=True, prng_impl="rbg",
                      optimizer_kwargs={"learning_rate": 1e-4})
    trainer.fit(tiny_module, datamodule=dm)
    losses = [l["loss/train_loss"] for l in trainer.logs if "loss/train_loss" in l]
    assert losses and np.isfinite(losses[0])


def test_accumulate_grad_batches_exact_and_deferred(tiny_module, manifest):
    """accumulate_grad_batches semantics (Lightning parity): params change
    only at optimizer steps, and k identical micro-batches with accumulate=k
    produce EXACTLY the single-step update (the mean of k equal grads is the
    grad; params exclude BN running stats, which advance per micro-batch)."""
    import optax

    from thunder_tpu.training.optim import build_optimizer
    from thunder_tpu.training.trainer import TrainState, make_train_step

    # deterministic forward: dither injects rng noise folded with the step
    # counter, which advances per MICRO-batch — disable it so the two
    # micro-grads are bit-identical and the exactness claim holds
    tt = tiny_module.text_transform
    module = CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(dither=0.0),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )
    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=2, num_workers=0)
    dm.setup("fit")
    audio, lengths, texts = next(iter(dm.train_dataloader()))
    targets, target_lengths = module.text_transform.encode(list(texts))

    def make_state(accum):
        tx = build_optimizer(optimizer_kwargs={"learning_rate": 1e-3})
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        variables = jax.tree_util.tree_map(np.array, module.variables)
        return TrainState.create(
            apply_fn=module.model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats"),
        )

    train_step = make_train_step(module.model, module.blank_idx)
    rng = jax.random.PRNGKey(0)

    one = make_state(1)
    one, _ = train_step(one, audio, lengths, targets, target_lengths, rng)

    acc = make_state(2)
    acc, _ = train_step(acc, audio, lengths, targets, target_lengths, rng)
    # first micro-batch: update deferred, params untouched
    leaves_before = jax.tree_util.tree_leaves(module.variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(acc.params), leaves_before):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    acc, _ = train_step(acc, audio, lengths, targets, target_lengths, rng)
    # second: optimizer applies the mean grad == the single-step grad
    for a, b in zip(
        jax.tree_util.tree_leaves(acc.params), jax.tree_util.tree_leaves(one.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


def test_trainer_fit_with_accumulation(tiny_module, manifest):
    """Trainer.fit composes accumulation with clipping and the scheduler."""
    from thunder_tpu.training.optim import onecycle

    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=2, num_workers=0)
    trainer = Trainer(
        max_epochs=1,
        optimizer_kwargs={"learning_rate": 1e-3},
        lr_scheduler_builder=onecycle,
        lr_scheduler_kwargs={"max_lr": 1e-3, "total_steps_arg": "total_steps"},
        gradient_clip_norm=1.0,
        accumulate_grad_batches=2,
        log_every=1,
    )
    module = trainer.fit(tiny_module, datamodule=dm)
    assert trainer.logs, "training must have logged steps"
    losses = [e["loss/train_loss"] for e in trainer.logs if "loss/train_loss" in e]
    assert losses and np.isfinite(losses[-1])


def test_early_stopping_callback_logic():
    from thunder_tpu.training import EarlyStopping

    # Lightning semantics: stop once wait_count >= patience (patience=1 stops
    # on the FIRST non-improving epoch, matching pl.callbacks.EarlyStopping)
    es = EarlyStopping(patience=1, min_delta=0.1)
    assert not es.should_stop({"loss/val_loss": 5.0})  # first sets best
    assert not es.should_stop({"loss/val_loss": 4.0})  # improved
    assert es.should_stop({"loss/val_loss": 3.95})     # < min_delta: bad #1 >= patience
    # improvement resets the counter
    es = EarlyStopping(patience=2, min_delta=0.0)
    assert not es.should_stop({"loss/val_loss": 5.0})
    assert not es.should_stop({"loss/val_loss": 5.0})   # bad #1
    assert not es.should_stop({"loss/val_loss": 4.0})   # reset
    assert not es.should_stop({"loss/val_loss": 4.0})   # bad #1 again
    assert es.should_stop({"loss/val_loss": 4.0})       # bad #2 >= patience
    # max mode + missing metric is a no-op
    es = EarlyStopping(monitor="metrics/acc", patience=0, mode="max")
    assert not es.should_stop({"loss/val_loss": 1.0})
    assert not es.should_stop({"metrics/acc": 0.5})
    assert es.should_stop({"metrics/acc": 0.5})
    with pytest.raises(ValueError):
        EarlyStopping(mode="sideways")


def test_early_stopping_ends_fit(tiny_module, manifest):
    """A min_delta no epoch can beat stops fit after patience+2 epochs."""
    from thunder_tpu.training import EarlyStopping

    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=2, num_workers=0)
    trainer = Trainer(
        max_epochs=6,
        optimizer_kwargs={"learning_rate": 1e-4},
        callbacks=[EarlyStopping(patience=0, min_delta=1e9)],
        log_every=1,
    )
    trainer.fit(tiny_module, datamodule=dm)
    assert any(e.get("early_stop") for e in trainer.logs)
    epochs_seen = {e["epoch"] for e in trainer.logs if "epoch" in e}
    assert max(epochs_seen) == 1  # epoch 0 sets best, epoch 1 stops


def test_gradient_clip_value_and_checkpoint_monitor(tiny_module, manifest, tmp_path, monkeypatch):
    """clip-by-value composes; checkpoint_monitor saves only improving epochs."""
    saved_steps = []

    import thunder_tpu.training.checkpointing as ckpt

    real_save = ckpt.save_checkpoint

    def spy(path, state, step):
        saved_steps.append(step)
        return real_save(path, state, step=step)

    monkeypatch.setattr(ckpt, "save_checkpoint", spy)

    dm = ManifestDatamodule(manifest, manifest, manifest, batch_size=2, num_workers=0)
    trainer = Trainer(
        max_epochs=3,
        optimizer_kwargs={"learning_rate": 0.0},  # loss frozen: no improvement
        gradient_clip_value=0.5,
        checkpoint_dir=str(tmp_path / "ck"),
        checkpoint_monitor="loss/val_loss",
        log_every=1,
    )
    trainer.fit(tiny_module, datamodule=dm)
    # lr=0 => identical val loss every epoch: only epoch 0 improves (sets best)
    assert len(saved_steps) == 1
