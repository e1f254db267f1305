import jax.numpy as jnp
import numpy as np
import optax
import pytest

from thunder_tpu.training.optim import adamw, build_optimizer, onecycle, reduce_on_plateau


def _lr_of(tx_kwargs=None, sched_kwargs=None, **bo_kwargs):
    captured = {}

    def spy_optimizer(learning_rate=None, **kw):
        captured["lr"] = learning_rate
        return optax.sgd(1e-3)

    build_optimizer(spy_optimizer, tx_kwargs or {}, onecycle, sched_kwargs or {}, **bo_kwargs)
    return captured["lr"]


def test_total_steps_injection_step_interval():
    lr = _lr_of(sched_kwargs={"max_lr": 1.0, "total_steps_arg": "total_steps"}, total_steps=100)
    # onecycle peaks around pct_start * total_steps
    assert float(lr(30)) > float(lr(0))
    assert float(lr(99)) < float(lr(30))


def test_epoch_interval_schedule():
    lr = _lr_of(
        sched_kwargs={"max_lr": 1.0, "total_steps_arg": "total_steps", "interval": "epoch"},
        total_steps=100,
        steps_per_epoch=10,
    )
    # within one epoch the lr is constant
    assert float(lr(0)) == float(lr(9))
    assert float(lr(0)) != float(lr(10))


def test_epoch_interval_requires_steps_per_epoch():
    with pytest.raises(ValueError, match="steps_per_epoch"):
        build_optimizer(adamw, {}, onecycle, {"max_lr": 1.0, "total_steps": 10, "interval": "epoch"})


def test_total_steps_arg_without_total_steps_raises():
    with pytest.raises(ValueError, match="total_steps"):
        build_optimizer(adamw, {}, onecycle, {"max_lr": 1.0, "total_steps_arg": "total_steps"})


def test_reduce_on_plateau_available():
    tx = reduce_on_plateau(factor=0.5, patience=2)
    assert isinstance(tx, optax.GradientTransformation) or hasattr(tx, "update")


def test_onecycle_finite_at_tiny_total_steps():
    """optax's cosine_onecycle NaNs for total_steps <= 3 (0/0 interval);
    the wrapper must stay finite — tiny runs (fast_dev_run, 2-step example
    datasets) previously trained with NaN LR and corrupted every param."""
    import numpy as np

    from thunder_tpu.training import onecycle

    for total in (1, 2, 3, 4, 10):
        sched = onecycle(3e-3, total)
        vals = [float(sched(i)) for i in range(total + 1)]
        assert all(np.isfinite(v) for v in vals), (total, vals)
        assert max(vals) <= 3e-3 * 1.0001
