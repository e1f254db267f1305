"""Optimizer / LR-schedule builders (optax).

Rebuild of the reference's builder-classes convention
(`/root/reference/src/thunder/module.py:165-189` + `utils.py:146-168`): the
module takes ``optimizer_class``/``optimizer_kwargs`` and optional
``lr_scheduler_class``/``lr_scheduler_kwargs``; a kwarg named by
``total_steps_arg`` is filled with the trainer's total step count at fit time
(the OneCycle pattern exercised by `tests/test_finetune.py:49-81`).

The freeze/unfreeze schedule replaces the reference's
``FinetuneEncoderDecoder`` Lightning callback (`callbacks.py:16-85`): instead
of mutating optimizer param groups mid-training, updates for the ``encoder``
subtree are masked out until the unfreeze step and scaled by
``1 / encoder_initial_lr_div`` afterwards — same trajectory, pure-functional.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import math

import optax

__all__ = [
    "adamw",
    "sgd",
    "onecycle",
    "reduce_on_plateau",
    "plateau_schedule_transform",
    "plateau_update",
    "build_optimizer",
    "finetune_schedule_transform",
    "freeze_subtrees_transform",
]


def adamw(learning_rate=1e-3, weight_decay=1e-2, **kw) -> optax.GradientTransformation:
    return optax.adamw(learning_rate=learning_rate, weight_decay=weight_decay, **kw)


def sgd(learning_rate=1e-3, momentum=0.0, **kw) -> optax.GradientTransformation:
    return optax.sgd(learning_rate=learning_rate, momentum=momentum, **kw)


def onecycle(max_lr: float, total_steps: int, pct_start: float = 0.3, div_factor: float = 25.0, final_div_factor: float = 1e4):
    """OneCycleLR-equivalent schedule (cosine annealing variant).

    ``optax.cosine_onecycle_schedule`` divides by the warmup/decay interval
    widths, which round to zero for ``total_steps <= 3`` — the schedule then
    returns NaN and silently corrupts every parameter on the first update
    (observed via ``total_steps_arg`` auto-fill on tiny runs: fast_dev_run,
    2-step example datasets).  Clamp to the smallest total with both
    intervals >= 1 step; tiny runs get a slightly stretched cycle instead.
    """
    min_total = math.ceil(max(1.0 / pct_start, 1.0 / (1.0 - pct_start)))
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, min_total),
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def reduce_on_plateau(**kwargs) -> optax.GradientTransformation:
    """ReduceLROnPlateau-equivalent (torch parity via the reference's
    ``lr_scheduler_class`` convention, `/root/reference/src/thunder/module.py:183-189`).

    Pass as ``Trainer(lr_scheduler_builder=reduce_on_plateau,
    lr_scheduler_kwargs={"factor": 0.5, "patience": 2, ...})``: the trainer
    wraps the optimizer with :func:`plateau_schedule_transform` and advances
    the plateau bookkeeping once per epoch with the validation loss (the
    Lightning ``monitor="val_loss"`` cadence).  Calling this directly returns
    the raw ``optax.contrib`` transform, whose ``update`` requires the loss
    via ``value=`` each step."""
    return optax.contrib.reduce_on_plateau(**kwargs)


#: marker consumed by Trainer.fit — a builder with this attribute is wired as
#: a validation-loss-driven update scale, not a per-step learning-rate schedule
reduce_on_plateau._is_plateau = True  # type: ignore[attr-defined]


def plateau_schedule_transform(
    optimizer: optax.GradientTransformation, **plateau_kwargs
) -> optax.GradientTransformation:
    """Wrap ``optimizer`` so its final updates are multiplied by the current
    ReduceLROnPlateau scale.

    The per-step path only *applies* the scale (a leaf of ``opt_state``, so
    changing it never retriggers jit compilation); the plateau bookkeeping —
    best value, patience, cooldown — advances only when :func:`plateau_update`
    is fed a new validation loss, once per epoch, exactly like torch's
    ``ReduceLROnPlateau.step(val_loss)`` under Lightning.
    """
    plateau = optax.contrib.reduce_on_plateau(**plateau_kwargs)

    def init_fn(params):
        return {"inner": optimizer.init(params), "plateau": plateau.init(params)}

    def update_fn(updates, state, params=None, **extra):
        new_updates, inner_state = optimizer.update(updates, state["inner"], params, **extra)
        scale = state["plateau"].scale
        new_updates = jax.tree_util.tree_map(lambda u: u * scale, new_updates)
        return new_updates, {"inner": inner_state, "plateau": state["plateau"]}

    return optax.GradientTransformation(init_fn, update_fn)


def get_plateau_state(opt_state):
    """Fetch the ReduceLROnPlateau leaf from a wrapped optimizer state.

    :func:`plateau_schedule_transform` is applied outermost by the Trainer, so
    its ``{"inner": ..., "plateau": ...}`` dict is the top of ``opt_state``;
    this named accessor (rather than ad-hoc ``opt_state["plateau"]`` surgery)
    fails with a clear message if the state shape ever changes.
    """
    if isinstance(opt_state, dict) and "plateau" in opt_state:
        return opt_state["plateau"]
    raise KeyError(
        "opt_state does not carry a ReduceLROnPlateau leaf; expected the "
        "plateau_schedule_transform wrapper outermost (got "
        f"{type(opt_state).__name__})"
    )


def replace_plateau_state(opt_state, new_plateau_state):
    """Return ``opt_state`` with its plateau leaf swapped (see
    :func:`get_plateau_state`); the inner optimizer state is untouched."""
    get_plateau_state(opt_state)  # validate shape
    return {**opt_state, "plateau": new_plateau_state}


def plateau_update(plateau_state, value, **plateau_kwargs):
    """Advance ReduceLROnPlateau bookkeeping with one validation-loss value.

    Delegates to ``optax.contrib.reduce_on_plateau``'s own update (with empty
    updates) so the best/patience/cooldown logic is exactly optax's.
    """
    plateau = optax.contrib.reduce_on_plateau(**plateau_kwargs)
    _, new_state = plateau.update({}, plateau_state, value=jnp.asarray(value, jnp.float32))
    return new_state


def build_optimizer(
    optimizer_builder: Callable[..., optax.GradientTransformation] = adamw,
    optimizer_kwargs: Optional[Dict[str, Any]] = None,
    lr_scheduler_builder: Optional[Callable[..., optax.Schedule]] = None,
    lr_scheduler_kwargs: Optional[Dict[str, Any]] = None,
    total_steps: Optional[int] = None,
    steps_per_epoch: Optional[int] = None,
) -> optax.GradientTransformation:
    """Builders + kwargs -> one optax transformation.

    A kwarg literally named ``total_steps_arg`` names which other kwarg should
    receive ``total_steps`` (reference `module.py:165-172`).  A scheduler
    kwarg ``interval="epoch"`` makes the schedule advance once per epoch
    (reference's lr_scheduler interval, `module.py:62,185-189`); the default
    is per-step.
    """
    optimizer_kwargs = dict(optimizer_kwargs or {})
    lr_scheduler_kwargs = dict(lr_scheduler_kwargs or {})
    interval = lr_scheduler_kwargs.pop("interval", "step")
    for kwargs in (optimizer_kwargs, lr_scheduler_kwargs):
        arg = kwargs.pop("total_steps_arg", None)
        if arg:
            if total_steps is None:
                raise ValueError("total_steps_arg requested but total_steps unknown")
            kwargs[arg] = total_steps if interval == "step" else max(total_steps // max(steps_per_epoch or 1, 1), 1)
    if lr_scheduler_builder is not None:
        schedule = lr_scheduler_builder(**lr_scheduler_kwargs)
        if interval == "epoch":
            if not steps_per_epoch:
                raise ValueError('interval="epoch" requires steps_per_epoch')
            base = schedule
            schedule = lambda step: base(step // steps_per_epoch)
        optimizer_kwargs["learning_rate"] = schedule
    return optimizer_builder(**optimizer_kwargs)


def freeze_subtrees_transform(
    optimizer: optax.GradientTransformation, frozen_paths
) -> optax.GradientTransformation:
    """Zero the updates for params under the given path prefixes.

    Functional equivalent of torch's ``requires_grad=False`` filtering
    (reference `module.py:176`) — e.g. the HF adapter's
    ``freeze_feature_encoder()`` (`huggingface/compatibility.py:27-28`)
    becomes ``frozen_paths=[("encoder", "feature_extractor")]``.
    """
    frozen = [tuple(p) for p in frozen_paths]

    def zero_frozen(path, u):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        for prefix in frozen:
            if keys[: len(prefix)] == prefix:
                return jnp.zeros_like(u)
        return u

    def init_fn(params):
        return optimizer.init(params)

    def update_fn(updates, state, params=None, **extra):
        # zero frozen gradients BEFORE the inner chain: like requires_grad=False,
        # frozen params must not inflate the global-norm clip nor accumulate
        # optimizer moments
        updates = jax.tree_util.tree_map_with_path(zero_frozen, updates)
        new_updates, new_state = optimizer.update(updates, state, params, **extra)
        return jax.tree_util.tree_map_with_path(zero_frozen, new_updates), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def finetune_schedule_transform(
    optimizer: optax.GradientTransformation,
    unfreeze_encoder_at_step: int,
    encoder_initial_lr_div: float = 10.0,
    encoder_path: str = "encoder",
) -> optax.GradientTransformation:
    """Freeze the encoder subtree until a step, then train it at lr/div.

    Masks encoder updates to zero before ``unfreeze_encoder_at_step`` and
    scales them by ``1/encoder_initial_lr_div`` afterwards; the rest of the
    model trains normally throughout.
    """

    def init_fn(params):
        return {"inner": optimizer.init(params), "step": jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None, **extra):
        step = state["step"]
        frozen = step < unfreeze_encoder_at_step

        def map_encoder(fn):
            def mapper(path, u):
                top = path[0].key if hasattr(path[0], "key") else str(path[0])
                return fn(u) if top == encoder_path else u

            return mapper

        # zero frozen-phase encoder GRADIENTS before the inner chain, like the
        # reference's requires_grad filtering: they must not inflate gradient
        # clipping nor warm optimizer moments while frozen
        updates = jax.tree_util.tree_map_with_path(
            map_encoder(lambda u: jnp.where(frozen, jnp.zeros_like(u), u)), updates
        )
        new_updates, inner_state = optimizer.update(updates, state["inner"], params, **extra)
        # after unfreezing, the encoder trains at lr / encoder_initial_lr_div
        scale = jnp.where(frozen, 0.0, 1.0 / encoder_initial_lr_div)
        new_updates = jax.tree_util.tree_map_with_path(
            map_encoder(lambda u: u * scale), new_updates
        )
        return new_updates, {"inner": inner_state, "step": step + 1}

    return optax.GradientTransformation(init_fn, update_fn)
