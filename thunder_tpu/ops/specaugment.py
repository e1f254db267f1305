"""SpecAugment and SpecCutout with explicit PRNG keys.

Rebuild of the reference augmentations (`/root/reference/src/thunder/quartznet/
spec_augment.py:23-102`), which rely on torch global RNG; here randomness is
threaded explicitly (jit/vmap friendly).  Layout is channels-last:
``(batch, time, features)``.

Like torchaudio's ``mask_along_axis`` used by the reference, each drawn mask
is shared across the batch; widths are drawn uniformly in ``[0, width)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["spec_augment", "spec_cutout"]


def _axis_mask(rng: jax.Array, size: int, mask_param: int, dtype=jnp.float32):
    """Boolean mask of a random span [start, start+width) along an axis of ``size``."""
    r1, r2 = jax.random.split(rng)
    value = jax.random.uniform(r1) * mask_param
    min_value = jax.random.uniform(r2) * (size - value)
    start = min_value.astype(jnp.int32)
    end = (min_value + value).astype(jnp.int32)
    pos = jnp.arange(size)
    return (pos >= start) & (pos < end)


@partial(jax.jit, static_argnames=("time_masks", "freq_masks", "time_width", "freq_width"))
def spec_augment(
    rng: jax.Array,
    x: jax.Array,
    time_masks: int = 0,
    freq_masks: int = 0,
    time_width: int = 10,
    freq_width: int = 10,
) -> jax.Array:
    """Zero random time/frequency bands of a ``(batch, time, features)`` spectrogram."""
    keys = jax.random.split(rng, time_masks + freq_masks)
    for i in range(time_masks):
        mask = _axis_mask(keys[i], x.shape[1], time_width)
        x = jnp.where(mask[None, :, None], 0.0, x)
    for i in range(freq_masks):
        mask = _axis_mask(keys[time_masks + i], x.shape[2], freq_width)
        x = jnp.where(mask[None, None, :], 0.0, x)
    return x


@partial(jax.jit, static_argnames=("rect_masks", "time_width", "freq_width"))
def spec_cutout(
    rng: jax.Array,
    x: jax.Array,
    rect_masks: int = 0,
    time_width: int = 5,
    freq_width: int = 20,
) -> jax.Array:
    """Zero random rectangles of a ``(batch, time, features)`` spectrogram."""
    keys = jax.random.split(rng, 2 * rect_masks)
    for i in range(rect_masks):
        t_mask = _axis_mask(keys[2 * i], x.shape[1], time_width)
        f_mask = _axis_mask(keys[2 * i + 1], x.shape[2], freq_width)
        rect = t_mask[None, :, None] & f_mask[None, None, :]
        x = jnp.where(rect, 0.0, x)
    return x
