"""Length-mask utilities: the universal variable-length mechanism.

The whole framework follows the convention of the reference library
(`/root/reference/src/thunder/blocks.py:94-170`): every batch-level function
takes and returns ``(array, lengths)`` pairs, where ``array`` is padded to a
static shape and ``lengths`` is an int32 vector of the valid extent along the
time axis.  On TPU this is exactly what ``jax.jit`` wants: static shapes, with
validity expressed as data (masks) instead of dynamic shapes.

Layout note: unlike the torch reference which uses (batch, channels, time),
this framework is channels-last ``(batch, time, channels)`` so the channel
dimension maps onto TPU vector lanes / the MXU contraction dim.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "lengths_to_mask",
    "apply_mask",
    "masked_mean_std",
    "normalize_tensor",
    "masked_feature_normalize",
]


def lengths_to_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """Convert integer lengths to a boolean validity mask.

    Mirrors reference semantics (`blocks.py:156-170`).

    Args:
        lengths: int array of shape ``(batch,)``.
        max_length: static padded length (may exceed ``lengths.max()``).

    Returns:
        bool array of shape ``(batch, max_length)``; ``True`` inside the valid
        region.
    """
    positions = jnp.arange(max_length, dtype=jnp.int32)
    return positions[None, :] < lengths.astype(jnp.int32)[:, None]


def apply_mask(x: jax.Array, lengths: jax.Array, *, time_axis: int = 1, fill_value=0.0) -> jax.Array:
    """Zero-fill (or fill with ``fill_value``) everything beyond ``lengths``.

    Equivalent of the reference's ``MaskedConv1d.mask_fill``
    (`quartznet/blocks.py:158-167`) but axis-generic and channels-last.

    Args:
        x: array whose ``time_axis`` dimension is padded.
        lengths: ``(batch,)`` valid lengths; batch must be axis 0 of ``x``.
        time_axis: which axis of ``x`` is time.
        fill_value: value used outside the valid region.
    """
    mask = lengths_to_mask(lengths, x.shape[time_axis])
    shape = [1] * x.ndim
    shape[0] = x.shape[0]
    shape[time_axis] = x.shape[time_axis]
    mask = mask.reshape(shape)
    if fill_value == 0.0:
        return jnp.where(mask, x, jnp.zeros((), dtype=x.dtype))
    return jnp.where(mask, x, jnp.asarray(fill_value, dtype=x.dtype))


def masked_mean_std(
    x: jax.Array,
    mask: jax.Array | None,
    axis,
    div_guard: float = 1e-7,
):
    """Mean and std over ``axis`` restricted to ``mask`` (population std).

    Statistics are wrapped in ``stop_gradient`` to mirror the ``.detach()``
    calls of the reference implementation (`blocks.py:140-145`).

    Returns:
        ``(mean, std)`` with ``keepdims=True`` shapes.
    """
    if mask is None:
        mean = jax.lax.stop_gradient(jnp.mean(x, axis=axis, keepdims=True))
        var = jax.lax.stop_gradient(jnp.var(x, axis=axis, ddof=1, keepdims=True))
        return mean, jnp.sqrt(var + div_guard)
    mask = mask.astype(x.dtype)
    x = x * mask
    n = jax.lax.stop_gradient(jnp.sum(mask, axis=axis, keepdims=True))
    n = jnp.maximum(n, 1.0)
    mean = jax.lax.stop_gradient(jnp.sum(x, axis=axis, keepdims=True)) / n
    sq = jax.lax.stop_gradient(jnp.sum(jnp.square((x - mean) * mask), axis=axis, keepdims=True))
    std = jnp.sqrt(sq / n)
    return mean, std


def normalize_tensor(
    x: jax.Array,
    mask: jax.Array | None = None,
    div_guard: float = 1e-7,
    axis: int = -1,
) -> jax.Array:
    """Masked zero-mean/unit-std normalization.

    Port of the reference ``normalize_tensor`` (`blocks.py:118-153`):

    - with a mask: population std over the valid region, ``(x - mean) /
      (std + div_guard)``, invalid region zeroed in the output.
    - without a mask: sample std (ddof=1) and ``(x - mean) / sqrt(var +
      div_guard)`` — matching the subtle asymmetry of the reference.

    DELIBERATE DEVIATION: the reference sums squared deviations over *all*
    positions (each zero-filled pad frame contributes ``mean**2`` to the
    numerator while ``n`` counts only valid frames), so its statistics — and
    therefore its batched outputs — depend on how much padding a batch
    happens to carry.  Here the squared deviations are masked too, making the
    output invariant to the padding bucket (the property the whole
    static-shape design tests for; see test_bucket_invariance).  For
    unpadded/full-length inputs, e.g. the reference's own golden checkpoint
    tests, the two are identical.
    """
    if mask is not None:
        maskf = mask.astype(x.dtype)
        x = x * maskf
        mean, std = masked_mean_std(x, mask, axis=axis, div_guard=div_guard)
        normalized = (x - mean) / (std + div_guard)
        return normalized * maskf
    mean, std = masked_mean_std(x, None, axis=axis, div_guard=div_guard)
    return (x - mean) / std


@partial(jax.jit, static_argnames=("div_guard",))
def masked_feature_normalize(x: jax.Array, lengths: jax.Array, div_guard: float = 1e-5) -> jax.Array:
    """Per-(sample, feature) normalization over valid time frames.

    Equivalent of ``FeatureBatchNormalizer`` (`quartznet/transform.py:71-92`)
    in channels-last layout: input is ``(batch, time, features)`` and
    statistics are computed along time within the valid region of each sample.
    """
    mask = lengths_to_mask(lengths, x.shape[1])[:, :, None]
    return normalize_tensor(x, mask, div_guard=div_guard, axis=1)
