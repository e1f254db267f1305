"""CTC decoder heads.

Parity targets: ``conv1d_decoder`` (1x1 conv, xavier-uniform, bias) and
``linear_decoder`` (dropout + dense) from the reference
(`/root/reference/src/thunder/blocks.py:199-248`).  Because this framework is
channels-last throughout, the reference's transpose sandwich
(``SwapLastDimension``) is unnecessary — both heads are plain matmuls over
the channel dim, exactly what the MXU wants.  Output: ``(batch, time, vocab)``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Conv1dDecoder", "LinearDecoder"]


class Conv1dDecoder(nn.Module):
    """1x1 conv head: encoder features -> per-frame vocab logits."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.Conv(
            features=self.num_classes,
            kernel_size=(1,),
            use_bias=True,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            precision=self.precision,
            name="conv",
        )(x)


class LinearDecoder(nn.Module):
    """Dropout + dense head (wav2vec2-style lm_head)."""

    num_classes: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return nn.Dense(
            features=self.num_classes,
            dtype=self.dtype,
            precision=self.precision,
            name="dense",
        )(x)
