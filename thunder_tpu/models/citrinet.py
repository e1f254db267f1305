"""Citrinet encoder in flax.

Architecture parity with the reference builders
(`/root/reference/src/thunder/citrinet/blocks.py:200-278`):

- stem: feat_in -> 256, k=5, separable, no residual, squeeze-excite;
- body: per-(filters, kernel, stride) separable residual SE blocks, stride
  applied only on the last repeat of a block;
- final: k=41 640ch block, no residual.

Layout: ``(batch, frames, channels)``; returns ``(encoded, lengths)``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from thunder_tpu.models.layers import EncoderBlock, InitMode

__all__ = ["CitrinetEncoder"]


class CitrinetEncoder(nn.Module):
    filters: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    feat_in: int = 80
    repeat: int = 5
    dropout: float = 0.0
    init_mode: str = InitMode.xavier_uniform
    dtype: jnp.dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    #: rematerialize each block in the backward pass (see QuartznetEncoder)
    remat: bool = False

    final_dimension: int = 640

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        kw = dict(
            dtype=self.dtype,
            precision=self.precision,
            dropout=self.dropout,
            init_mode=self.init_mode,
            separable=True,
            squeeze_excite=True,
            stride_last_only=True,
            residual_stride_pow=False,  # Citrinet residual stride == stride
        )
        blocks = [dict(features=256, repeat=1, kernel_size=5, residual=False)]
        for f, k, s in zip(self.filters, self.kernel_sizes, self.strides):
            blocks.append(dict(features=f, repeat=self.repeat, kernel_size=k, stride=s))
        blocks.append(dict(features=640, repeat=1, kernel_size=41, residual=False))

        block_cls = nn.remat(EncoderBlock, static_argnums=(3,)) if self.remat else EncoderBlock
        for i, cfg in enumerate(blocks):
            x, lengths = block_cls(name=f"block{i}", **cfg, **kw)(x, lengths, train)
        return x, lengths
