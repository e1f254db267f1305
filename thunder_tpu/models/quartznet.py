"""QuartzNet encoder (5x5 / 15x5) in flax.

Architecture parity with the reference builders
(`/root/reference/src/thunder/quartznet/blocks.py:341-434`):

- stem: feat_in -> 256, k=33, stride 2, separable, no residual;
- body: per-(filters, kernel) residual separable blocks x repeat_blocks,
  then a k=87 dilation-2 512ch block and a 1x1 1024ch dense block;
- QuartzNet5x5 = repeat_blocks=1, QuartzNet15x5 = repeat_blocks=3.

Layout: ``(batch, frames, channels)``; returns ``(encoded, lengths)``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from thunder_tpu.models.layers import EncoderBlock, InitMode

__all__ = ["QuartznetEncoder"]


class QuartznetEncoder(nn.Module):
    feat_in: int = 64
    filters: Sequence[int] = (256, 256, 512, 512, 512)
    kernel_sizes: Sequence[int] = (33, 39, 51, 63, 75)
    repeat_blocks: int = 1
    repeat: int = 5
    dropout: float = 0.0
    init_mode: str = InitMode.xavier_uniform
    dtype: jnp.dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    #: rematerialize each block's activations in the backward pass
    #: (jax.checkpoint per block: ~1/n_blocks the activation HBM for one
    #: extra forward of compute — the standard TPU memory/FLOPs trade)
    remat: bool = False

    #: encoder output channels — the decoder input dimension
    final_dimension: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        kw = dict(dtype=self.dtype, precision=self.precision, dropout=self.dropout, init_mode=self.init_mode)
        blocks = []
        # stem
        blocks.append(
            dict(features=256, repeat=1, kernel_size=33, stride=2, residual=False, separable=True)
        )
        # body
        for f, k in zip(self.filters, self.kernel_sizes):
            for _ in range(self.repeat_blocks):
                blocks.append(dict(features=f, repeat=self.repeat, kernel_size=k, separable=True))
        blocks.append(
            dict(features=512, repeat=1, kernel_size=87, dilation=2, residual=False, separable=True)
        )
        blocks.append(dict(features=1024, repeat=1, kernel_size=1, residual=False, separable=False))

        block_cls = nn.remat(EncoderBlock, static_argnums=(3,)) if self.remat else EncoderBlock
        for i, cfg in enumerate(blocks):
            x, lengths = block_cls(name=f"block{i}", **cfg, **kw)(x, lengths, train)
        return x, lengths
