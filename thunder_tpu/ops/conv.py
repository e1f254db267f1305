"""1-D convolution primitives, channels-last, with length bookkeeping.

TPU mapping notes:
- pointwise (k=1) and dense convs become MXU matmuls via
  ``lax.conv_general_dilated`` with ``('NWC','WIO','NWC')`` dimension numbers;
- depthwise convs (``feature_group_count == channels``) are VPU work; XLA
  lowers them to shifted multiply-accumulates.  A fused Pallas kernel for
  depthwise-conv+BN+ReLU lives in ``thunder_tpu.kernels``.

Reference semantics reproduced here:
- out-length formula of ``MaskedConv1d.get_seq_len``
  (`/root/reference/src/thunder/quartznet/blocks.py:142-156`)
- ``get_same_padding`` (`/root/reference/src/thunder/blocks.py:173-196`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "get_same_padding",
    "conv_output_length",
    "conv1d",
]


def get_same_padding(kernel_size: int, stride: int = 1, dilation: int = 1) -> int:
    """Symmetric padding achieving out_len == ceil(in_len / stride).

    Raises:
        ValueError: if both stride and dilation exceed 1 (same constraint as
            the reference, `blocks.py:192-193`).
    """
    if stride > 1 and dilation > 1:
        raise ValueError("Only stride OR dilation may be greater than 1")
    if dilation > 1:
        return (dilation * (kernel_size - 1) + 1) // 2
    return kernel_size // 2


def conv_output_length(lengths, kernel_size: int, stride: int = 1, padding: int = 0, dilation: int = 1):
    """Conv arithmetic for the valid lengths: floor((L + 2p - d(k-1) - 1)/s) + 1.

    Works on both numpy ints and traced jax arrays.
    """
    numer = lengths + 2 * padding - dilation * (kernel_size - 1) - 1
    if isinstance(lengths, (int, np.integer)) or isinstance(lengths, np.ndarray):
        return np.floor_divide(numer, stride) + 1
    return jnp.floor_divide(numer, stride).astype(jnp.int32) + 1


def conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """Channels-last 1-D convolution.

    Args:
        x: ``(batch, time, in_channels)``.
        kernel: ``(kernel_size, in_channels // groups, out_channels)`` — the
            WIO layout jax expects (torch's OIW transposed).
        bias: optional ``(out_channels,)``.
        stride/padding/dilation/groups: usual conv hyperparameters; padding is
            symmetric (pad, pad) like torch's integer padding.

    Returns:
        ``(batch, out_time, out_channels)``.
    """
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=x.dtype if x.dtype == jnp.float32 else jnp.float32,
    )
    if out.dtype != x.dtype:
        out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
