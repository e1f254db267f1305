"""Shared flax building blocks for the conv encoders.

TPU-first rebuild of the reference block zoo
(`/root/reference/src/thunder/quartznet/blocks.py`,
`/root/reference/src/thunder/citrinet/blocks.py`):

- channels-last ``(batch, time, channels)`` so pointwise convs are MXU
  matmuls and the channel dim rides the 128-wide lanes;
- ``(array, lengths)`` pairs instead of wrapper classes — the reference's
  ``MultiSequential``/``Masked`` dissolve into function composition;
- batch-norm running stats live in flax's ``batch_stats`` collection with
  torch semantics (eps=1e-3, torch momentum convention; see TorchBatchNorm).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from thunder_tpu.ops.conv import conv_output_length, get_same_padding
from thunder_tpu.ops.masking import apply_mask, lengths_to_mask

__all__ = ["InitMode", "weight_init", "MaskedConv1d", "TorchBatchNorm", "ConvBnAct", "SqueezeExcite", "EncoderBlock"]

BN_EPS = 1e-3


class InitMode:
    """Weight init schemes (reference ``InitMode``/``init_weights``,
    `quartznet/blocks.py:46-90`)."""

    xavier_uniform = "xavier_uniform"
    xavier_normal = "xavier_normal"
    kaiming_uniform = "kaiming_uniform"
    kaiming_normal = "kaiming_normal"


def weight_init(mode: str = InitMode.xavier_uniform):
    """flax initializer for an InitMode name (kaiming = relu gain, fan_in)."""
    table = {
        InitMode.xavier_uniform: nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
        InitMode.xavier_normal: nn.initializers.variance_scaling(1.0, "fan_avg", "normal"),
        InitMode.kaiming_uniform: nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
        InitMode.kaiming_normal: nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
    }
    try:
        return table[mode]
    except KeyError as err:
        raise ValueError(f"Unknown Initialization mode: {mode}") from err


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch running-stat semantics + masked batch statistics.

    torch normalizes with the biased batch variance but updates
    ``running_var`` with the *unbiased* one (ddof=1) — flax's BatchNorm uses
    the biased variance for both, a small but real training-parity gap.
    Collection layout matches flax (params scale/bias, batch_stats mean/var)
    so checkpoint import code is unaffected.

    DELIBERATE DEVIATION: with a ``mask``, train-mode statistics cover only
    the valid frames.  The reference's BN averages over padded zeros too,
    which it gets away with because its collate pads to the batch max (a few
    percent padding); this framework pads to static buckets where a short
    clip can be mostly padding — unmasked stats then become padding-dominated
    and eval-mode (running-stat) predictions collapse for clips whose padding
    fraction differs from the training average (observed on TPU training).
    Masked statistics are padding-invariant, so train and eval agree for any
    bucket. Unmasked behavior is unchanged (pass mask=None).
    """

    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True, mask: Optional[jax.Array] = None) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((features,), jnp.float32))

        fast = self.dtype == jnp.bfloat16
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            if fast:
                # bf16 training fast path: ONE pass over the activation —
                # E[x] and E[x^2] accumulate in f32 from bf16 reads (fused
                # into a single reduction), var = E[x^2] - mean^2.  The
                # two-pass f32 formulation below costs ~3 full f32
                # activation passes per BN; measured on v5e this path cuts
                # the train-mode BN overhead roughly in half.  bf16
                # squaring noise (~2^-8 relative, averaging out over B*T)
                # sits far below BN's batch-estimate variance.
                if mask is None:
                    n = jnp.asarray(x.size / features, jnp.float32)
                    s1 = jnp.sum(x, axis=reduce_axes, dtype=jnp.float32)
                    s2 = jnp.sum(jnp.square(x), axis=reduce_axes, dtype=jnp.float32)
                else:
                    mb = mask[..., None]
                    n = jnp.maximum(jnp.sum(mask, dtype=jnp.float32), 1.0)
                    xm = jnp.where(mb, x, jnp.zeros((), x.dtype))
                    s1 = jnp.sum(xm, axis=reduce_axes, dtype=jnp.float32)
                    s2 = jnp.sum(jnp.square(xm), axis=reduce_axes, dtype=jnp.float32)
                mean = s1 / n
                var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
            else:
                xf = x.astype(jnp.float32)
                if mask is None:
                    mean = jnp.mean(xf, axis=reduce_axes)
                    var = jnp.var(xf, axis=reduce_axes)
                    n = x.size / features
                else:
                    m = mask.astype(jnp.float32)[..., None]  # (B, T, 1)
                    n = jnp.maximum(m.sum(), 1.0)
                    mean = (xf * m).sum(axis=reduce_axes) / n
                    var = (jnp.square(xf - mean) * m).sum(axis=reduce_axes) / n
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                mo = self.momentum
                ra_mean.value = (1 - mo) * ra_mean.value + mo * mean
                ra_var.value = (1 - mo) * ra_var.value + mo * unbiased

        if fast:
            # fold normalize+affine into one bf16 multiply-add (the engine's
            # folded-BN epilogue, applied to training): y = x*a + b
            a = scale * jax.lax.rsqrt(var + self.epsilon)
            b = bias - mean * a
            return x * a.astype(self.dtype) + b.astype(self.dtype)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class MaskedConv1d(nn.Module):
    """1-D conv that zero-fills beyond ``lengths`` before convolving and
    returns the post-conv lengths (reference ``MaskedConv1d``,
    `quartznet/blocks.py:93-182`)."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Optional[int] = None  # None -> same padding
    use_bias: bool = False
    use_mask: bool = True
    init_mode: str = InitMode.xavier_uniform
    dtype: jnp.dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array) -> Tuple[jax.Array, jax.Array]:
        pad = self.padding if self.padding is not None else get_same_padding(self.kernel_size, self.stride, self.dilation)
        if self.use_mask:
            x = apply_mask(x, lengths)
        y = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(pad, pad)],
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=weight_init(self.init_mode),
            dtype=self.dtype,
            precision=self.precision,
            name="conv",
        )(x)
        new_lengths = conv_output_length(lengths, self.kernel_size, self.stride, pad, self.dilation)
        return y, new_lengths


class ConvBnAct(nn.Module):
    """(separable) conv -> batchnorm -> optional relu+dropout, with lengths.

    ``separable=True`` builds depthwise(k, groups=C_in) + pointwise(1x1), the
    time-channel-separable convolution of QuartzNet (`blocks.py:185-224`).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    separable: bool = False
    padding: Optional[int] = None
    activation: bool = True
    dropout: float = 0.0
    init_mode: str = InitMode.xavier_uniform
    dtype: jnp.dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False):
        kw = dict(dtype=self.dtype, precision=self.precision, init_mode=self.init_mode)
        if self.separable:
            in_ch = x.shape[-1]
            x, lengths = MaskedConv1d(
                features=in_ch,
                kernel_size=self.kernel_size,
                stride=self.stride,
                dilation=self.dilation,
                groups=in_ch,
                padding=self.padding,
                name="depthwise",
                **kw,
            )(x, lengths)
            x, lengths = MaskedConv1d(features=self.features, kernel_size=1, name="pointwise", **kw)(x, lengths)
        else:
            x, lengths = MaskedConv1d(
                features=self.features,
                kernel_size=self.kernel_size,
                stride=self.stride,
                dilation=self.dilation,
                padding=self.padding,
                name="conv",
                **kw,
            )(x, lengths)
        x = TorchBatchNorm(epsilon=BN_EPS, dtype=self.dtype, name="bn")(
            x,
            use_running_average=not train,
            mask=lengths_to_mask(lengths, x.shape[1]) if train else None,
        )
        if self.activation:
            x = nn.relu(x)
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x, lengths


class SqueezeExcite(nn.Module):
    """Channel gating from masked global average pooling.

    Citrinet's SE module (`citrinet/blocks.py:48-83`).  The reference pools
    over the full padded time axis; here the pool is masked by ``lengths`` —
    identical for full-length inputs (the checkpoint-parity case) and correct
    for padded batches.
    """

    reduction_ratio: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array) -> jax.Array:
        channels = x.shape[-1]
        mask = lengths_to_mask(lengths, x.shape[1]).astype(x.dtype)[:, :, None]
        denom = jnp.maximum(mask.sum(axis=1), 1.0)
        pooled = (x * mask).sum(axis=1) / denom  # (B, C)
        y = nn.Dense(channels // self.reduction_ratio, use_bias=False, dtype=self.dtype, name="fc1")(pooled)
        y = nn.relu(y)
        y = nn.Dense(channels, use_bias=False, dtype=self.dtype, name="fc2")(y)
        gate = jax.nn.sigmoid(y)
        return x * gate[:, None, :]


class EncoderBlock(nn.Module):
    """The shared QuartzNet/Citrinet residual block.

    ``repeat`` x (conv -> bn -> relu -> dropout), last repeat without act,
    optional 1x1 conv-bn residual, then final relu+dropout
    (`quartznet/blocks.py:231-338`, `citrinet/blocks.py:86-197`).

    Differences encoded by flags:
    - ``stride_last_only`` (Citrinet): stride applies only to the last repeat;
    - ``squeeze_excite`` (Citrinet): SE module after the conv stack;
    - residual stride: QuartzNet uses ``stride ** repeat`` when strided,
      Citrinet uses ``stride``.
    """

    features: int
    repeat: int = 5
    kernel_size: int = 11
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    residual: bool = True
    separable: bool = False
    stride_last_only: bool = False
    squeeze_excite: bool = False
    se_reduction_ratio: int = 8
    residual_stride_pow: bool = True  # True: stride**repeat (QuartzNet)
    init_mode: str = InitMode.xavier_uniform
    dtype: jnp.dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False):
        kw = dict(
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            separable=self.separable,
            dropout=self.dropout,
            init_mode=self.init_mode,
            dtype=self.dtype,
            precision=self.precision,
        )
        out, out_lengths = x, lengths
        for r in range(self.repeat):
            last = r == self.repeat - 1
            if self.stride_last_only:
                stride_r = self.stride if last else 1
            else:
                stride_r = self.stride
            pad = get_same_padding(self.kernel_size, stride_r, self.dilation)
            out, out_lengths = ConvBnAct(
                features=self.features,
                stride=stride_r,
                padding=pad,
                activation=not last,
                name=f"rep{r}",
                **kw,
            )(out, out_lengths, train=train)

        if self.squeeze_excite:
            out = SqueezeExcite(reduction_ratio=self.se_reduction_ratio, dtype=self.dtype, name="se")(out, out_lengths)

        if self.residual:
            if self.stride == 1:
                res_stride = 1
            else:
                res_stride = self.stride**self.repeat if self.residual_stride_pow else self.stride
            res, _ = ConvBnAct(
                features=self.features,
                kernel_size=1,
                stride=res_stride,
                activation=False,
                name="res",
                init_mode=self.init_mode,
                dtype=self.dtype,
                precision=self.precision,
            )(x, lengths, train=train)
            out = out + res

        out = nn.relu(out)
        out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        return out, out_lengths
