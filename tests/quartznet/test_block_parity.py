"""Numerical parity of the flax EncoderBlock against an independent torch mirror.

The torch mirror is written here in the test (masked conv -> batchnorm ->
relu -> residual), with weights copied from the flax params — this plays the
role the reference's golden checkpoint tests play, without network access.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from thunder_tpu.models.layers import EncoderBlock
from thunder_tpu.ops.conv import get_same_padding


def _randomize_bn(variables, rng):
    """Give running stats / scale / bias non-trivial values so eval-mode BN
    actually tests something."""

    def rand_like(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, x.shape), x.dtype)
        return jnp.asarray(rng.standard_normal(x.shape) * 0.5, x.dtype)

    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    for k, v in flat.items():
        if any(part in ("mean", "var", "scale", "bias") for part in k):
            name = k[-1]
            if name == "var":
                v = jnp.asarray(rng.uniform(0.5, 2.0, v.shape), v.dtype)
            else:
                v = jnp.asarray(rng.standard_normal(v.shape).astype(np.float32) * 0.5, v.dtype)
        out[k] = v
    return flax.traverse_util.unflatten_dict(out)


def _torch_masked_conv(x, lengths, weight, stride=1, padding=0, dilation=1, groups=1):
    # x: (B, C, T) torch; zero-fill beyond lengths then conv
    mask = torch.arange(x.shape[-1])[None, :] < torch.as_tensor(lengths)[:, None]
    x = x * mask[:, None, :]
    return F.conv1d(x, weight, None, stride=stride, padding=padding, dilation=dilation, groups=groups)


def _torch_bn(x, p, eps=1e-3):
    scale, bias, mean, var = p
    return F.batch_norm(x, mean, var, scale, bias, training=False, eps=eps)


def _flax_to_torch_conv(kernel):
    # flax (k, in/groups, out) -> torch (out, in/groups, k)
    return torch.tensor(np.asarray(kernel).transpose(2, 1, 0))


def _bn_tensors(params, stats):
    return (
        torch.tensor(np.asarray(params["scale"])),
        torch.tensor(np.asarray(params["bias"])),
        torch.tensor(np.asarray(stats["mean"])),
        torch.tensor(np.asarray(stats["var"])),
    )


def _conv_out_len(lengths, k, s, p, d):
    return (np.asarray(lengths) + 2 * p - d * (k - 1) - 1) // s + 1


def _torch_block(cfg, params, stats, x, lengths):
    """Independent torch implementation of EncoderBlock semantics."""
    out = x
    out_lens = np.asarray(lengths)
    inp, inp_lens = x, np.asarray(lengths)
    repeat = cfg.get("repeat", 5)
    k = cfg["kernel_size"]
    stride = cfg.get("stride", 1)
    dil = cfg.get("dilation", 1)
    for r in range(repeat):
        last = r == repeat - 1
        stride_r = stride if (not cfg.get("stride_last_only") or last) else 1
        pad = get_same_padding(k, stride_r, dil)
        rep = params[f"rep{r}"]
        rep_stats = stats[f"rep{r}"]
        if cfg.get("separable", False):
            c_in = out.shape[1]
            out = _torch_masked_conv(out, out_lens, _flax_to_torch_conv(rep["depthwise"]["conv"]["kernel"]),
                                     stride=stride_r, padding=pad, dilation=dil, groups=c_in)
            out_lens = _conv_out_len(out_lens, k, stride_r, pad, dil)
            out = _torch_masked_conv(out, out_lens, _flax_to_torch_conv(rep["pointwise"]["conv"]["kernel"]))
        else:
            out = _torch_masked_conv(out, out_lens, _flax_to_torch_conv(rep["conv"]["conv"]["kernel"]),
                                     stride=stride_r, padding=pad, dilation=dil)
            out_lens = _conv_out_len(out_lens, k, stride_r, pad, dil)
        out = _torch_bn(out, _bn_tensors(rep["bn"], rep_stats["bn"]))
        if not last:
            out = F.relu(out)
    if cfg.get("residual", True):
        res_stride = 1 if stride == 1 else (stride ** repeat if cfg.get("residual_stride_pow", True) else stride)
        res = _torch_masked_conv(inp, inp_lens, _flax_to_torch_conv(params["res"]["conv"]["conv"]["kernel"]),
                                 stride=res_stride)
        res = _torch_bn(res, _bn_tensors(params["res"]["bn"], stats["res"]["bn"]))
        out = out + res
    return F.relu(out), out_lens


CONFIGS = [
    dict(features=32, repeat=3, kernel_size=11, separable=True, residual=True),
    dict(features=32, repeat=1, kernel_size=33, stride=2, separable=True, residual=False),
    dict(features=48, repeat=1, kernel_size=17, dilation=2, separable=True, residual=False),
    dict(features=32, repeat=2, kernel_size=1, separable=False, residual=False),
    dict(features=32, repeat=2, kernel_size=13, separable=True, residual=True, stride=2,
         stride_last_only=True, residual_stride_pow=False),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[str(i) for i in range(len(CONFIGS))])
def test_block_matches_torch_mirror(cfg):
    rng = np.random.default_rng(0)
    block = EncoderBlock(**cfg)
    x = rng.standard_normal((3, 40, 16)).astype(np.float32)
    lengths = np.array([40, 30, 17], dtype=np.int32)

    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths))
    variables = _randomize_bn(variables, rng)

    ours, our_lens = block.apply(variables, jnp.asarray(x), jnp.asarray(lengths))
    want, want_lens = _torch_block(
        cfg,
        variables["params"],
        variables["batch_stats"],
        torch.tensor(x.transpose(0, 2, 1)),
        lengths,
    )
    np.testing.assert_array_equal(np.asarray(our_lens), want_lens)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 2, 1), want.numpy(), atol=2e-4, rtol=1e-4
    )


def test_block_parameters_update():
    """Every trainable param receives a nonzero gradient (reference harness
    `_test_parameters_update`, tests/utils.py:38-50)."""
    cfg = dict(features=16, repeat=2, kernel_size=7, separable=True, residual=True)
    block = EncoderBlock(**cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 30, 8)).astype(np.float32))
    lengths = jnp.array([30, 20])
    variables = block.init(jax.random.PRNGKey(0), x, lengths)

    def loss_fn(params):
        out, _ = block.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, lengths, train=False,
        )
        return jnp.mean(out)

    grads = jax.grad(loss_fn)(variables["params"])
    import flax

    for path, g in flax.traverse_util.flatten_dict(grads).items():
        assert float(jnp.sum(g**2)) != 0.0, path


def test_block_batch_independence():
    """Masked sample's input grad must be exactly zero (reference harness
    `_test_batch_independence`, tests/utils.py:70-97); eval mode so BN stats
    don't couple the batch."""
    cfg = dict(features=16, repeat=2, kernel_size=7, separable=True, residual=True)
    block = EncoderBlock(**cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 30, 8)).astype(np.float32))
    lengths = jnp.array([30, 25, 20])
    variables = block.init(jax.random.PRNGKey(0), x, lengths)
    mask_idx = 1

    def loss_fn(x_in):
        out, _ = block.apply(variables, x_in, lengths, train=False)
        mask = jnp.ones((x.shape[0], 1, 1)).at[mask_idx].set(0.0)
        return jnp.mean(out * mask)

    grads = np.asarray(jax.grad(loss_fn)(x))
    assert np.all(grads[mask_idx] == 0)
    for i in range(x.shape[0]):
        if i != mask_idx:
            assert not np.all(grads[i] == 0)
