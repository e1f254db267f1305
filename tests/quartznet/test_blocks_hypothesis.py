"""Hypothesis property tests over randomized block hyperparameters
(the reference's strategy, `tests/quartznet/test_blocks_qn.py:158-183`)."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from thunder_tpu.models.layers import EncoderBlock
from thunder_tpu.ops.conv import conv_output_length, get_same_padding

block_cfgs = st.fixed_dictionaries(
    {
        "features": st.sampled_from([8, 16, 32]),
        "repeat": st.integers(1, 3),
        "kernel_size": st.sampled_from([1, 3, 7, 11, 33]),
        "stride": st.sampled_from([1, 2]),
        "separable": st.booleans(),
        "residual": st.booleans(),
    }
)


@settings(max_examples=8, deadline=None)
@given(cfg=block_cfgs)
def test_block_shapes_and_lengths(cfg):
    if cfg["stride"] > 1 and cfg["residual"]:
        cfg = dict(cfg, residual=False)  # quartznet residual requires stride 1 shapes
    block = EncoderBlock(**cfg)
    x = jnp.zeros((2, 40, 8))
    lengths = jnp.array([40, 23])
    variables = block.init(jax.random.PRNGKey(0), x, lengths)
    out, out_lens = block.apply(variables, x, lengths)

    # out time dim == ceil(T / stride^repeat applications)
    expect = np.array([40, 23])
    for _ in range(cfg["repeat"]):
        pad = get_same_padding(cfg["kernel_size"], cfg["stride"], 1)
        expect = conv_output_length(expect, cfg["kernel_size"], cfg["stride"], pad, 1)
    np.testing.assert_array_equal(np.asarray(out_lens), expect)
    assert out.shape[-1] == cfg["features"]
    assert np.isfinite(np.asarray(out)).all()


@settings(max_examples=10, deadline=None)
@given(
    k=st.sampled_from([1, 3, 7, 11, 33, 87]),
    stride=st.sampled_from([1, 2]),
    length=st.integers(10, 200),
)
def test_same_padding_law(k, stride, length):
    pad = get_same_padding(k, stride, 1)
    out = conv_output_length(length, k, stride, pad, 1)
    assert int(out) == -(-length // stride)
