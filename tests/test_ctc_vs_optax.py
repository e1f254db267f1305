"""Triangulate the CTC implementation against optax's (third implementation
besides torch — tests/test_ops_ctc.py covers torch parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from thunder_tpu.ops import ctc_loss


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_matches_optax(seed):
    rng = np.random.default_rng(seed)
    B, T, L, V = 4, 50, 10, 20
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    logit_lengths = rng.integers(2 * L + 2, T + 1, size=B)
    target_lengths = rng.integers(1, L + 1, size=B)
    targets = rng.integers(1, V, size=(B, L))

    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = np.asarray(
        ctc_loss(lp, jnp.asarray(logit_lengths), jnp.asarray(targets), jnp.asarray(target_lengths),
                 blank=0, reduction="none")
    )
    logit_pad = (np.arange(T)[None, :] >= logit_lengths[:, None]).astype(np.float32)
    label_pad = (np.arange(L)[None, :] >= target_lengths[:, None]).astype(np.float32)
    theirs = np.asarray(
        optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_pad), jnp.asarray(targets),
                       jnp.asarray(label_pad), blank_id=0)
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)
