"""CPU (interpret-mode) parity tests for the Pallas CTC recursion.

The scan implementation in ops/ctc.py is the reference (itself pinned
against torch CTC semantics in tests/test_ops_ctc.py / test_ctc_vs_optax);
these tests assert the Pallas kernels reproduce its loss AND gradient
exactly, including the edge cases the recursion gates encode: repeated
labels (skip_ok), empty targets, impossible alignments (T < extended
path), variable logit lengths, and T not a multiple of the kernel's time
block.  The on-chip compiled check is the ``ctc_recursion`` selftest.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.kernels.ctc_pallas import ctc_ll_pallas
from thunder_tpu.ops.ctc import ctc_forward_scores

_NEG = -1e30


def _setup(lp, targets, blank=0):
    b, _, _ = lp.shape
    max_l = targets.shape[1]
    s_dim = 2 * max_l + 1
    z = jnp.full((b, s_dim), blank, jnp.int32).at[:, 1::2].set(targets)
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :s_dim]
    is_label = jnp.arange(s_dim) % 2 == 1
    skip_ok = is_label[None, :] & (z != z_prev2)
    lp_z = jnp.moveaxis(jnp.take_along_axis(lp, z[:, None, :], axis=2), 1, 0)
    return z, skip_ok, lp_z


def _pallas_losses(lp, targets, logit_lengths, target_lengths):
    z, skip_ok, lp_z = _setup(lp, targets)
    ll = ctc_ll_pallas(lp_z, skip_ok, logit_lengths, target_lengths, interpret=True)
    loss = -ll
    return jnp.where(loss > -0.5 * _NEG, jnp.inf, loss)


@pytest.fixture()
def case():
    rng = np.random.default_rng(0)
    b, t, v, l = 5, 61, 12, 9  # t deliberately not a multiple of the K block
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    lp = jax.nn.log_softmax(logits, axis=-1)
    targets = jnp.asarray(rng.integers(1, v, (b, l)), jnp.int32)
    targets = targets.at[0, 1].set(targets[0, 0])  # repeat -> skip_ok matters
    target_lengths = jnp.asarray([9, 5, 0, 1, 9], jnp.int32)  # incl. empty
    logit_lengths = jnp.asarray([61, 40, 30, 2, 19], jnp.int32)  # incl. impossible
    return lp, targets, logit_lengths, target_lengths


def test_losses_match_scan(case):
    lp, targets, logit_lengths, target_lengths = case
    ref = ctc_forward_scores(lp, logit_lengths, targets, target_lengths, blank=0)
    got = _pallas_losses(lp, targets, logit_lengths, target_lengths)
    # sample 3: 2 frames for a 1-label target is possible; sample with
    # T < |extended path| must agree on inf-ness too
    np.testing.assert_array_equal(np.isinf(np.asarray(ref)), np.isinf(np.asarray(got)))
    mask = ~np.isinf(np.asarray(ref))
    np.testing.assert_allclose(np.asarray(got)[mask], np.asarray(ref)[mask], rtol=1e-6)


def test_gradients_match_scan(case):
    lp, targets, logit_lengths, target_lengths = case

    def mean_loss(lossv):
        lossv = jnp.where(jnp.isinf(lossv), 0.0, lossv)  # zero_infinity
        return jnp.mean(lossv / jnp.maximum(target_lengths, 1))

    g_ref = jax.grad(
        lambda x: mean_loss(ctc_forward_scores(x, logit_lengths, targets, target_lengths, blank=0))
    )(lp)
    g_pal = jax.grad(
        lambda x: mean_loss(_pallas_losses(x, targets, logit_lengths, target_lengths))
    )(lp)
    assert float(jnp.max(jnp.abs(g_ref))) > 1e-3  # non-degenerate
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-5)


def test_impossible_sample_gets_zero_gradient(case):
    lp, targets, logit_lengths, target_lengths = case

    def loss_with_zero_inf(x):
        lossv = _pallas_losses(x, targets, logit_lengths, target_lengths)
        return jnp.sum(jnp.where(jnp.isinf(lossv), 0.0, lossv))

    g = jax.grad(loss_with_zero_inf)(lp)
    ref = ctc_forward_scores(lp, logit_lengths, targets, target_lengths, blank=0)
    for i, inf in enumerate(np.isinf(np.asarray(ref))):
        gi = float(jnp.max(jnp.abs(g[i])))
        if inf:
            assert gi == 0.0
        else:
            assert gi > 0.0


def test_gate_routes_by_backend(monkeypatch):
    from thunder_tpu.ops.ctc import _use_pallas_recursion

    monkeypatch.delenv("THUNDER_CTC_PALLAS", raising=False)
    on_tpu = jax.default_backend() == "tpu"
    assert _use_pallas_recursion() is on_tpu
    monkeypatch.setenv("THUNDER_CTC_PALLAS", "0")
    assert _use_pallas_recursion() is False
