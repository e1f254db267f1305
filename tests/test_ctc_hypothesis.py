"""Hypothesis torture test: CTC loss vs torch over random shapes/lengths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from hypothesis import given, settings
from hypothesis import strategies as st

from thunder_tpu.ops import ctc_loss


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    batch=st.integers(1, 4),
    max_t=st.integers(8, 40),
    max_l=st.integers(1, 8),
    vocab=st.integers(3, 12),
    blank_last=st.booleans(),
)
def test_ctc_matches_torch_random(seed, batch, max_t, max_l, vocab, blank_last):
    rng = np.random.default_rng(seed)
    blank = vocab - 1 if blank_last else 0
    logits = rng.standard_normal((batch, max_t, vocab)).astype(np.float32)
    lo = min(max(2 * max_l + 1, 2), max_t)  # keep alignments feasible
    logit_lengths = rng.integers(lo, max_t + 1, size=batch)
    target_lengths = rng.integers(1, max_l + 1, size=batch)
    targets = rng.integers(0, vocab, size=(batch, max_l))
    targets = np.where(targets == blank, (blank + 1) % vocab, targets)

    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = np.asarray(
        ctc_loss(lp, jnp.asarray(logit_lengths), jnp.asarray(targets), jnp.asarray(target_lengths),
                 blank=blank, reduction="none")
    )
    lp_t = F.log_softmax(torch.tensor(logits), dim=-1).permute(1, 0, 2)
    want = F.ctc_loss(
        lp_t, torch.tensor(targets), torch.tensor(logit_lengths), torch.tensor(target_lengths),
        blank=blank, reduction="none", zero_infinity=True,
    ).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-3)
