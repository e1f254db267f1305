import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from thunder_tpu.ops import calculate_ctc, collapse_ctc, ctc_loss, greedy_decode


def _random_case(rng, batch, max_t, max_l, vocab, blank):
    logits = rng.standard_normal((batch, max_t, vocab)).astype(np.float32)
    logit_lengths = rng.integers(max_l * 2 + 2, max_t + 1, size=batch)
    target_lengths = rng.integers(1, max_l + 1, size=batch)
    targets = rng.integers(0, vocab, size=(batch, max_l))
    # keep blank out of targets (torch requirement)
    targets = np.where(targets == blank, (blank + 1) % vocab, targets)
    return logits, logit_lengths, targets, target_lengths


@pytest.mark.parametrize("blank", [0, 27])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_loss_matches_torch(blank, seed):
    rng = np.random.default_rng(seed)
    vocab = 28
    logits, logit_lengths, targets, target_lengths = _random_case(rng, 5, 60, 12, vocab, blank)

    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = float(
        ctc_loss(
            log_probs,
            jnp.asarray(logit_lengths),
            jnp.asarray(targets),
            jnp.asarray(target_lengths),
            blank=blank,
        )
    )

    lp_t = F.log_softmax(torch.tensor(logits), dim=-1).permute(1, 0, 2)
    want = F.ctc_loss(
        lp_t,
        torch.tensor(targets),
        torch.tensor(logit_lengths),
        torch.tensor(target_lengths),
        blank=blank,
        reduction="mean",
        zero_infinity=True,
    ).item()
    assert ours == pytest.approx(want, abs=1e-4)


def test_ctc_loss_none_reduction_matches_torch():
    rng = np.random.default_rng(3)
    logits, logit_lengths, targets, target_lengths = _random_case(rng, 4, 50, 10, 20, 0)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = np.asarray(
        ctc_loss(
            log_probs,
            jnp.asarray(logit_lengths),
            jnp.asarray(targets),
            jnp.asarray(target_lengths),
            blank=0,
            reduction="none",
        )
    )
    lp_t = F.log_softmax(torch.tensor(logits), dim=-1).permute(1, 0, 2)
    want = F.ctc_loss(
        lp_t,
        torch.tensor(targets),
        torch.tensor(logit_lengths),
        torch.tensor(target_lengths),
        blank=0,
        reduction="none",
        zero_infinity=True,
    ).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-3)


def test_ctc_loss_impossible_alignment_zeroed():
    # targets longer than frames -> inf -> zeroed
    logits = jnp.zeros((1, 3, 5))
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = ctc_loss(
        log_probs,
        jnp.array([3]),
        jnp.array([[1, 2, 3, 4, 1, 2, 3, 4]]),
        jnp.array([8]),
        blank=0,
    )
    assert float(loss) == 0.0


def test_ctc_gradients_match_torch():
    rng = np.random.default_rng(7)
    logits, logit_lengths, targets, target_lengths = _random_case(rng, 3, 40, 8, 15, 0)

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(lp, jnp.asarray(logit_lengths), jnp.asarray(targets), jnp.asarray(target_lengths), blank=0)

    ours_grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    lg_t = torch.tensor(logits, requires_grad=True)
    lp_t = F.log_softmax(lg_t, dim=-1).permute(1, 0, 2)
    loss = F.ctc_loss(
        lp_t,
        torch.tensor(targets),
        torch.tensor(logit_lengths),
        torch.tensor(target_lengths),
        blank=0,
        reduction="mean",
        zero_infinity=True,
    )
    loss.backward()
    np.testing.assert_allclose(ours_grad, lg_t.grad.numpy(), atol=2e-4)


def test_calculate_ctc_api():
    rng = np.random.default_rng(11)
    logits, logit_lengths, targets, target_lengths = _random_case(rng, 2, 30, 5, 10, 9)
    loss = calculate_ctc(
        jnp.asarray(logits),
        jnp.asarray(targets),
        jnp.asarray(logit_lengths),
        jnp.asarray(target_lengths),
        blank=9,
    )
    assert np.isfinite(float(loss))


def test_greedy_decode_and_collapse():
    logits = np.full((1, 6, 4), -5.0, dtype=np.float32)
    path = [1, 1, 0, 2, 2, 3]  # -> collapse -> 1 0 2 3 (blanks kept)
    for t, tok in enumerate(path):
        logits[0, t, tok] = 5.0
    ids = np.asarray(greedy_decode(jnp.asarray(logits)))
    np.testing.assert_array_equal(ids[0], path)
    collapsed = collapse_ctc(ids)
    np.testing.assert_array_equal(collapsed[0], [1, 0, 2, 3])
    # lengths truncate
    collapsed = collapse_ctc(ids, np.array([3]))
    np.testing.assert_array_equal(collapsed[0], [1, 0])
