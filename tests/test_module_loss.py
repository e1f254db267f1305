"""CTCModule.loss: the API-parity hook for custom training loops."""

import jax
import jax.numpy as jnp
import numpy as np

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.text import BatchTextTransformer


def _module():
    tt = BatchTextTransformer(tokens=list("ab "))
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=4000,
    )


def test_loss_eval_mode():
    module = _module()
    audio = jnp.asarray((np.random.default_rng(0).standard_normal((2, 8000)) * 0.2).astype(np.float32))
    targets, target_lengths = module.text_transform.encode(["ab a", "b"])
    loss, (logits, out_lengths, updates) = module.loss(
        module.variables, audio, jnp.array([8000, 5000]), jnp.asarray(targets), jnp.asarray(target_lengths)
    )
    assert np.isfinite(float(loss))
    assert logits.shape[-1] == module.text_transform.num_tokens
    assert updates is None  # eval mode: no batch_stats mutation


def test_loss_train_mode_updates_stats():
    module = _module()
    audio = jnp.asarray((np.random.default_rng(1).standard_normal((2, 8000)) * 0.2).astype(np.float32))
    targets, target_lengths = module.text_transform.encode(["a", "b"])
    loss, (_, _, updates) = module.loss(
        module.variables,
        audio,
        jnp.array([8000, 8000]),
        jnp.asarray(targets),
        jnp.asarray(target_lengths),
        train=True,
        rngs={"dropout": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(float(loss))
    assert updates is not None and "batch_stats" in updates
    # grads flow through loss
    def f(params):
        variables = {"params": params, "batch_stats": module.variables["batch_stats"]}
        l, _ = module.loss(variables, audio, jnp.array([8000, 8000]), jnp.asarray(targets), jnp.asarray(target_lengths))
        return l

    grads = jax.grad(f)(module.variables["params"])
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert total > 0
