"""freeze_feature_extractor: the functional form of the reference adapter's
unconditional ``freeze_feature_encoder()`` call
(`/root/reference/src/thunder/huggingface/compatibility.py:27-28`).

With the flag set, gradients must be exactly zero for every conv-extractor
leaf (XLA can then dead-code-eliminate the extractor backward), identical
and nonzero everywhere else, and the forward must be bit-identical."""

import jax
import jax.numpy as jnp
import numpy as np

from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

CFG = Wav2Vec2Config(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    conv_dim=(16, 16),
    conv_kernel=(10, 3),
    conv_stride=(5, 2),
)


def _grads(freeze: bool):
    enc = Wav2Vec2Encoder(config=CFG, mask_input=True, freeze_feature_extractor=freeze)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 800)), jnp.float32)
    lengths = jnp.array([800, 600], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), x, lengths)

    def loss_fn(params):
        out, _ = enc.apply({"params": params}, x, lengths)
        return jnp.sum(out**2)

    return variables["params"], jax.grad(loss_fn)(variables["params"])


def test_frozen_extractor_grads_zero_rest_unchanged():
    params, g_free = _grads(freeze=False)
    _, g_frozen = _grads(freeze=True)

    flat_free = jax.tree_util.tree_flatten_with_path(g_free)[0]
    flat_frozen = dict(jax.tree_util.tree_flatten_with_path(g_frozen)[0])
    saw_extractor = saw_other = False
    for path, g in flat_free:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        gf = flat_frozen[path]
        if keys[0] == "feature_extractor":
            saw_extractor = True
            assert np.all(np.asarray(gf) == 0.0), keys
            # the unfrozen run must actually have had gradient signal here
            assert np.any(np.asarray(g) != 0.0), keys
        else:
            saw_other = True
            np.testing.assert_allclose(np.asarray(gf), np.asarray(g), rtol=1e-6, atol=1e-6)
            assert np.any(np.asarray(gf) != 0.0), keys
    assert saw_extractor and saw_other


def test_frozen_forward_identical():
    enc_a = Wav2Vec2Encoder(config=CFG, mask_input=True, freeze_feature_extractor=False)
    enc_b = Wav2Vec2Encoder(config=CFG, mask_input=True, freeze_feature_extractor=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 800)), jnp.float32)
    lengths = jnp.array([800, 500], jnp.int32)
    variables = enc_a.init(jax.random.PRNGKey(0), x, lengths)
    out_a, len_a = enc_a.apply(variables, x, lengths)
    out_b, len_b = enc_b.apply(variables, x, lengths)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(len_a), np.asarray(len_b))


def test_stop_gradient_alone_is_not_enough_for_adamw():
    """stop_gradient zeroes the grads but AdamW *weight decay* still moves the
    params — the HF loader therefore pairs ``freeze_feature_extractor`` with
    ``frozen_paths`` (optimizer update masking).  Pin both halves."""
    from thunder_tpu.training.optim import adamw, freeze_subtrees_transform

    import optax

    params, grads = _grads(freeze=True)

    def leaves(tree):
        return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree["feature_extractor"])]

    # unmasked AdamW: weight decay alone changes the frozen leaves
    tx = adamw(1e-3)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    moved = optax.apply_updates(params, updates)
    assert any(
        not np.array_equal(a, b) for a, b in zip(leaves(params), leaves(moved))
    )

    # masked AdamW (the loader recipe): frozen leaves are bit-identical
    tx = freeze_subtrees_transform(adamw(1e-3), [("feature_extractor",)])
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    frozen = optax.apply_updates(params, updates)
    assert all(np.array_equal(a, b) for a, b in zip(leaves(params), leaves(frozen)))


def test_train_flops_frozen_smaller():
    from thunder_tpu.flops import (
        wav2vec2_extractor_flops,
        wav2vec2_forward_flops,
        wav2vec2_train_flops,
    )

    samples = 16000 * 15
    fwd = wav2vec2_forward_flops(samples, batch=8)
    ext = wav2vec2_extractor_flops(samples, batch=8)
    assert 0 < ext < fwd
    assert wav2vec2_train_flops(samples, batch=8) == 3 * fwd
    assert wav2vec2_train_flops(samples, batch=8, frozen_extractor=True) == 3 * fwd - 2 * ext
