"""Per-block rematerialization (jax.checkpoint) must be gradient-transparent.

``remat=True`` trades one extra forward of compute for ~1/n_blocks the
activation HBM in training — outputs and gradients must be bit-comparable
to the standard path (same params, same dropout rng).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.models import QuartznetEncoder
from thunder_tpu.models.citrinet import CitrinetEncoder
from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder


def _grad_check(make_enc, x, lengths, rngs):
    enc = make_enc(False)
    enc_r = make_enc(True)
    params = enc.init({"params": jax.random.PRNGKey(0), **rngs}, x, lengths, True)
    mutable = ["batch_stats"] if "batch_stats" in params else []

    def loss(p, module):
        (out, _), _ = module.apply(p, x, lengths, True, rngs=rngs, mutable=mutable)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, enc)
    l1, g1 = jax.value_and_grad(loss)(params, enc_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0), jax.tree_util.tree_leaves_with_path(g1)
    ):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.fixture()
def audio():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64)) * 0.3, jnp.float32)  # (B, T, F)
    return x, jnp.array([64, 48], jnp.int32)


def test_quartznet_remat_transparent(audio):
    x, lengths = audio
    _grad_check(
        lambda r: QuartznetEncoder(
            repeat=1, filters=(128,), kernel_sizes=(11,), dropout=0.1, remat=r
        ),
        x,
        lengths,
        {"dropout": jax.random.PRNGKey(7)},
    )


def test_citrinet_remat_transparent(audio):
    x, lengths = audio
    _grad_check(
        lambda r: CitrinetEncoder(
            filters=(128,), kernel_sizes=(11,), strides=(1,), repeat=1, dropout=0.1, remat=r
        ),
        x,
        lengths,
        {"dropout": jax.random.PRNGKey(7)},
    )


def test_wav2vec2_remat_transparent():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8000)) * 0.1, jnp.float32)
    lengths = jnp.array([8000, 6000], jnp.int32)
    cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2, intermediate_size=128,
        conv_dim=(32,) * 7,
    )
    _grad_check(
        lambda r: Wav2Vec2Encoder(cfg, remat=r),
        x,
        lengths,
        {"dropout": jax.random.PRNGKey(7)},
    )
