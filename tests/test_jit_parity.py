"""jit-vs-eager and vmap/mask invariance — the TPU analogue of the
reference's ubiquitous torchscript-parity tests (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.models.layers import EncoderBlock
from thunder_tpu.module import CTCModel


def test_model_jit_matches_eager():
    model = CTCModel(
        audio_transform=FilterbankFeatures(use_fused_kernel=False),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=8),
    )
    audio = jnp.asarray((np.random.default_rng(0).standard_normal((2, 8000)) * 0.2).astype(np.float32))
    lengths = jnp.array([8000, 5000])
    variables = model.init({"params": jax.random.PRNGKey(0)}, audio, lengths)

    with jax.disable_jit():
        eager_logits, eager_lens = model.apply(variables, audio, lengths)
    jit_logits, jit_lens = jax.jit(lambda v, a, l: model.apply(v, a, l))(variables, audio, lengths)

    np.testing.assert_array_equal(np.asarray(eager_lens), np.asarray(jit_lens))
    np.testing.assert_allclose(np.asarray(eager_logits), np.asarray(jit_logits), atol=1e-5)


def test_block_vmap_matches_batched():
    """vmapping over single samples == the batched apply (mask invariance)."""
    block = EncoderBlock(features=16, repeat=2, kernel_size=7, separable=True, residual=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 30, 8)).astype(np.float32))
    lengths = jnp.array([30, 30, 30])
    variables = block.init(jax.random.PRNGKey(0), x, lengths)

    batched, batched_lens = block.apply(variables, x, lengths)

    def single(xi, li):
        out, ol = block.apply(variables, xi[None], li[None])
        return out[0], ol[0]

    vmapped, vmapped_lens = jax.vmap(single)(x, lengths)
    np.testing.assert_array_equal(np.asarray(batched_lens), np.asarray(vmapped_lens))
    np.testing.assert_allclose(np.asarray(batched), np.asarray(vmapped), atol=1e-5)
