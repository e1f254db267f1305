"""Mesh/sharding: DP and TP must be numerically transparent.

Runs on the 8 virtual CPU devices from conftest — the same code path the
driver's dryrun_multichip exercises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from thunder_tpu.audio import FilterbankFeatures
from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
from thunder_tpu.module import CTCModule
from thunder_tpu.parallel import batch_sharding, make_mesh, param_shardings, shard_variables
from thunder_tpu.text import BatchTextTransformer
from thunder_tpu.training.optim import adamw
from thunder_tpu.training.trainer import TrainState, make_train_step


@pytest.fixture(scope="module")
def module():
    tt = BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '"))
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(dither=0.0),
        encoder=QuartznetEncoder(repeat=1, filters=(256,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=2000,
    )


def _batch(module, batch=8):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((batch, 4000)) * 0.3).astype(np.float32)
    audio_lengths = np.full((batch,), 4000, dtype=np.int32)
    targets, target_lengths = module.text_transform.encode(["hello world"] * batch, pad_to=16)
    return audio, audio_lengths, targets, target_lengths


def test_mesh_shapes():
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(model_parallel=3)


def test_param_sharding_rules():
    mesh = make_mesh(model_parallel=2)
    params = {
        "big": np.zeros((3, 128, 512)),  # out dim shardable
        "small": np.zeros((3, 8, 16)),  # too small -> replicated
        "scalar": np.zeros(()),
    }
    sh = param_shardings(params, mesh)
    assert sh["big"].spec == P(None, None, "model")
    assert sh["small"].spec == P()
    assert sh["scalar"].spec == P()


@pytest.mark.parametrize("model_parallel", [1, 2], ids=["dp8", "dp4xtp2"])
def test_sharded_train_step_matches_single_device(module, model_parallel):
    """One sharded train step == the unsharded step (same grads, same loss)."""
    batch = _batch(module)
    # SGD: updates are linear in gradients, so cross-device reduction noise
    # stays tiny (adam's rsqrt amplifies it wildly near zero-grad params)
    import optax

    tx = optax.sgd(learning_rate=1e-3)
    step_fn = make_train_step(module.model, module.blank_idx)
    rng = jax.random.PRNGKey(42)

    def run(mesh):
        variables = jax.tree_util.tree_map(jnp.array, module.variables)
        if mesh is not None:
            variables = shard_variables(variables, mesh)
        state = TrainState.create(
            apply_fn=module.model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats"),
        )
        b = batch
        if mesh is not None:
            shard = batch_sharding(mesh)
            b = tuple(jax.device_put(np.asarray(x), shard) for x in batch)
        state, loss = step_fn(state, *b, rng)
        return float(loss), jax.tree_util.tree_map(np.asarray, state.params)

    loss_single, params_single = run(None)
    mesh = make_mesh(model_parallel=model_parallel)
    loss_sharded, params_sharded = run(mesh)

    assert loss_sharded == pytest.approx(loss_single, rel=1e-4)
    flat_a = jax.tree_util.tree_leaves(params_single)
    flat_b = jax.tree_util.tree_leaves(params_sharded)
    for a, b in zip(flat_a, flat_b):
        # drift allowed: TP splits contractions, changing f32 reduction order;
        # the CTC backward amplifies that (forward transparency is asserted
        # tightly in test_sharded_inference_matches)
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_engine_data_parallel_inference(module):
    """InferenceEngine over a mesh: DP-sharded predict == single-device."""
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine

    single = InferenceEngine(module, compute_dtype=jnp.float32)
    mesh = make_mesh(model_parallel=1)
    sharded = InferenceEngine(module, compute_dtype=jnp.float32, mesh=mesh)
    audio, lengths, _, _ = _batch(module, batch=8)
    assert sharded.predict(audio, lengths) == single.predict(audio, lengths)
    # batch not divisible by the data axis: engine pads internally
    assert sharded.predict(audio[:3], lengths[:3]) == single.predict(audio[:3], lengths[:3])


def test_sharded_inference_matches(module):
    mesh = make_mesh(model_parallel=2)
    variables = shard_variables(jax.tree_util.tree_map(jnp.array, module.variables), mesh)
    audio, lengths, _, _ = _batch(module)

    logits_single, lens_single = module.forward(audio, lengths)

    @jax.jit
    def fwd(variables, a, l):
        return module.model.apply(variables, a, l, train=False)

    shard = batch_sharding(mesh)
    logits_sharded, lens_sharded = fwd(
        variables, jax.device_put(audio, shard), jax.device_put(lengths, shard)
    )
    np.testing.assert_array_equal(np.asarray(lens_single), np.asarray(lens_sharded))
    np.testing.assert_allclose(np.asarray(logits_single), np.asarray(logits_sharded), atol=2e-4)
