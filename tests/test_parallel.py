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


def test_padded_batch_loss_matches_unpadded(module):
    """VERDICT item: SPMD batch padding is loss-exact — a partial batch
    (n % data-axis != 0) padded with zero-weight repeated rows produces the
    SAME loss and gradients as the unpadded batch on one device."""
    from thunder_tpu.training.trainer import _pad_batch_for_mesh

    n = 5  # 5 % 8 devices != 0 -> pads to 8 with 3 zero-weight rows
    batch = tuple(np.asarray(b)[:n] for b in _batch(module))
    import optax

    tx = optax.sgd(learning_rate=1e-3)
    step_fn = make_train_step(module.model, module.blank_idx)
    rng = jax.random.PRNGKey(7)

    def fresh_state(variables):
        return TrainState.create(
            apply_fn=module.model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats"),
        )

    # unsharded, unpadded ground truth
    state = fresh_state(jax.tree_util.tree_map(jnp.array, module.variables))
    state, loss_ref = step_fn(state, *batch, rng)
    params_ref = jax.tree_util.tree_map(np.asarray, state.params)

    mesh = make_mesh(model_parallel=1)
    padded, weights = _pad_batch_for_mesh(batch, mesh)
    assert padded[0].shape[0] == 8 and weights.sum() == n
    shard = batch_sharding(mesh)
    padded = tuple(jax.device_put(np.asarray(b), shard) for b in padded)
    weights = jax.device_put(weights, shard)
    variables = shard_variables(jax.tree_util.tree_map(jnp.array, module.variables), mesh)
    state = fresh_state(variables)
    state, loss_pad = step_fn(state, *padded, rng, sample_weights=weights)
    params_pad = jax.tree_util.tree_map(np.asarray, state.params)

    assert float(loss_pad) == pytest.approx(float(loss_ref), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_ref), jax.tree_util.tree_leaves(params_pad)
    ):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # already-divisible batches keep all-ones weights (no behavior change)
    full = _batch(module)
    same, w = _pad_batch_for_mesh(full, mesh)
    assert same[0].shape[0] == 8 and w.sum() == 8


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


def test_engine_data_parallel_device_beam(module):
    """Device beam under the mesh: shard_map decodes each device's rows —
    same transcripts as the single-device device-beam path (including the
    mesh-padding rows being dropped)."""
    import jax.numpy as jnp

    from thunder_tpu.engine import InferenceEngine

    single = InferenceEngine(module, compute_dtype=jnp.float32)
    mesh = make_mesh(model_parallel=1)
    sharded = InferenceEngine(module, compute_dtype=jnp.float32, mesh=mesh)
    audio, lengths, _, _ = _batch(module, batch=8)
    want = single.predict(audio, lengths, beam_width=6, beam_backend="device")
    assert sharded.predict(audio, lengths, beam_width=6, beam_backend="device") == want
    # padded (non-divisible) batch
    assert (
        sharded.predict(audio[:3], lengths[:3], beam_width=6, beam_backend="device")
        == want[:3]
    )


def test_two_process_distributed_train_step(tmp_path):
    """SURVEY §5.8: a real ``jax.distributed`` run — two OS processes, 2 CPU
    devices each, one 4-device DP mesh — must produce the same loss and
    updated params as the single-process step on the same inputs."""
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    import optax

    from tests.distributed_worker import make_batch, make_tiny_module

    # in-process single-device reference (identical model seed and batch)
    module = make_tiny_module()
    batch = make_batch(module)
    state = TrainState.create(
        apply_fn=module.model.apply,
        params=jax.tree_util.tree_map(jnp.array, module.variables["params"]),
        tx=optax.sgd(learning_rate=1e-3),
        batch_stats=jax.tree_util.tree_map(jnp.array, module.variables.get("batch_stats")),
    )
    step_fn = make_train_step(module.model, module.blank_idx)
    state, ref_loss = step_fn(state, *batch, jax.random.PRNGKey(42))
    ref_params = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = Path(__file__).parent / "distributed_worker.py"
    repo_root = str(Path(__file__).parent.parent)
    pythonpath = os.pathsep.join(filter(None, [repo_root, os.environ.get("PYTHONPATH")]))
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        # the worker runs with tests/ as its script dir; the package is not
        # pip-installed, so the repo root must be on the import path
        PYTHONPATH=pythonpath,
    )
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    results = [np.load(tmp_path / f"rank{r}.npz") for r in range(2)]
    for res in results:
        loss = float(res["loss"])
        assert np.isfinite(loss)
        assert loss == pytest.approx(float(ref_loss), rel=1e-5)
        for key, want in ref_params.items():
            # DP all-reduce changes f32 summation order vs the single-device
            # reduction; SGD keeps that drift linear in the grads
            np.testing.assert_allclose(res[key], want, atol=1e-5, err_msg=key)
    # both ranks hold identical (replicated) updated params
    for key in ref_params:
        np.testing.assert_array_equal(results[0][key], results[1][key])


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


def test_wav2vec2_sharded_inference_matches():
    # the transformer family under the same channel-TP rule: the fused
    # (h, 3h) qkv_proj shards its output dim over the model axis and GSPMD
    # inserts the collectives; DP4 x TP2 must be numerically transparent
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    cfg = Wav2Vec2Config(
        hidden_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=512,
        conv_dim=(64,) * 7,
    )
    enc = Wav2Vec2Encoder(cfg, mask_input=True)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((8, 8000)) * 0.1, jnp.float32)
    lengths = jnp.asarray(np.full((8,), 8000, np.int32))
    params = enc.init(jax.random.PRNGKey(0), audio, lengths)

    ref, ref_len = jax.jit(lambda p, a, l: enc.apply(p, a, l))(params, audio, lengths)

    mesh = make_mesh(model_parallel=2)
    sharded_params = shard_variables(params, mesh, min_channels=256)
    qkv_sh = sharded_params["params"]["layer0"]["attention"]["qkv_proj"]["kernel"].sharding
    assert qkv_sh.spec == P(None, "model")  # the fused projection really TPs
    a_sh = jax.device_put(audio, batch_sharding(mesh))
    l_sh = jax.device_put(lengths, batch_sharding(mesh))
    got, got_len = jax.jit(lambda p, a, l: enc.apply(p, a, l))(sharded_params, a_sh, l_sh)

    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(got_len))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)
