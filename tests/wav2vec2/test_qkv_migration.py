"""Restoring pre-fusion wav2vec2 checkpoints (separate q/k/v projections).

Round 2 fused the attention projections into one ``qkv_proj`` Dense
(models/wav2vec2.py); checkpoints saved before that hold three separate
subtrees.  These tests save such an old-layout checkpoint and assert both
restore paths (module variables and templated TrainState) migrate it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from thunder_tpu.training.checkpointing import (
    migrate_fused_qkv,
    restore_checkpoint,
    restore_module_variables,
    save_checkpoint,
)

CFG = Wav2Vec2Config(
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=2,
    intermediate_size=64,
    conv_dim=(16,) * 7,
)


def _unfuse(tree):
    """Inverse of the fused layout: split qkv_proj back into q/k/v (old saves)."""
    if not isinstance(tree, dict):
        return tree
    out = {k: _unfuse(v) for k, v in tree.items()}
    if "qkv_proj" in out:
        fused = out.pop("qkv_proj")
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            out[name] = {
                leaf: np.asarray(arr)[..., i * (np.asarray(arr).shape[-1] // 3) : (i + 1) * (np.asarray(arr).shape[-1] // 3)]
                for leaf, arr in fused.items()
            }
    return out


@pytest.fixture()
def fused_params():
    audio = jnp.zeros((1, 4000), jnp.float32)
    lengths = jnp.array([4000], jnp.int32)
    return Wav2Vec2Encoder(CFG).init(jax.random.PRNGKey(0), audio, lengths)["params"]


def test_migrate_fused_qkv_roundtrip(fused_params):
    old = _unfuse(jax.tree.map(np.asarray, fused_params))
    migrated, changed = migrate_fused_qkv(old)
    assert changed
    flat_new = jax.tree_util.tree_leaves_with_path(fused_params)
    flat_mig = dict(jax.tree_util.tree_leaves_with_path(migrated))
    for path, leaf in flat_new:
        np.testing.assert_array_equal(np.asarray(leaf), flat_mig[path])
    # already-fused trees pass through untouched
    same, changed2 = migrate_fused_qkv(jax.tree.map(np.asarray, fused_params))
    assert not changed2


def test_restore_old_layout_train_state(tmp_path, fused_params):
    import orbax.checkpoint as ocp

    from thunder_tpu.training.trainer import TrainState

    tx = optax.adam(1e-3)
    state = TrainState.create(apply_fn=lambda *a: None, params=fused_params, tx=tx, batch_stats=None)
    # simulate a pre-fusion checkpoint: un-fuse params AND the Adam moments
    payload = {
        "params": _unfuse(jax.tree.map(np.asarray, state.params)),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "step": np.asarray(state.step),
    }
    payload["opt_state"] = jax.tree_util.tree_map(
        lambda x: x, payload["opt_state"]
    )  # concretize
    # un-fuse the moment trees the same way old checkpoints stored them
    new_opt = []
    for entry in payload["opt_state"]:
        if hasattr(entry, "_fields") and hasattr(entry, "mu"):
            entry = entry._replace(mu=_unfuse(entry.mu), nu=_unfuse(entry.nu))
        new_opt.append(entry)
    payload["opt_state"] = tuple(new_opt)
    path = tmp_path / "old_ckpt"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)

    restored = restore_checkpoint(str(path), state)
    for path_k, leaf in jax.tree_util.tree_leaves_with_path(restored["params"]):
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(dict(jax.tree_util.tree_leaves_with_path(state.params))[path_k])
        )
    # optimizer moments migrated to the fused structure too
    mu = restored["opt_state"][0].mu if hasattr(restored["opt_state"][0], "mu") else None
    if mu is not None:
        assert jax.tree_util.tree_structure(mu) == jax.tree_util.tree_structure(state.opt_state[0].mu)


def test_restore_new_layout_unchanged(tmp_path, fused_params):
    from thunder_tpu.training.trainer import TrainState

    tx = optax.adam(1e-3)
    state = TrainState.create(apply_fn=lambda *a: None, params=fused_params, tx=tx, batch_stats=None)
    path = save_checkpoint(str(tmp_path), state, step=0)
    restored = restore_checkpoint(path, state)
    chex_leaves = jax.tree_util.tree_leaves(restored["params"])
    assert len(chex_leaves) == len(jax.tree_util.tree_leaves(state.params))
