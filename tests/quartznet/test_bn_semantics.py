"""BatchNorm running-stat semantics must match torch (eps=1e-3, momentum=0.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from thunder_tpu.models.layers import BN_EPS, TorchBatchNorm


def test_bn_train_step_updates_stats_like_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 20, 8)).astype(np.float32) * 2 + 1

    bn = TorchBatchNorm(epsilon=BN_EPS)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x.reshape(-1, 8)), use_running_average=False)
    out, updated = bn.apply(
        variables, jnp.asarray(x.reshape(-1, 8)), use_running_average=False, mutable=["batch_stats"]
    )

    tbn = torch.nn.BatchNorm1d(8, eps=BN_EPS, momentum=0.1)
    tbn.train()
    xt = torch.tensor(x.reshape(-1, 8).T[None])  # (1, C, N) -> same stats
    with torch.no_grad():
        t_out = tbn(torch.tensor(x.reshape(-1, 8)))

    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]), tbn.running_var.numpy(), rtol=1e-3
    )


def test_bn_eval_uses_running_stats_like_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 8)).astype(np.float32)
    mean = rng.standard_normal(8).astype(np.float32)
    var = rng.uniform(0.5, 2, 8).astype(np.float32)
    gamma = rng.standard_normal(8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)

    bn = TorchBatchNorm(epsilon=BN_EPS)
    variables = {
        "params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    out = bn.apply(variables, jnp.asarray(x))

    want = torch.nn.functional.batch_norm(
        torch.tensor(x), torch.tensor(mean), torch.tensor(var),
        torch.tensor(gamma), torch.tensor(beta), training=False, eps=BN_EPS,
    )
    np.testing.assert_allclose(np.asarray(out), want.numpy(), atol=1e-5)
