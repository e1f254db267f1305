import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.models import QuartznetEncoder
from thunder_tpu.models.layers import InitMode, weight_init


@pytest.mark.parametrize(
    "mode", [InitMode.xavier_uniform, InitMode.xavier_normal, InitMode.kaiming_uniform, InitMode.kaiming_normal]
)
def test_init_modes_produce_sane_scales(mode):
    init = weight_init(mode)
    k = init(jax.random.PRNGKey(0), (33, 1, 256), jnp.float32)
    assert np.isfinite(np.asarray(k)).all()
    assert 0 < float(jnp.abs(k).mean()) < 1.0


def test_unknown_init_mode_raises():
    with pytest.raises(ValueError, match="Unknown Initialization mode"):
        weight_init("nope")


def test_encoder_accepts_init_mode():
    enc = QuartznetEncoder(repeat=1, filters=(32,), kernel_sizes=(33,), init_mode=InitMode.kaiming_normal)
    x = jnp.zeros((1, 50, 64))
    variables = enc.init(jax.random.PRNGKey(0), x, jnp.array([50]))
    out, _ = enc.apply(variables, x, jnp.array([50]))
    assert np.isfinite(np.asarray(out)).all()
