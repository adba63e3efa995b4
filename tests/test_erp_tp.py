"""ERP+TP / TP-only / Cube-only encoder tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.nn.erp_tp import ERPTPEncoder, TPOnlyEncoder, CubeOnlyEncoder


def _x(b=1, h=64, w=128):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)


def test_erptp_encoder_shape():
    x = _x()
    mod = ERPTPEncoder(out_dim=32, layers=(1, 1, 1), nrows=3,
                       patch_size=32)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(v, x)
    assert out.shape == (1, 16, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_tp_only_encoder_shape():
    x = _x()
    mod = TPOnlyEncoder(out_dim=16, nrows=3, patch_size=32)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(v, x)
    assert out.shape == (1, 16, 32, 16)


def test_cube_only_encoder_shape():
    x = _x()
    mod = CubeOnlyEncoder(out_dim=16)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(v, x)
    assert out.shape == (1, 16, 32, 16)
