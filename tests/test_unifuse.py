"""UniFuse / Equi model tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from panogrf_tpu.models.unifuse import UniFuse, Equi, normalize_imagenet
from panogrf_tpu.core import cubemap


def _make_inputs(b=1, h=64, w=128):
    rng = np.random.default_rng(3)
    equi = jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)
    cube = jax.vmap(lambda e: cubemap.equi_to_cube(e, h // 2))(equi)
    return normalize_imagenet(equi), normalize_imagenet(cube)


def test_unifuse_forward_shapes():
    equi, cube = _make_inputs()
    model = UniFuse(max_depth=10.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), equi, cube)
    out = jax.jit(model.apply)(variables, equi, cube)
    assert out["pred_depth"].shape == (1, 64, 128, 1)
    assert out["mono_feat"].shape == (1, 32, 64, 32)
    d = np.asarray(out["pred_depth"])
    assert np.isfinite(d).all()
    assert (d >= 0).all() and (d <= 10.0).all()


def test_unifuse_uncertainty_head():
    equi, cube = _make_inputs()
    model = UniFuse(uncertainty=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), equi, cube)
    out = jax.jit(model.apply)(variables, equi, cube)
    assert out["pred"].shape == (1, 64, 128, 2)
    assert (np.asarray(out["pred"][..., 1]) > 0).all()  # sigma positive


def test_unifuse_disparity_mode():
    equi, cube = _make_inputs()
    model = UniFuse(out_type="disparity", min_depth=0.1, max_depth=10.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), equi, cube)
    out = jax.jit(model.apply)(variables, equi, cube)
    d = np.asarray(out["pred_depth"])
    assert (d >= 0.1 - 1e-4).all() and (d <= 10.0 + 1e-4).all()


def test_equi_feature_net():
    equi, _ = _make_inputs()
    model = Equi()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), equi)
    out = jax.jit(model.apply)(variables, equi)
    assert out.shape == (1, 16, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_equi_with_sin():
    equi, _ = _make_inputs()
    model = Equi(with_sin=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), equi)
    out = jax.jit(model.apply)(variables, equi)
    assert out.shape == (1, 16, 32, 32)


def test_unifuse_param_count_resnet18_scale():
    """Two ResNet18 encoders dominate: expect ~2x11.2M backbone params."""
    equi, cube = _make_inputs()
    model = UniFuse()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), equi, cube)
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert 20e6 < n < 40e6, n
