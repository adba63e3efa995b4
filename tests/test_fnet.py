"""FNET single-UNet MVS variant (reference ``omni_mvsnet/fnet.py:60-278``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panogrf_tpu.data.synthetic import SphereScene, make_three_view_sample
from panogrf_tpu.models.fnet import FNetDepthModel


@pytest.fixture(scope="module")
def fnet_setup():
    H, W = 32, 64
    s = make_three_view_sample(SphereScene.random(3), H, W, 0.5, seed=0)
    panos = jnp.asarray(s["rgb_panos"][:2][None], jnp.float32)
    rots = jnp.asarray(s["rots"][:2][None], jnp.float32)
    trans = jnp.asarray(s["trans"][:2][None], jnp.float32)
    model = FNetDepthModel(num_depths=16, layers=3, min_depth=0.5,
                           max_depth=10.0, cost_volume_channels=8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), panos, rots, trans)
    return model, params, panos, rots, trans


def test_fnet_forward_shapes(fnet_setup):
    model, params, panos, rots, trans = fnet_setup
    out = model.apply(params, panos, rots, trans)
    b, v, h, w, _ = panos.shape
    assert out["depth"].shape == (b, h, w, 1)
    assert out["prob"].shape == (b, 16, h, w)
    # expectation over the inverse-uniform hypotheses stays inside
    # [min_depth, max_depth] (reference fnet.py:262-273)
    d = np.asarray(out["depth"])
    assert np.all(np.isfinite(d))
    assert d.min() >= model.min_depth - 1e-4
    assert d.max() <= model.max_depth + 1e-4
    # probabilities sum to one over the hypothesis axis
    ps = np.asarray(jnp.sum(out["prob"], axis=1))
    assert np.allclose(ps, 1.0, atol=1e-4)


def test_fnet_gradients_flow(fnet_setup):
    model, params, panos, rots, trans = fnet_setup
    gt = jnp.full(panos.shape[2:4], 2.0)[None, ..., None]

    def loss(p):
        out = model.apply(p, panos, rots, trans)
        return jnp.mean(jnp.abs(out["depth"] - gt))

    g = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.8
