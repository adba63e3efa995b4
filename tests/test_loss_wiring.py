"""Previously-dead loss paths are wired and carry gradients (VERDICT r2
Weak #5 / Missing #4): polar-weighted render loss, self-hit-prob
consistency loss, and the shipped gen recipe's [render, depth] list.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panogrf_tpu.data import imgs_info, synthetic
from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
from panogrf_tpu.train import losses as L

H, W = 32, 64
DH, DW = 16, 32


def _batch(use_que_depth=False, rn=32):
    scene = synthetic.SphereScene.random(9)
    s = synthetic.make_three_view_sample(scene, H, W, m3d_dist=0.3, seed=1)
    rng = np.random.default_rng(3)
    coords = imgs_info.sample_train_coords(rng, H, W, rn)
    data = imgs_info.build_render_sample(s, coords,
                                         render_depth_range=(0.5, 15.0))
    d = s["depth_panos"][jnp.asarray(imgs_info.REF_IDS)]
    data["ref_imgs_info"]["mvs_depth"] = jax.image.resize(
        d, (2, DH, DW, 1), "bilinear")
    if use_que_depth:
        dq = s["depth_panos"][imgs_info.QUE_ID][None]
        data["que_imgs_info"]["mvs_depth"] = jax.image.resize(
            dq, (1, DH, DW, 1), "bilinear")
    data.pop("src_imgs_info", None)
    return data


def _grad_norm(tree):
    return float(sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(tree)))


@pytest.mark.slow
def test_polar_weighted_render_loss_has_grads():
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8,
                                 fine_depth_sample_num=8)
    data = _batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)

    def loss(p, weighted):
        out = model.apply(p, data)
        assert "polar_weights" in out
        terms = L.render_loss(out, data,
                              use_polar_weighted_loss=weighted)
        return L.total_loss(terms)

    lw, gw = jax.value_and_grad(lambda p: loss(p, True))(params)
    lu = loss(params, False)
    assert np.isfinite(float(lw))
    # the weighting changes the objective and gradients flow
    assert abs(float(lw) - float(lu)) > 1e-8
    assert _grad_norm(gw) > 0.0


@pytest.mark.slow
def test_self_hit_prob_consistency_loss_has_grads():
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8, fine_depth_sample_num=8,
                                 use_self_hit_prob=True)
    data = _batch(use_que_depth=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)

    def loss(p):
        out = model.apply(p, data)
        assert "hit_prob_self" in out
        terms = L.consistency_loss(out, data)
        assert "loss_prob" in terms
        return L.total_loss(terms)

    lv, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(lv)) and float(lv) != 0.0
    assert _grad_norm(g) > 0.0


def test_shipped_gen_recipe_enables_depth_loss():
    """The shipped renderer recipe trains with [render, depth] like the
    reference config (gen_hr_1.0/...uniform_512x1024.yaml:128)."""
    from panogrf_tpu.config import load_config
    cfg = load_config(
        "configs/gen/neuray_gen_cv_erp_mono_stereo_uniform_512x1024.yaml")
    assert list(cfg.train.loss) == ["render", "depth"]

    # and the depth loss itself emits gradients when true_depth is present
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8,
                                 fine_depth_sample_num=8)
    data = _batch()
    assert "true_depth" in data["ref_imgs_info"]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)

    def loss(p):
        out = model.apply(p, data)
        terms = L.depth_loss(out, data)
        assert "loss_depth" in terms
        return L.total_loss(terms)

    lv, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(lv))
    assert _grad_norm(g) > 0.0
