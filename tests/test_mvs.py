"""Tests for depth hypotheses, spherical sweep cost volume, MVS model."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from panogrf_tpu.core import sphere
from panogrf_tpu.models import mvs
from panogrf_tpu.ops import cost_volume as cv


def test_magnet_k_list_golden():
    """Matches the reference numpy recipe (pipeline3_model.py:537-545)."""
    k = mvs.magnet_k_list(5, 3.0)
    assert k.shape == (5,)
    # symmetric, increasing, centered at 0
    np.testing.assert_allclose(k, -k[::-1], atol=1e-5)
    assert np.all(np.diff(k) > 0)
    # golden: midpoints of norm.ppf at bin edges of erf(3/sqrt(2)) mass
    np.testing.assert_allclose(
        k, [-1.91936, -0.54569, 0.0, 0.54569, 1.91936], atol=2e-3)


def test_build_depth_hypotheses_sorted_and_clamped():
    mu = jnp.full((1, 4, 8, 1), 5.0)
    dv = mvs.build_depth_hypotheses(mu, mvs.magnet_k_list(5, 3.0), 16,
                                    0.1, 10.0, sigma=0.5)
    d = np.asarray(dv)
    assert d.shape == (1, 16, 4, 8)
    assert np.all(np.diff(d, axis=1) >= 0)      # sorted
    assert d.min() >= 0.1 and d.max() <= 10.0


def test_sweep_identity_pose_zero_cost():
    """Identical views with identity poses: warped == ref -> cost 0."""
    H, W, C = 16, 32, 4
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(H, W, C)), jnp.float32)
    dvol = jnp.full((3, H, W), 2.0)
    eye, zero = jnp.eye(3), jnp.zeros(3)
    cost = jax.jit(lambda f, d: cv.spherical_sweep_cost(
        f, f, d, eye, zero, eye, zero, sphere.M3D))(feats, dvol)
    assert cost.shape == (3, H, W, C)
    # Projection back into the same view hits the same pixel centers.
    assert float(jnp.abs(cost).max()) < 1e-3


def test_sweep_translation_shifts_correct_depth():
    """A textured scene at depth d0: cost at hypothesis d0 is minimal.

    Build src view by warping the ref view analytically with a small
    translation; the sweep at the true depth must align best.
    """
    H, W = 32, 64
    conv = sphere.M3D
    rng = np.random.default_rng(1)
    # Smooth random texture on the sphere (low-frequency so bilinear
    # resampling error is small).
    base = rng.normal(size=(8, 16, 3)).astype(np.float32)
    ref = jax.image.resize(jnp.asarray(base), (H, W, 3), "bilinear")

    d0 = 3.0
    t = jnp.asarray([0.0, 0.0, 0.4])  # src cam at +z (w2c trans = -t? see below)
    # World = ref cam frame. src: x_src = R x_w + t_src with R=I.
    # A world point p maps to src coords p + t_src.
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    # Render src image: for each src pixel dir d_s, world point at depth along
    # ray from src origin -t_src ... simpler: sample ref at projection of
    # world points seen from src. Build src by inverse warp of ref:
    dirs_src = conv.ray_directions(H, W, mode="center")
    # src cam center in world = -t_src; point on sphere of radius d0 around
    # world origin seen along src ray: solve |o + s*d| = d0.
    o = -t
    b = jnp.sum(dirs_src * o, axis=-1)
    c = jnp.sum(o * o) - d0 * d0
    s = -b + jnp.sqrt(b * b - c)
    pts_w = o + s[..., None] * dirs_src
    xy_ref, _ = conv.project_to_pixels(pts_w, H, W, mode="center")
    from panogrf_tpu.ops.resample import bilinear_sample
    src = bilinear_sample(ref, xy_ref)

    hyps = jnp.asarray([1.5, 2.0, 2.5, 3.0, 4.0, 6.0])
    dvol = jnp.broadcast_to(hyps[:, None, None], (6, H, W))
    cost = jax.jit(lambda r, s_, d: cv.spherical_sweep_cost(
        r, s_, d, eye, zero, eye, t, sphere.M3D))(ref, src, dvol)
    # mean cost per hypothesis, ignore poles
    m = np.asarray(jnp.mean(jnp.abs(cost[:, 4:-4]), axis=(1, 2, 3)))
    assert m.argmin() == 3, m  # d0 = 3.0 wins


def test_mvs_model_forward():
    B, H, W = 1, 32, 64
    rng = np.random.default_rng(2)
    panos = jnp.asarray(rng.uniform(size=(B, 2, H, W, 3)), jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3), (B, 2, 3, 3))
    trans = jnp.zeros((B, 2, 3)).at[:, 0, 2].set(0.3)
    mono_depth = jnp.full((B, H, W, 1), 3.0)
    mono_feat = jnp.asarray(rng.normal(size=(B, H // 2, W // 2, 32)),
                            jnp.float32)

    model = mvs.MVSDepthModel(num_hypotheses=16, magnet_num_samples=3,
                              cnn3d_base=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), panos, rots, trans,
                                    mono_depth, mono_feat)
    out = jax.jit(model.apply)(variables, panos, rots, trans, mono_depth,
                               mono_feat)
    assert out["depth"].shape == (B, H, W, 1)
    assert out["rectified_depth_d1"].shape == (B, H, W, 1)
    assert out["cost_reg"].shape == (B, 16, H // 4, W // 4)
    assert np.isfinite(np.asarray(out["depth"])).all()
    assert (np.asarray(out["depth"]) >= 0).all()


def test_mvs_model_multiview_and_uncertainty():
    B, H, W, V = 1, 32, 64, 3
    rng = np.random.default_rng(4)
    panos = jnp.asarray(rng.uniform(size=(B, V, H, W, 3)), jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3), (B, V, 3, 3))
    trans = jnp.zeros((B, V, 3)).at[:, 0, 2].set(0.3).at[:, 2, 2].set(-0.3)
    mono_depth = jnp.full((B, H, W, 1), 3.0)
    mono_feat = jnp.asarray(rng.normal(size=(B, H // 2, W // 2, 32)),
                            jnp.float32)
    model = mvs.MVSDepthModel(num_hypotheses=16, magnet_num_samples=3,
                              cnn3d_base=8, mvs_uncertainty=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), panos, rots, trans,
                                    mono_depth, mono_feat)
    out = jax.jit(model.apply)(variables, panos, rots, trans, mono_depth,
                               mono_feat)
    assert out["pred_final"].shape == (B, H, W, 2)
    assert (np.asarray(out["pred_final"][..., 1]) > 0).all()


def test_full_pipeline_new_reg3dnet():
    """use_new_reg3dnet swaps in the MVSNet CostRegNet regularizer."""
    rng = np.random.default_rng(0)
    b, v, h, w = 1, 2, 32, 64
    model = mvs.MVSDepthModel(num_hypotheses=8, magnet_num_samples=0,
                         min_depth=0.5, max_depth=10.0,
                         use_new_reg3dnet=True, wo_mono_feat=True)
    panos = jnp.asarray(rng.uniform(size=(b, v, h, w, 3)), jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3), (b, v, 3, 3))
    trans = jnp.zeros((b, v, 3)).at[:, 0, 2].set(0.5)
    mono = jnp.asarray(rng.uniform(1, 5, size=(b, h, w, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), panos, rots, trans, mono)
    assert "reg3dnet" in variables["params"]
    out = model.apply(variables, panos, rots, trans, mono)
    assert out["depth"].shape == (b, h, w, 1)
    assert np.isfinite(np.asarray(out["depth"])).all()
