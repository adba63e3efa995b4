"""Stage-2 features: 3-sigma sampling, DINER sampler, SH solver, normals,
ft renderer."""

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.core import sphere
from panogrf_tpu.renderer import sample_utils as su
from panogrf_tpu.renderer import diner, sph_solver
from panogrf_tpu.renderer.ft_renderer import (NeuralRayFtRenderer,
                                              init_ft_params_from_gen)
from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer

H, W = 32, 64
DH, DW = 16, 32


def test_sample_3sigma_concentration():
    low = jnp.full((64,), 2.0)
    high = jnp.full((64,), 4.0)  # mu=3, sigma=1/3
    s = su.sample_3sigma(low, high, 16, 0.5, 15.0)
    arr = np.asarray(s)
    assert arr.shape == (64, 16)
    assert (arr >= 2.0 - 1e-4).all() and (arr <= 4.0 + 1e-4).all()
    # deterministic sampling spans the CDF; median near mu
    med = np.median(arr, axis=-1)
    np.testing.assert_allclose(med, 3.0, atol=0.25)


def test_sample_pdf_peak():
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (4, 9))
    weights = jnp.zeros((4, 8)).at[:, 4].set(1.0)
    s = np.asarray(su.sample_pdf(bins, weights, 32))
    inside = ((s >= 0.5) & (s <= 0.625)).mean()
    assert inside > 0.9


def test_precompute_depth_sampling():
    d = jnp.ones((2, 8))
    std = jnp.full((2, 8), 0.1)
    out = np.asarray(su.precompute_depth_sampling(d, std))
    np.testing.assert_allclose(out[..., 1], 0.7, atol=1e-6)
    np.testing.assert_allclose(out[..., 2], 1.3, atol=1e-6)


def test_diner_fill_uniform():
    z = jnp.asarray([[0.0, 0.0, 3.0, 2.0]])
    out = np.asarray(diner.fill_uniform(z, 1.0, 9.0))
    assert out.shape == (1, 4)
    assert np.all(np.diff(out) >= 0)
    assert set(np.round(out[0], 1)) >= {2.0, 3.0}


def test_diner_sampler_selects_surface():
    """Candidates near the (consistent) MVS depth must be shortlisted."""
    qn, rn, cn = 1, 8, 64
    near, far = 0.5, 10.0
    que_depth = jnp.broadcast_to(jnp.linspace(near, far, cn), (qn, rn, cn))
    true_d = 4.0
    # two ref views agreeing: mu == projected depth when candidate == true_d
    prj = {
        "mu": jnp.full((2, qn, rn, cn), true_d),
        "uncert": jnp.full((2, qn, rn, cn), 0.04),
        "depth": jnp.broadcast_to(que_depth[None], (2, qn, rn, cn)),
    }
    out = diner.sample_depthguided(que_depth, prj, n_samples=16,
                                   n_gaussian=4, near=near, far=far,
                                   depth_diff_max=0.2)
    arr = np.asarray(out)
    assert arr.shape == (qn, rn, 16)
    # A healthy share of samples concentrates near the surface.
    frac_near = (np.abs(arr - true_d) < 0.5).mean()
    assert frac_near > 0.3, frac_near


def test_sh_solver_roundtrip():
    solver = sph_solver.SphericalHarmonicsSolver(degree=2)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(2, 200, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    theta_true = rng.normal(size=(2, 9, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    colors = solver.predict(dirs, jnp.asarray(theta_true))
    theta = solver.fit(dirs, colors, jnp.ones((2, 200)))
    pred = solver.predict(dirs, theta)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(colors),
                               atol=0.05)


def test_depth2normal_sphere_room():
    """Normals of an inward-facing sphere point towards the camera."""
    conv = sphere.M3D
    d = jnp.full((1, H, W, 1), 5.0)  # camera at center of sphere room
    n = np.asarray(sph_solver.depth2normal(d, conv))
    rays = np.asarray(conv.ray_directions(H, W))
    # normal should be (anti)parallel to the ray direction
    cos = np.abs((n[0] * rays).sum(-1))[4:-4]
    assert cos.mean() > 0.98


def _tiny_data(rn=16):
    rng = np.random.default_rng(5)
    w2c = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
        (2, 3, 4)).at[1, 2, 3].set(0.5)
    return {
        "ref_imgs_info": {
            "imgs": jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32),
            "mvs_depth": jnp.asarray(rng.uniform(1, 5, size=(2, DH, DW, 1)),
                                     jnp.float32),
            "depth_range": jnp.asarray([[0.5, 15.0]] * 2),
            "w2c": w2c,
        },
        "que_imgs_info": {
            "coords": jnp.stack(
                [jnp.asarray(rng.integers(0, W, (1, rn)), jnp.float32),
                 jnp.asarray(rng.integers(0, H, (1, rn)), jnp.float32)], -1),
            "c2w": jnp.concatenate(
                [jnp.eye(3), jnp.asarray([[0.1], [0.0], [0.2]])], 1),
            "depth_range": jnp.asarray([[0.5, 15.0]]),
            "imgs": jnp.asarray(rng.uniform(size=(1, H, W, 3)), jnp.float32),
        },
    }


def test_ft_renderer_init_from_gen_and_forward():
    data = _tiny_data()
    gen = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                               depth_sample_num=8, fine_depth_sample_num=8)
    gen_params = jax.jit(gen.init)(jax.random.PRNGKey(0), data)

    ft = NeuralRayFtRenderer(rfn=2, ray_feats_hw=(DH // 4, DW // 4),
                             height=H, width=W, depth_sample_num=8,
                             fine_depth_sample_num=8)
    ft_params, ft_cache = init_ft_params_from_gen(
        ft, gen, gen_params, data["ref_imgs_info"],
        jax.random.PRNGKey(1), data)
    assert ft_cache["mvs_depth"].shape == data["ref_imgs_info"][
        "mvs_depth"].shape
    # depth-guided prior from the cache (renderer.py:1080-1096)
    from panogrf_tpu.renderer.ft_renderer import ft_depth_range_at_coords
    fdr = ft_depth_range_at_coords(ft_cache, 0,
                                   data["que_imgs_info"]["coords"], H, W)
    assert fdr.shape == (*data["que_imgs_info"]["coords"].shape[:2], 3)
    assert np.isfinite(np.asarray(fdr)).all()
    # mu-3s <= mu <= mu+3s
    f = np.asarray(fdr)
    assert (f[..., 1] <= f[..., 0] + 1e-6).all()
    assert (f[..., 0] <= f[..., 2] + 1e-6).all()
    # transplanted weights match
    a = jax.tree.leaves(ft_params["params"]["agg_net"])[0]
    b = jax.tree.leaves(gen_params["params"]["agg_net"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert ft_params["params"]["ray_feats"].shape == (2, DH // 4, DW // 4, 32)

    out = jax.jit(ft.apply)(ft_params, data)
    assert out["pixel_colors_nr_fine"].shape == (1, 16, 3)
    assert np.isfinite(np.asarray(out["pixel_colors_nr_fine"])).all()

    # ray_feats receive gradients (the whole point of ft stage)
    def loss(p):
        o = ft.apply(p, data, rng=jax.random.PRNGKey(2))
        return jnp.mean((o["pixel_colors_nr_fine"]
                         - o["pixel_colors_gt"]) ** 2)
    g = jax.jit(jax.grad(loss))(ft_params)
    assert float(jnp.abs(g["params"]["ray_feats"]).max()) > 0


def test_ft_renderer_depth_guided_sampling():
    data = _tiny_data()
    ft = NeuralRayFtRenderer(rfn=2, ray_feats_hw=(DH // 4, DW // 4),
                             height=H, width=W, depth_sample_num=8,
                             fine_depth_sample_num=8)
    params = jax.jit(ft.init)(jax.random.PRNGKey(0), data)
    d = jnp.full((1, 16), 3.0)
    data["que_imgs_info"]["ft_depth_range"] = \
        np.asarray(su.precompute_depth_sampling(d, jnp.full((1, 16), 0.2)))
    out = jax.jit(ft.apply)(params, data)
    fine_d = np.asarray(out["que_depth_fine"])
    # guided samples concentrate within mu +- 3 sigma
    inside = ((fine_d >= 2.4 - 1e-3) & (fine_d <= 3.6 + 1e-3)).mean()
    assert inside > 0.95, inside
