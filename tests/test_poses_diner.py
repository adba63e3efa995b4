"""Pose interpolation + DINER renderer path tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.renderer import poses
from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer


def test_quat_roundtrip(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    r2 = poses.quat_to_rot(poses.rot_to_quat(q))
    np.testing.assert_allclose(r2, q, atol=1e-6)


def test_interpolate_c2w_endpoints(rng):
    a = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    th = 0.7
    rb = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    b = np.concatenate([rb, np.ones((3, 1))], 1)
    path = poses.interpolate_c2w(a, b, 5)
    assert path.shape == (5, 3, 4)
    np.testing.assert_allclose(path[0], a, atol=1e-5)
    np.testing.assert_allclose(path[-1], b, atol=1e-5)
    # midpoint rotation angle is half
    mid = path[2][:, :3]
    ang = np.arccos((np.trace(mid) - 1) / 2)
    np.testing.assert_allclose(ang, th / 2, atol=1e-4)


def test_prepare_render_info():
    c2w = np.stack([np.concatenate([np.eye(3), np.full((3, 1), i)], 1)
                    for i in range(3)]).astype(np.float32)
    ev = poses.prepare_render_info(c2w, "eval")
    assert ev.shape == (1, 3, 4)
    np.testing.assert_allclose(ev[0], c2w[1])
    it = poses.prepare_render_info(c2w, "inter", inter_num=7)
    assert it.shape == (7, 3, 4)


def test_diner_render_path():
    H, W, DH, DW = 32, 64, 16, 32
    rng = np.random.default_rng(0)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8, fine_depth_sample_num=8)
    ref_info = {
        "imgs": jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32),
        "mvs_depth": jnp.asarray(rng.uniform(1, 5, size=(2, DH, DW, 1)),
                                 jnp.float32),
        "depth_range": jnp.asarray([[0.5, 15.0]] * 2),
        "w2c": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
            (2, 3, 4)).at[1, 2, 3].set(0.5),
    }
    coords = jnp.stack(
        [jnp.asarray(rng.integers(0, W, (1, 8)), jnp.float32),
         jnp.asarray(rng.integers(0, H, (1, 8)), jnp.float32)], -1)
    c2w = jnp.concatenate([jnp.eye(3), jnp.asarray([[.1], [0.], [.2]])], 1)
    qdr = jnp.asarray([[0.5, 15.0]])
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {"coords": coords, "c2w": c2w,
                              "depth_range": qdr}}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    ref_data = model.apply(params, ref_info["imgs"], ref_info["mvs_depth"],
                           method=NeuralRayGenRenderer.prepare_ref)
    ref_data["w2c"] = ref_info["w2c"]
    ref_data["mvs_depth"] = ref_info["mvs_depth"]
    ref_data["mvs_uncert"] = jnp.full_like(ref_info["mvs_depth"], 0.04)
    out = jax.jit(lambda p: model.apply(
        p, ref_data, coords, c2w, qdr, ref_info["depth_range"],
        n_candidates=32,
        method=NeuralRayGenRenderer.render_rays_diner))(params)
    assert out["pixel_colors_nr_fine"].shape == (1, 8, 3)
    assert np.isfinite(np.asarray(out["pixel_colors_nr_fine"])).all()


def test_diner_backface_culling():
    """backface_culling computes mvs_normal and still renders finite; and
    the normal mask actually rejects back-facing candidates."""
    H, W, DH, DW = 32, 64, 16, 32
    rng = np.random.default_rng(1)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8, fine_depth_sample_num=8)
    ref_info = {
        "imgs": jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32),
        "mvs_depth": jnp.asarray(rng.uniform(1, 5, size=(2, DH, DW, 1)),
                                 jnp.float32),
        "depth_range": jnp.asarray([[0.5, 15.0]] * 2),
        "w2c": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
            (2, 3, 4)).at[1, 2, 3].set(0.5),
    }
    coords = jnp.stack(
        [jnp.asarray(rng.integers(0, W, (1, 8)), jnp.float32),
         jnp.asarray(rng.integers(0, H, (1, 8)), jnp.float32)], -1)
    c2w = jnp.concatenate([jnp.eye(3), jnp.asarray([[.1], [0.], [.2]])], 1)
    qdr = jnp.asarray([[0.5, 15.0]])
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {"coords": coords, "c2w": c2w,
                              "depth_range": qdr}}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    ref_data = model.apply(params, ref_info["imgs"], ref_info["mvs_depth"],
                           method=NeuralRayGenRenderer.prepare_ref)
    ref_data["w2c"] = ref_info["w2c"]
    ref_data["mvs_depth"] = ref_info["mvs_depth"]
    ref_data["mvs_uncert"] = jnp.full_like(ref_info["mvs_depth"], 0.04)
    out = jax.jit(lambda p: model.apply(
        p, ref_data, coords, c2w, qdr, ref_info["depth_range"],
        n_candidates=32, backface_culling=True,
        method=NeuralRayGenRenderer.render_rays_diner))(params)
    assert np.isfinite(np.asarray(out["pixel_colors_nr_fine"])).all()

    # unit check: a candidate whose forward dir aligns with the surface
    # normal (cos > 0, back-facing) is rejected by the validity mask
    from panogrf_tpu.renderer import diner
    prj = {
        "mu": jnp.full((1, 1, 1, 2), 2.0),
        "uncert": jnp.full((1, 1, 1, 2), 0.01),
        "depth": jnp.full((1, 1, 1, 2), 2.0),
        # normal along +z for both candidates
        "normal": jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                   (1, 1, 1, 2, 3)),
    }
    qd = jnp.asarray([[[1.9, 2.1]]])
    # que_dir is NEGATED unit dir; forward = -que_dir
    fwd_back = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 1, 2, 3))
    w2c = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)[None]
    z_cull = diner.sample_depthguided(qd, prj, 2, 0, 0.5, 15.0,
                                      que_dir=-fwd_back, w2c=w2c)
    z_keep = diner.sample_depthguided(qd, prj, 2, 0, 0.5, 15.0,
                                      que_dir=fwd_back, w2c=w2c)
    # culled: both candidates rejected -> uniform fill (far from 2.0)
    assert float(jnp.abs(z_keep - 2.0).min()) < 0.2
    assert float(jnp.abs(z_cull - 2.0).min()) > 0.5


def test_merge_composites_transparent_identity(rng):
    """Merging in fully-transparent samples (density -> 0 alpha) must not
    change the composite (zero-alpha samples contribute nothing and do not
    occlude), and the merged depths must be sorted."""
    from panogrf_tpu.renderer import render_ops as ro
    qn, rn, dn = 1, 6, 8
    za = jnp.sort(jnp.asarray(rng.uniform(0.5, 15.0, (qn, rn, dn)),
                              jnp.float32), -1)
    ca = jnp.asarray(rng.uniform(size=(qn, rn, dn, 3)), jnp.float32)
    da = jnp.asarray(rng.normal(size=(qn, rn, dn)), jnp.float32)
    zb = jnp.sort(jnp.asarray(rng.uniform(0.5, 15.0, (qn, rn, dn)),
                              jnp.float32), -1)
    cb = jnp.asarray(rng.uniform(size=(qn, rn, dn, 3)), jnp.float32)
    db = jnp.full((qn, rn, dn), -50.0)  # relu -> alpha = 0
    z, colors, density, comp = ro.merge_composites(za, ca, da, zb, cb, db)
    assert z.shape == (qn, rn, 2 * dn)
    np.testing.assert_array_equal(np.diff(np.asarray(z), axis=-1) >= 0, True)
    ref = ro.density2outputs(da, ca, za)
    np.testing.assert_allclose(np.asarray(comp["pixel_colors"]),
                               np.asarray(ref["pixel_colors"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp["render_depth"]),
                               np.asarray(ref["render_depth"]), atol=1e-4)


def test_diner_uniform_merge_paths():
    """render_rays_diner with n_uniform (merge_uniform_diner) and
    contain_uniform (pre-render union) renders finite with the right
    sample counts."""
    H, W, DH, DW = 32, 64, 16, 32
    rng = np.random.default_rng(2)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8, fine_depth_sample_num=8)
    ref_info = {
        "imgs": jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32),
        "mvs_depth": jnp.asarray(rng.uniform(1, 5, size=(2, DH, DW, 1)),
                                 jnp.float32),
        "depth_range": jnp.asarray([[0.5, 15.0]] * 2),
        "w2c": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
            (2, 3, 4)).at[1, 2, 3].set(0.5),
    }
    coords = jnp.stack(
        [jnp.asarray(rng.integers(0, W, (1, 8)), jnp.float32),
         jnp.asarray(rng.integers(0, H, (1, 8)), jnp.float32)], -1)
    c2w = jnp.concatenate([jnp.eye(3), jnp.asarray([[.1], [0.], [.2]])], 1)
    qdr = jnp.asarray([[0.5, 15.0]])
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {"coords": coords, "c2w": c2w,
                              "depth_range": qdr}}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    ref_data = model.apply(params, ref_info["imgs"], ref_info["mvs_depth"],
                           method=NeuralRayGenRenderer.prepare_ref)
    ref_data["w2c"] = ref_info["w2c"]
    ref_data["mvs_depth"] = ref_info["mvs_depth"]
    ref_data["mvs_uncert"] = jnp.full_like(ref_info["mvs_depth"], 0.04)

    out_m = jax.jit(lambda p: model.apply(
        p, ref_data, coords, c2w, qdr, ref_info["depth_range"],
        n_candidates=32, n_uniform=8,
        method=NeuralRayGenRenderer.render_rays_diner))(params)
    # merged union: 8 guided + 8 uniform, sorted
    assert out_m["que_depth_fine"].shape == (1, 8, 16)
    zm = np.asarray(out_m["que_depth_fine"])
    np.testing.assert_array_equal(np.diff(zm, axis=-1) >= 0, True)
    assert out_m["pixel_colors_nr_fine"].shape == (1, 8, 3)
    assert np.isfinite(np.asarray(out_m["pixel_colors_nr_fine"])).all()
    # hit probabilities on the union still form a sub-probability measure
    hp = np.asarray(out_m["hit_prob_nr_fine"])
    assert (hp >= 0).all() and (hp.sum(-1) <= 1.0 + 1e-5).all()

    out_c = jax.jit(lambda p: model.apply(
        p, ref_data, coords, c2w, qdr, ref_info["depth_range"],
        n_candidates=32, contain_uniform=8,
        method=NeuralRayGenRenderer.render_rays_diner))(params)
    assert out_c["que_depth_fine"].shape == (1, 8, 16)
    zc = np.asarray(out_c["que_depth_fine"])
    np.testing.assert_array_equal(np.diff(zc, axis=-1) >= 0, True)
    assert np.isfinite(np.asarray(out_c["pixel_colors_nr_fine"])).all()
