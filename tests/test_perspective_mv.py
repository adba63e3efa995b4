"""Perspective (cube-face) query rendering + multi-view (rfn=3) renderer."""

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.data.database import (PanoDatabase, cube_intrinsics,
                                       cube_face_rotations,
                                       get_database_split)
from panogrf_tpu.renderer import render_ops as ro
from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer

H, W = 32, 64
DH, DW = 16, 32


def test_cube_intrinsics_fov():
    K = cube_intrinsics(128)
    # 90 deg FOV: f = W/2
    assert abs(K[0, 0] - 64.0) < 1e-4
    R = cube_face_rotations()
    assert R.shape == (6, 3, 3)
    for i in range(6):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R[i]) - 1.0) < 1e-5


def test_cube_face_rotations_match_e2c_layout():
    """R_face @ K^-1 [u,v,1] must reproduce the py360convert e2c face
    directions (in the m3d camera frame) — the invariant that makes
    ``equi_to_cube(pano)`` valid GT for perspective face renders
    (``tools/render_cubes.py``).  Regression for the 180-deg-rotated
    face table shipped in rounds 1-2."""
    from panogrf_tpu.core.cubemap import _e2c_grid
    H, W, FW = 64, 128, 32
    grid = _e2c_grid(H, W, FW)
    fx = (grid[..., 0] + 0.5) / W
    fy = (grid[..., 1] + 0.5) / H
    theta = fx * 2 * np.pi - 0.5 * np.pi
    phi = fy * np.pi
    d_e2c = np.stack([np.sin(phi) * np.cos(theta), np.cos(phi),
                      np.sin(phi) * np.sin(theta)], -1)
    k_inv = np.linalg.inv(cube_intrinsics(FW))
    u, v = np.meshgrid(np.arange(FW, dtype=np.float64),
                       np.arange(FW, dtype=np.float64))
    df = np.einsum("ij,hwj->hwi", k_inv,
                   np.stack([u, v, np.ones_like(u)], -1))
    df /= np.linalg.norm(df, axis=-1, keepdims=True)
    d_persp = np.einsum("fij,hwj->fhwi", cube_face_rotations(), df)
    # residual bounded by the focal-grid difference (e2c is align-corners
    # with focal (fw-1)/2; the cube K uses fw/2): ~0.012 at face corners
    assert np.abs(d_persp - d_e2c).max() < 0.02


def test_database_protocol():
    rng = np.random.default_rng(0)
    db = PanoDatabase(
        "m3d", rng.uniform(size=(3, H, W, 3)).astype(np.float32),
        rng.uniform(1, 5, size=(3, H, W, 1)).astype(np.float32),
        np.broadcast_to(np.eye(3, dtype=np.float32), (3, 3, 3)).copy(),
        np.zeros((3, 3), np.float32))
    train_ids, val_ids = get_database_split(db)
    assert train_ids == [0, 2] and val_ids == [1]
    w2c, K = db.cube_cameras(1)
    assert w2c.shape == (6, 3, 4) and K.shape == (3, 3)


def test_perspective_rays_center_pixel():
    """The ray through the principal point must be the camera z axis."""
    K = jnp.asarray(cube_intrinsics(64))[None]
    w2c = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)[None]
    coords = jnp.asarray([[[31.5, 31.5]]])  # principal point (cx, cy)
    centers, dirs = ro.coords2rays_perspective(coords, w2c, K)
    d = np.asarray(dirs[0, 0])
    d = d / np.linalg.norm(d)
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(centers[0, 0]), 0, atol=1e-6)


def _data(rfn):
    rng = np.random.default_rng(5)
    w2c = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1), (rfn, 3, 4))
    for i in range(rfn):
        w2c = w2c.at[i, 2, 3].set(0.3 * i)
    return {
        "ref_imgs_info": {
            "imgs": jnp.asarray(rng.uniform(size=(rfn, H, W, 3)),
                                jnp.float32),
            "mvs_depth": jnp.asarray(
                rng.uniform(1, 5, size=(rfn, DH, DW, 1)), jnp.float32),
            "depth_range": jnp.asarray([[0.5, 15.0]] * rfn),
            "w2c": w2c,
        },
        "que_imgs_info": {
            "coords": jnp.stack(
                [jnp.asarray(rng.integers(0, W, (1, 8)), jnp.float32),
                 jnp.asarray(rng.integers(0, H, (1, 8)), jnp.float32)], -1),
            "c2w": jnp.concatenate(
                [jnp.eye(3), jnp.asarray([[0.], [0.], [0.1]])], 1),
            "depth_range": jnp.asarray([[0.5, 15.0]]),
        },
    }


def test_renderer_three_ref_views():
    """rfn=3 (multi-view variant, reference *_mv twins) just works."""
    data = _data(3)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8, fine_depth_sample_num=8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    out = jax.jit(model.apply)(params, data)
    assert out["pixel_colors_nr_fine"].shape == (1, 8, 3)
    assert np.isfinite(np.asarray(out["pixel_colors_nr_fine"])).all()


def test_renderer_perspective_query():
    """Render a cube-face (perspective) query through the spherical refs."""
    data = _data(2)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8, fine_depth_sample_num=8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)

    ref_data = model.apply(params, data["ref_imgs_info"]["imgs"],
                           data["ref_imgs_info"]["mvs_depth"],
                           method=NeuralRayGenRenderer.prepare_ref)
    ref_data["w2c"] = data["ref_imgs_info"]["w2c"]
    K = jnp.asarray(cube_intrinsics(H // 2))[None]
    que_w2c = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)[None]
    coords = jnp.asarray(
        np.random.default_rng(0).uniform(0, H // 2, size=(1, 8, 2)),
        jnp.float32)
    out = jax.jit(lambda p: model.apply(
        p, ref_data, coords, data["que_imgs_info"]["c2w"],
        data["que_imgs_info"]["depth_range"],
        data["ref_imgs_info"]["depth_range"],
        perspec_cam=(que_w2c, K),
        method=NeuralRayGenRenderer.render_rays))(params)
    assert out["pixel_colors_nr_fine"].shape == (1, 8, 3)
    assert np.isfinite(np.asarray(out["pixel_colors_nr_fine"])).all()


def test_multi_view_sample_and_builder():
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_multi_view_sample)
    from panogrf_tpu.data import imgs_info
    s = make_multi_view_sample(SphereScene.random(1), H, W, num_views=5,
                               spacing=0.3, seed=2)
    assert s["rgb_panos"].shape == (5, H, W, 3)
    coords = imgs_info.sample_train_coords(
        np.random.default_rng(0), H, W, 16)
    data = imgs_info.build_render_sample_mv(s, coords, ref_ids=[0, 2, 4],
                                            que_id=1)
    assert data["ref_imgs_info"]["imgs"].shape == (3, H, W, 3)
    assert data["que_imgs_info"]["coords"].shape == (1, 16, 2)
    # camera spacing along z: consecutive centers 0.3 apart
    centers = [-np.asarray(r).T @ np.asarray(t)
               for r, t in zip(s["rots"], s["trans"])]
    for a, b in zip(centers[:-1], centers[1:]):
        np.testing.assert_allclose(np.linalg.norm(b - a), 0.3, atol=1e-5)
