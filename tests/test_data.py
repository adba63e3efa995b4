"""Synthetic scene generator + imgs_info schema tests.

Includes the 'GT-depth debug renderer' style consistency check mirroring
the reference's ``debug`` flag (SURVEY §4): warping view A into view B
using GT depth must reproduce view B where geometry is unoccluded.
"""

import jax
import jax.numpy as jnp
import numpy as np

from panogrf_tpu.core import sphere
from panogrf_tpu.data import synthetic, imgs_info
from panogrf_tpu.ops.resample import bilinear_sample

H, W = 64, 128


def test_render_panorama_shapes_and_depth():
    scene = synthetic.SphereScene.random(0)
    rgb, depth = jax.jit(lambda: synthetic.render_panorama(
        scene, jnp.zeros(3), jnp.eye(3), H, W))()
    assert rgb.shape == (H, W, 3) and depth.shape == (H, W, 1)
    d = np.asarray(depth)
    assert (d > 0).all() and (d <= scene.room_radius + 1e-3).all()
    assert np.asarray(rgb).min() >= 0 and np.asarray(rgb).max() <= 1


def test_three_view_sample_protocol():
    scene = synthetic.SphereScene.random(1)
    s = synthetic.make_three_view_sample(scene, H, W, m3d_dist=0.4, seed=3)
    assert s["rgb_panos"].shape == (3, H, W, 3)
    assert s["rots"].shape == (3, 3, 3) and s["trans"].shape == (3, 3)
    # camera centers: -R^T t; spacing along the shared z axis = m3d_dist
    centers = [-np.asarray(r).T @ np.asarray(t)
               for r, t in zip(s["rots"], s["trans"])]
    d01 = np.linalg.norm(centers[1] - centers[0])
    d12 = np.linalg.norm(centers[2] - centers[1])
    np.testing.assert_allclose([d01, d12], 0.4, atol=1e-5)


def test_gt_depth_cross_view_warp():
    """Reference 'debug renderer': GT-depth warp view0 -> view1 must match."""
    conv = sphere.M3D
    scene = synthetic.SphereScene.random(2)
    s = synthetic.make_three_view_sample(scene, H, W, m3d_dist=0.3, seed=4)

    w2c = imgs_info.pose_w2c(s["rots"], s["trans"])
    c2w = imgs_info.c2w_from_w2c(w2c)
    # Lift view1 pixels to world points with GT depth.
    dirs = conv.ray_directions(H, W)
    d1 = s["depth_panos"][1][..., 0]
    rot1, t1 = c2w[1, :, :3], c2w[1, :, 3]
    pts_w = t1 + jnp.einsum("ij,hwj->hwi", rot1, dirs) * d1[..., None]
    # Project into view 0 and sample its image.
    cam0 = jnp.einsum("ij,hwj->hwi", w2c[0, :, :3], pts_w) + w2c[0, :, 3]
    xy0, dist0 = conv.project_to_pixels(cam0, H, W)
    warped = bilinear_sample(s["rgb_panos"][0], xy0)
    # Occlusion-free mask: projected distance close to view0's own depth.
    d0_at = bilinear_sample(s["depth_panos"][0], xy0)[..., 0]
    visible = np.asarray(jnp.abs(d0_at - dist0) < 0.05)
    err = np.asarray(jnp.abs(warped - s["rgb_panos"][1]))[4:-4]
    vis = visible[4:-4]
    mean_err = (err.mean(-1) * vis).sum() / vis.sum()
    assert vis.mean() > 0.5          # most of the pano is co-visible
    assert mean_err < 0.03, mean_err  # photoconsistent where visible


def test_build_render_sample_schema():
    scene = synthetic.SphereScene.random(3)
    s = synthetic.make_three_view_sample(scene, H, W, seed=5)
    rng = np.random.default_rng(0)
    coords = imgs_info.sample_train_coords(rng, H, W, 64)
    data = imgs_info.build_render_sample(s, coords)
    ref = data["ref_imgs_info"]
    assert ref["imgs"].shape == (2, H, W, 3)
    assert ref["w2c"].shape == (2, 3, 4)
    assert data["que_imgs_info"]["coords"].shape == (1, 64, 2)
    assert data["que_imgs_info"]["c2w"].shape == (3, 4)
    assert data["src_imgs_info"]["imgs"].shape == (2, H, W, 3)
    # srcs are the opposite refs
    np.testing.assert_allclose(np.asarray(data["src_imgs_info"]["imgs"][0]),
                               np.asarray(s["rgb_panos"][2]))


def test_depth_metrics_full_and_zdepth():
    """Reference-exact ERP table + cube-face z-depth variants."""
    import jax.numpy as jnp
    from panogrf_tpu.train import metrics as M
    rng = np.random.default_rng(0)
    h, w = 32, 64
    gt = rng.uniform(1.0, 8.0, size=(h, w)).astype(np.float32)
    pred = gt + rng.normal(0, 0.1, size=(h, w)).astype(np.float32)
    erp = {k: float(v) for k, v in
           M.depth_metrics_erp_full(jnp.asarray(pred),
                                    jnp.asarray(gt)).items()}
    assert set(erp) == {"l1_error", "l2_error", "rmse_error", "wl1_error",
                        "wl2_error", "wrmse_error", "imae_error",
                        "irmse_error", "relative_105", "relative_110",
                        "relative_125", "relative_125_2", "relative_125_3"}
    assert 0 < erp["l1_error"] < 0.2
    assert erp["relative_125"] >= erp["relative_105"]
    # perfect prediction -> zero errors, full accuracy
    perf = M.depth_metrics_erp_full(jnp.asarray(gt), jnp.asarray(gt))
    assert float(perf["l1_error"]) < 1e-6
    assert float(perf["relative_105"]) > 0.999

    zd = {k: float(v) for k, v in
          M.depth_metrics_zdepth(jnp.asarray(pred), jnp.asarray(gt)).items()}
    assert 0 < zd["l1_error"] < 0.2 and np.isfinite(zd["irmse_error"])

    # distance->zdepth inverts the stitcher's zdepth->distance exactly
    from panogrf_tpu.data.lmdb_import import zdepth_to_distance
    z = rng.uniform(1.0, 5.0, size=(h, w, 1)).astype(np.float32)
    dist = zdepth_to_distance(z)
    back = np.asarray(M.distance_to_zdepth(jnp.asarray(dist)))
    np.testing.assert_allclose(back, z, rtol=1e-5, atol=1e-5)


def test_shard_reader_multi_host_split(tmp_path):
    """Per-host round-robin sharding covers all samples exactly once
    (SURVEY §5.8 per-host input pipeline)."""
    from panogrf_tpu.data.shards import ShardReader, ShardWriter
    rng = np.random.default_rng(0)
    with ShardWriter(tmp_path, samples_per_shard=4) as w:
        for i in range(10):
            w.add({
                "rgb_panos": np.full((3, 8, 16, 3), i, np.float32),
                "depth_panos": np.ones((3, 8, 16, 1), np.float32),
                "rots": np.broadcast_to(np.eye(3, dtype=np.float32),
                                        (3, 3, 3)).copy(),
                "trans": np.zeros((3, 3), np.float32),
            })
    hosts = [ShardReader(tmp_path, host_id=h, num_hosts=3)
             for h in range(3)]
    seen = []
    for rd in hosts:
        idx = rd.host_indices()
        seen.extend(int(i) for i in idx)
        # every host can actually read its slice
        for i in idx:
            s = rd[int(i)]
            assert float(s["rgb_panos"][0, 0, 0, 0]) == float(i)
    assert sorted(seen) == list(range(10))
    # disjoint
    assert len(set(seen)) == 10
