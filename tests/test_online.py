"""OnlineImageGenerator: reference stream contract + cube-field geometry."""

import numpy as np

from panogrf_tpu.data.online import OnlineImageGenerator

H, W = 64, 128
FW = H // 2


def test_stream_contract():
    """Infinite train split, fixed cached val split, reference key set,
    deterministic per index (reference ``habitat_data_neuray.py:334-429``)."""
    g = OnlineImageGenerator("train", H, W, with_cubes=True)
    assert len(g) == 2 ** 31
    s = g[3]
    assert s["rgb_panos"].shape == (3, H, W, 3)
    assert s["depth_panos"].shape == (3, H, W, 1)
    assert s["rots"].shape == (3, 3, 3) and s["trans"].shape == (3, 3)
    assert s["rgb_cubes"].shape == (3, 6, FW, FW, 3)
    assert s["depth_cubes"].shape == (3, 6, FW, FW, 1)
    assert s["rots_cubes"].shape == (3, 6, 3, 3)
    assert s["trans_cubes"].shape == (3, 6, 3)

    # pose normalization: view 0 at identity (create_rgb_dataset.py:393-399)
    np.testing.assert_allclose(s["rots"][0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(s["trans"][0], 0.0, atol=1e-6)
    # views spaced m3d_dist apart along one axis
    d01 = np.linalg.norm(s["trans"][1] - s["trans"][0])
    assert abs(d01 - 0.5) < 1e-5

    # deterministic per index; distinct across indices and splits
    g2 = OnlineImageGenerator("train", H, W, with_cubes=True)
    np.testing.assert_array_equal(g2[3]["rgb_panos"], s["rgb_panos"])
    assert not np.array_equal(g2[4]["rgb_panos"], s["rgb_panos"])
    gv = OnlineImageGenerator("val", H, W, val_sample_num=2)
    assert len(gv) == 2
    assert not np.array_equal(gv[0]["rgb_panos"],
                              OnlineImageGenerator("train", H, W)[0]
                              ["rgb_panos"])
    assert gv[0] is gv[0]  # cached fixed eval samples


def test_cube_fields_consistent_with_pano():
    """Stitching the generated cube faces must reproduce the ERP pano, and
    z-depth / cos(face angle) must reproduce the radial distance — the two
    invariants the habitat pipeline guarantees by construction
    (``create_rgb_dataset.py:536-614``)."""
    from panogrf_tpu.core import cubemap
    from panogrf_tpu.data.database import cube_intrinsics

    g = OnlineImageGenerator("val", H, W, with_cubes=True, val_sample_num=1)
    s = g[0]
    v = 1
    stitched = np.asarray(cubemap.cube_to_equi(s["rgb_cubes"][v], H, W))
    err = np.abs(stitched - s["rgb_panos"][v]).mean()
    assert err < 0.03, err

    # z-depth -> distance per face, then stitch and compare to depth_panos
    k = cube_intrinsics(FW)
    u, vv = np.meshgrid(np.arange(FW, dtype=np.float32),
                        np.arange(FW, dtype=np.float32))
    hom = np.stack([u, vv, np.ones_like(u)], -1)
    dirs = np.einsum("ij,hwj->hwi", np.linalg.inv(k), hom)
    dz = (dirs[..., 2] / np.linalg.norm(dirs, axis=-1))[None, ..., None]
    dist_cube = s["depth_cubes"][v] / dz
    stitched_d = np.asarray(cubemap.cube_to_equi(dist_cube, H, W))
    rel = np.abs(stitched_d - s["depth_panos"][v]) \
        / np.maximum(s["depth_panos"][v], 1e-3)
    # bilinear stitching smears depth discontinuities; the bulk must agree
    assert np.quantile(rel, 0.9) < 0.02, np.quantile(rel, 0.9)

    # per-face w2c composes the pano w2c with the face rotation: camera
    # centers of all 6 faces coincide with the pano camera center
    for f in range(6):
        rf, tf = s["rots_cubes"][v, f], s["trans_cubes"][v, f]
        center_f = -rf.T @ tf
        center_p = -s["rots"][v].T @ s["trans"][v]
        np.testing.assert_allclose(center_f, center_p, atol=1e-5)


def test_write_shards_roundtrip(tmp_path):
    from panogrf_tpu.data.shards import ShardReader
    g = OnlineImageGenerator("train", 32, 64, with_cubes=True)
    g.write_shards(tmp_path / "sh", num_samples=2, samples_per_shard=1)
    r = ShardReader(tmp_path / "sh")
    assert len(r) == 2
    s = r[1]
    assert s["rgb_cubes"].shape == (3, 6, 16, 16, 3)
    ref = g[1]
    np.testing.assert_allclose(s["rgb_panos"], ref["rgb_panos"], atol=2e-3)
