"""Cross-dataset reader tests (Replica / Residential / CoffeeArea)."""

import numpy as np
import pytest

from panogrf_tpu.data import readers


def _write_replica_scene(root, scene, v=3, h=32, w=64, seed=0):
    rng = np.random.default_rng(seed)
    d = root / f"{scene}_0"
    d.mkdir(parents=True)
    np.savez(d / "data.npz",
             rgb_panos=rng.uniform(size=(v, h, w, 3)).astype(np.float32),
             depth_panos=rng.uniform(1, 8, size=(v, h, w)).astype(
                 np.float32),
             rots=np.broadcast_to(np.eye(3, dtype=np.float32),
                                  (v, 3, 3)).copy(),
             trans=rng.normal(size=(v, 3)).astype(np.float32))


def test_replica_wide(tmp_path):
    for s in (0, 1, 5):
        _write_replica_scene(tmp_path, s, seed=s)
    ds = readers.ReplicaWideDataset(tmp_path, height=16, width=32,
                                    scenes=range(18))
    assert len(ds) == 3
    s = ds[0]
    assert s["rgb_panos"].shape == (3, 16, 32, 3)
    assert s["depth_panos"].shape == (3, 16, 32, 1)
    db = ds.database(0)
    assert db.get_image(1).shape == (16, 32, 3)
    from panogrf_tpu.data.database import get_database_split
    train, val = get_database_split(db)
    assert (train, val) == ([0, 2], [1])


def _scene_archive(rng, v_total=9, h=16, w=32, cubes=True):
    data = {
        "rgbs": rng.uniform(size=(v_total, 3, h, w)).astype(np.float32),
        "c2w": np.broadcast_to(np.eye(4, dtype=np.float32),
                               (v_total, 4, 4)).copy(),
    }
    data["c2w"][:, 0, 3] = np.arange(v_total)
    if cubes:
        cw = h // 2
        data["cube_rgbs"] = rng.uniform(
            size=(v_total, 6, 3, cw, cw)).astype(np.float32)
        # face marker in the first pixel so the rgb<->pose pairing after
        # rectify() is checkable
        data["cube_rgbs"][:, :, 0, 0, 0] = np.arange(6)[None]
        data["cube_c2w"] = np.broadcast_to(
            np.eye(4, dtype=np.float32), (v_total, 6, 4, 4)).copy()
        data["cube_c2w"][:, :, 1, 3] = np.arange(6)[None]
    return data


def test_residential_t7(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    d = tmp_path / "0_perspective_all"
    d.mkdir()
    data = _scene_archive(rng)
    torch.save({k: torch.from_numpy(v) for k, v in data.items()},
               d / "all.t7")

    ds = readers.ResidentialDataset(tmp_path)
    assert len(ds) == 1
    s = ds[0]
    # views [0, 4, 8], channel-last
    assert s["rgbs"].shape == (3, 16, 32, 3)
    np.testing.assert_allclose(s["c2w"][:, 0, 3], [0, 4, 8])
    # reference rectify() (residential.py:30-40) permutes ONLY cube_c2w
    # (0<->5, 2<->4); cube_rgbs stays in archive order so image f pairs
    # with the pose originally stored at the crossed slot.
    np.testing.assert_allclose(s["cube_c2w"][:, :, 1, 3],
                               np.broadcast_to([5, 1, 4, 3, 2, 0], (3, 6)))
    np.testing.assert_allclose(s["cube_rgbs"][:, :, 0, 0, 0],
                               np.broadcast_to(np.arange(6.0), (3, 6)))
    db = ds.database(0)
    assert db.database_name == "residential"
    assert db.get_image(2).shape == (16, 32, 3)
    # w2c = inv(c2w): translation x of view 4 (index 1) is -4
    np.testing.assert_allclose(db.trans[1], [-4, 0, 0], atol=1e-6)


def test_coffee_area_npz(tmp_path):
    rng = np.random.default_rng(2)
    d = tmp_path / "2_perspective_all"
    d.mkdir()
    np.savez(d / "all.npz", **_scene_archive(rng, cubes=False))
    ds = readers.CoffeeAreaDataset(tmp_path)
    s = ds[0]
    assert s["rgbs"].shape == (3, 16, 32, 3)
    assert ds.database(0).database_name == "CoffeeArea"


def test_somsi_h5(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(3)
    v, h, w = 9, 20, 40
    pose = np.broadcast_to(np.eye(4), (v, 4, 4)).copy()
    pose[:, 1, 3] = rng.normal(size=v)
    with h5py.File(tmp_path / "1.h5", "w") as f:
        f["color"] = (rng.uniform(size=(v, h, w, 3)) * 255).astype(np.uint8)
        f["pose"] = pose.astype(np.float32)
    s = readers.load_somsi_h5(tmp_path / "1.h5", 16, 32, ref_idx=4)
    assert s["rgbs"].shape == (v, 16, 32, 3)
    # pose renormalized: view 4 at the origin
    np.testing.assert_allclose(s["c2w"][4], np.eye(4), atol=1e-6)
