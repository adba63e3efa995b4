"""LMDB reader + reference-data importer round-trip tests."""

import numpy as np
import pytest

from panogrf_tpu.data.lmdb_reader import LMDBReader, write_minimal_lmdb
from panogrf_tpu.data import lmdb_import
from panogrf_tpu.data.shards import ShardReader


def _sample_items(n=3, v=3, h=16, w=32, seed=0, cubes=False):
    """Reference writer key layout (lmdb_write_render.py:193-248)."""
    rng = np.random.default_rng(seed)
    items = {}
    samples = []
    cw = h // 2
    for i in range(n):
        s = {
            "rgb_panos": rng.uniform(size=(v, h, w, 3)).astype(np.float32),
            "depth_panos": rng.uniform(1, 8, size=(v, h, w)).astype(
                np.float32),
            "rots": np.broadcast_to(np.eye(3, dtype=np.float32),
                                    (v, 3, 3)).copy(),
            "trans": rng.normal(size=(v, 3)).astype(np.float32),
        }
        if cubes:
            # cube fields as the reference writer stores them
            # (lmdb_write_render.py:225-231): depth has NO channel axis
            s["rgb_cubes"] = rng.uniform(
                size=(v, 6, cw, cw, 3)).astype(np.float32)
            s["depth_cubes"] = rng.uniform(
                1, 8, size=(v, 6, cw, cw)).astype(np.float32)
            s["rots_cubes"] = np.broadcast_to(
                np.eye(3, dtype=np.float32), (v, 6, 3, 3)).copy()
            s["trans_cubes"] = rng.normal(size=(v, 6, 3)).astype(np.float32)
        samples.append(s)
        for k, arr in s.items():
            items[f"{i},{k}".encode("ascii")] = arr.tobytes()
    return items, samples


def test_lmdb_roundtrip_small_and_overflow(tmp_path):
    items = {b"a": b"x" * 10, b"b": b"y" * 9000, b"c": b"z"}
    env = write_minimal_lmdb(tmp_path / "env", items)
    with LMDBReader(env) as db:
        assert len(db) == 3
        got = dict(db.items())
        assert got == items
        assert db.get(b"b") == items[b"b"]
        assert db.get(b"missing") is None


def test_lmdb_many_keys_branch_page(tmp_path):
    # enough keys to force a multi-leaf tree with a branch root
    items = {f"key{i:04d}".encode(): bytes([i % 256]) * (50 + i % 37)
             for i in range(300)}
    env = write_minimal_lmdb(tmp_path / "env", items)
    with LMDBReader(env) as db:
        got = dict(db.items())
        assert got == items
        for k in (b"key0000", b"key0150", b"key0299"):
            assert db.get(k) == items[k]


def test_import_lmdb_to_shards(tmp_path):
    items, samples = _sample_items()
    env = write_minimal_lmdb(
        tmp_path / "lmdb_render_train_32x16_seq_len_3_m3d_dist_0.5", items)
    out = tmp_path / "shards"
    n = lmdb_import.import_lmdb(env, out)
    assert n == len(samples)
    rd = ShardReader(out)
    assert len(rd) == len(samples)
    s0 = rd[0]
    np.testing.assert_allclose(s0["rgb_panos"], samples[0]["rgb_panos"],
                               atol=2e-3)  # float16 shard storage
    assert s0["depth_panos"].shape == (3, 16, 32, 1)
    np.testing.assert_allclose(s0["rots"], samples[0]["rots"])
    np.testing.assert_allclose(s0["trans"], samples[0]["trans"])


def test_import_lmdb_cube_fields_roundtrip(tmp_path):
    """LMDB (with *_cubes keys) -> shards -> reader round-trip (VERDICT r2
    Missing #2): cube faces, poses and depths survive with the channel
    axis added to depth_cubes."""
    items, samples = _sample_items(n=2, cubes=True)
    env = write_minimal_lmdb(
        tmp_path / "lmdb_render_test_32x16_seq_len_3_m3d_dist_0.5", items)
    out = tmp_path / "shards"
    n = lmdb_import.import_lmdb(env, out)
    assert n == 2
    rd = ShardReader(out)
    s0 = rd[0]
    assert s0["rgb_cubes"].shape == (3, 6, 8, 8, 3)
    assert s0["depth_cubes"].shape == (3, 6, 8, 8, 1)
    np.testing.assert_allclose(s0["rgb_cubes"], samples[0]["rgb_cubes"],
                               atol=2e-3)
    np.testing.assert_allclose(s0["depth_cubes"][..., 0],
                               samples[0]["depth_cubes"], atol=2e-2)
    np.testing.assert_allclose(s0["rots_cubes"], samples[0]["rots_cubes"])
    np.testing.assert_allclose(s0["trans_cubes"], samples[0]["trans_cubes"])


def test_parse_env_name():
    info = lmdb_import.parse_env_name(
        "/x/lmdb_render_train_1024x512_seq_len_3_m3d_dist_0.5")
    assert info == {"mode": "train", "width": 1024, "height": 512,
                    "seq_len": 3, "m3d_dist": 0.5}
    assert lmdb_import.parse_env_name("/x/whatever") is None


def test_normalize_poses_reference_at_origin():
    rng = np.random.default_rng(3)
    # random orthonormal rotations
    def rand_rot():
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        return q * np.sign(np.linalg.det(q))
    rots = np.stack([rand_rot() for _ in range(3)])
    trans = rng.normal(size=(3, 3))
    out_r, out_t = lmdb_import.normalize_poses(rots, trans, 1)
    np.testing.assert_allclose(out_r[1], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(out_t[1], 0.0, atol=1e-6)
    # exact reference formula (create_rgb_dataset.py:393-399)
    exp_t = -np.linalg.inv(rots[1]) @ (trans[0] - trans[1])
    exp_r = rots[1] @ np.linalg.inv(rots[0])
    np.testing.assert_allclose(out_t[0], exp_t, atol=1e-5)
    np.testing.assert_allclose(out_r[0], exp_r, atol=1e-5)


def test_zdepth_to_distance_ratio():
    h, w = 64, 128
    d = np.ones((h, w, 1), np.float32)
    out = lmdb_import.zdepth_to_distance(d)
    # ratio >= 1 everywhere, == 1 at face centers, <= sqrt(3) at corners
    assert out.min() >= 1.0 - 1e-5
    assert out.max() <= np.sqrt(3.0) + 1e-4
    # exact reference recipe at one pixel: front face center column
    cw = h // 2
    k = (cw - 1) / cw
    theta = (w * 3 // 4 + 0.5) * 2 * np.pi / w   # depends on convention; just
    phi = (h // 2 + 0.5) * np.pi / h             # check equator scaling law
    x = np.sin(phi) * np.sin(theta)
    y = np.cos(phi)
    z = np.sin(phi) * np.cos(theta)
    m = max(abs(x), abs(y), abs(z))
    exp = np.sqrt(1 + (1 / m**2 - 1) * k * k)
    np.testing.assert_allclose(out[h // 2, w * 3 // 4, 0], exp, rtol=1e-5)
