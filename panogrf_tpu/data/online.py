"""Online sample generator — the habitat-sim stream, TPU-native edition.

The reference trains from ``HabitatImageGenerator`` (reference
``data_readers/habitat_data_neuray.py:334``, ``create_rgb_dataset.py:97-614``):
an infinite torch Dataset that, per index, picks a navigable point + random
yaw in a Matterport3D mesh, renders ``seq_len`` panoramas spaced
``m3d_dist`` apart along the camera z axis (6 cube faces stitched to ERP),
converts z-depth to distance, normalizes poses so the reference view sits
at the identity, and returns ``{rgb_panos, depth_panos, rots, trans,
rgb_cubes, depth_cubes, rots_cubes, trans_cubes}``
(``create_rgb_dataset.py:419-428``).

habitat-sim (GPU mesh renderer) does not exist in this environment, so the
scene source here is the procedural ray tracer (``data/synthetic.py``) —
but the STREAM CONTRACT is the reference's, exactly:

* infinite train split (``__len__`` = 2**31, reference
  ``habitat_data_neuray.py:429``);
* val/test splits with a fixed number of cached samples (reference caches
  32 fixed val samples, ``habitat_data_neuray.py:418,543-566``);
* pose normalization: view 0 at identity (``create_rgb_dataset.py:393-399``
  via :func:`panogrf_tpu.data.lmdb_import.normalize_poses`);
* optional cube fields with per-face w2c poses and z-depth maps, mirroring
  the LMDB writer's cube keys (``lmdb_write_render.py:225-231``).

Downstream consumers (``data/imgs_info.py`` builders, ``ShardWriter``,
``tools/render_cubes.py --shards``) take these samples unchanged, so the
generator is a drop-in for imported real data.
"""

from __future__ import annotations

import numpy as np

from panogrf_tpu.data.database import cube_face_rotations
from panogrf_tpu.data.lmdb_import import normalize_poses
from panogrf_tpu.data.synthetic import (SphereScene, render_cube_faces,
                                        render_panorama)

_TRAIN_LEN = 2 ** 31  # reference habitat_data_neuray.py:429
_SPLIT_SEED = {"train": 0, "val": 7_000_003, "test": 11_000_027}


class OnlineImageGenerator:
    """Infinite online multi-view pano stream (see module docstring).

    :param split: 'train' (infinite) | 'val' | 'test' (fixed, cached).
    :param seq_len: views per sample, spaced ``m3d_dist`` along camera z
        (3 in the shipped two-view protocol: refs [0, 2], query [1]).
    :param with_cubes: also render the 6 cube faces per view (rgb +
        z-depth + per-face w2c), like the reference's cube sensors.
    """

    def __init__(self, split: str = "train", height: int = 512,
                 width: int = 1024, seq_len: int = 3,
                 m3d_dist: float = 0.5, with_cubes: bool = False,
                 convention: str = "m3d", val_sample_num: int = 32,
                 num_objects: int = 12, seed: int = 0):
        if split not in _SPLIT_SEED:
            raise ValueError(f"unknown split {split!r}")
        self.split = split
        self.height, self.width = height, width
        self.seq_len = seq_len
        self.m3d_dist = m3d_dist
        self.with_cubes = with_cubes
        self.convention = convention
        self.val_sample_num = val_sample_num
        self.num_objects = num_objects
        self.seed = seed
        self._cache: dict = {}

    def __len__(self) -> int:
        return _TRAIN_LEN if self.split == "train" else self.val_sample_num

    def _make(self, idx: int) -> dict:
        base_seed = (self.seed * 600_000_001 + _SPLIT_SEED[self.split]
                     + int(idx))
        scene = SphereScene.random(base_seed, num=self.num_objects)
        rng = np.random.default_rng(base_seed ^ 0x5EED)

        # camera path: common yaw, positions spaced m3d_dist along the
        # camera z axis (reference movement deltas,
        # ``create_rgb_dataset.py:294-301``; +height offset is a habitat
        # mesh detail with no analogue here)
        yaw = rng.uniform(0, 2 * np.pi)
        cy, sy = np.cos(yaw), np.sin(yaw)
        rot_c2w = np.asarray([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]],
                             np.float32)
        base = rng.uniform(-1.0, 1.0, size=3).astype(np.float32)
        z_axis = rot_c2w[:, 2]
        offsets = (np.arange(self.seq_len, dtype=np.float32)
                   - (self.seq_len - 1) / 2.0) * self.m3d_dist
        positions = [base + off * z_axis for off in offsets]

        rgbs, depths = [], []
        cube_rgbs, cube_zs = [], []
        for p in positions:
            rgb, dist = render_panorama(scene, p, rot_c2w, self.height,
                                        self.width, self.convention)
            rgbs.append(np.asarray(rgb))
            depths.append(np.asarray(dist))
            if self.with_cubes:
                crgb, cz = render_cube_faces(scene, p, rot_c2w,
                                             self.height // 2)
                cube_rgbs.append(np.asarray(crgb))
                cube_zs.append(np.asarray(cz))

        # pose normalization: view 0 at world identity
        # (``create_rgb_dataset.py:393-399``)
        rots_c2w = np.broadcast_to(rot_c2w, (self.seq_len, 3, 3))
        rots, trans = normalize_poses(rots_c2w, np.stack(positions),
                                      reference_idx=0)
        sample = {
            "rgb_panos": np.stack(rgbs).astype(np.float32),
            "depth_panos": np.stack(depths).astype(np.float32),
            "rots": rots,
            "trans": trans,
        }
        if self.with_cubes:
            # per-face w2c from the normalized pano w2c (same composition
            # as ``database.PanoDatabase.cube_cameras``)
            face_r = cube_face_rotations()                     # (6, 3, 3)
            rots_cubes = np.einsum("fji,vjk->vfik", face_r, rots)
            trans_cubes = np.einsum("fji,vj->vfi", face_r, trans)
            sample.update({
                "rgb_cubes": np.stack(cube_rgbs).astype(np.float32),
                "depth_cubes": np.stack(cube_zs).astype(np.float32),
                "rots_cubes": rots_cubes.astype(np.float32),
                "trans_cubes": trans_cubes.astype(np.float32),
            })
        return sample

    def __getitem__(self, idx: int) -> dict:
        if self.split == "train":
            return self._make(idx)
        if idx >= self.val_sample_num:
            raise IndexError(idx)
        if idx not in self._cache:   # fixed cached eval samples
            self._cache[idx] = self._make(idx)
        return self._cache[idx]

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def write_shards(self, out_dir, num_samples: int,
                     samples_per_shard: int = 64, start: int = 0) -> None:
        """Pre-render ``num_samples`` into npz shards — the reference's
        ``lmdb_write_render.py`` stage (cube keys included when
        ``with_cubes``)."""
        from panogrf_tpu.data.shards import ShardWriter
        with ShardWriter(out_dir, samples_per_shard) as w:
            for i in range(start, start + num_samples):
                w.add(self._make(i))
