"""Offline array-shard dataset (replaces the reference's LMDB stage).

Reference ``lmdb_rw_render/lmdb_write_render.py:159-248`` serializes each
habitat sample as float16 buffers under per-index keys.  Here a shard is a
simple ``.npz`` holding a contiguous batch of samples — trivially
memory-mappable, seekable, and shardable per host for multi-host input
pipelines (SURVEY §5.8).

Sample schema (matches ``create_rgb_dataset.py:419-428``):
  rgb_panos   (V, H, W, 3) float16 in [0, 1]
  depth_panos (V, H, W, 1) float16 (radial distance, meters)
  rots        (V, 3, 3)    float32 (world-to-camera)
  trans       (V, 3)       float32
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator

import numpy as np

SHARD_FMT = "shard_{:05d}.npz"
META_NAME = "meta.json"


class ShardWriter:
    def __init__(self, out_dir: str | Path, samples_per_shard: int = 64):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.samples_per_shard = samples_per_shard
        self._buf: list = []
        self._shard_idx = 0
        self._count = 0

    # image-like fields stored float16, geometry float32; the ``*_cubes``
    # fields mirror the reference LMDB writer's optional cube keys
    # (``lmdb_write_render.py:225-231``)
    F16_KEYS = ("rgb_panos", "depth_panos", "rgb_cubes", "depth_cubes")
    F32_KEYS = ("rots", "trans", "rots_cubes", "trans_cubes")

    def add(self, sample: dict) -> None:
        rec = {k: np.asarray(sample[k], np.float16)
               for k in self.F16_KEYS if k in sample}
        rec.update({k: np.asarray(sample[k], np.float32)
                    for k in self.F32_KEYS if k in sample})
        self._buf.append(rec)
        self._count += 1
        if len(self._buf) >= self.samples_per_shard:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        arrays = {k: np.stack([s[k] for s in self._buf])
                  for k in self._buf[0]}
        np.savez(self.out_dir / SHARD_FMT.format(self._shard_idx), **arrays)
        self._shard_idx += 1
        self._buf = []

    def close(self) -> None:
        self._flush()
        meta = {"num_samples": self._count,
                "num_shards": self._shard_idx,
                "samples_per_shard": self.samples_per_shard}
        (self.out_dir / META_NAME).write_text(json.dumps(meta))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ShardReader:
    """Random-access reader with per-host sharding support."""

    def __init__(self, shard_dir: str | Path, host_id: int = 0,
                 num_hosts: int = 1):
        self.dir = Path(shard_dir)
        meta = json.loads((self.dir / META_NAME).read_text())
        self.num_samples = meta["num_samples"]
        self.sps = meta["samples_per_shard"]
        self.num_shards = meta["num_shards"]
        self.host_id = host_id
        self.num_hosts = num_hosts
        self._cache: dict = {}

    def __len__(self) -> int:
        return self.num_samples

    def _load_shard(self, si: int):
        if si not in self._cache:
            if len(self._cache) > 2:
                self._cache.clear()
            self._cache[si] = np.load(self.dir / SHARD_FMT.format(si))
        return self._cache[si]

    def __getitem__(self, idx: int) -> dict:
        si, off = divmod(idx, self.sps)
        shard = self._load_shard(si)
        return {k: np.asarray(shard[k][off], np.float32)
                for k in shard.files}

    def host_indices(self) -> np.ndarray:
        """Round-robin split of sample indices across hosts."""
        return np.arange(self.host_id, self.num_samples, self.num_hosts)

    def iter_epoch(self, rng: np.random.Generator,
                   shuffle: bool = True) -> Iterator[dict]:
        idx = self.host_indices()
        if shuffle:
            idx = rng.permutation(idx)
        for i in idx:
            yield self[int(i)]


def write_synthetic_dataset(out_dir: str | Path, num_samples: int,
                            height: int, width: int, m3d_dist: float = 0.5,
                            seed: int = 0,
                            samples_per_shard: int = 64) -> None:
    """Pre-render a procedural dataset (the habitat-free LMDB stage)."""
    from panogrf_tpu.data.synthetic import SphereScene, make_three_view_sample
    with ShardWriter(out_dir, samples_per_shard) as w:
        for i in range(num_samples):
            scene = SphereScene.random(seed * 100003 + i)
            s = make_three_view_sample(scene, height, width, m3d_dist,
                                       seed=seed * 7 + i)
            w.add({k: np.asarray(v) for k, v in s.items()})
