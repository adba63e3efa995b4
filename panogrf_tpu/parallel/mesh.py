"""Device mesh + sharding helpers.

The reference has NO distributed execution (multi-GPU raises
NotImplementedError, ``train/trainer.py:233-236``).  The TPU-native scaling
model (SURVEY §2.8): a ('data', 'ray') mesh — batch/scene parallelism on
'data', and the ray dimension (up to 512*1024 rays per pano) sharded on
'ray' as our sequence/context-parallel axis.  Parameters are replicated
(<50M); XLA inserts the psum for gradients over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
RAY_AXIS = "ray"


def make_mesh(n_devices: Optional[int] = None, data: int = 1,
              axis_names: Sequence[str] = (DATA_AXIS, RAY_AXIS)) -> Mesh:
    """Mesh over the first ``n_devices`` devices, shaped (data, ray)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh needs {n} devices but jax.devices() has {len(devs)} "
            f"({[d.platform for d in devs]}); for a virtual CPU mesh set "
            f'jax.config.update("jax_platforms","cpu") and '
            f'jax.config.update("jax_num_cpu_devices", {n}) BEFORE backend '
            f"init (env vars are overridden by the axon plugin)")
    devs = np.asarray(devs[:n]).reshape(data, n // data)
    return Mesh(devs, axis_names)


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (qn, rn, ...) arrays along rn."""
    return NamedSharding(mesh, P(None, RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ray_batch(mesh: Mesh, data: dict) -> dict:
    """Place a renderer ``data`` dict on the mesh: query coords (and any
    per-ray arrays) sharded along the ray axis, everything else replicated.
    """
    rs = ray_sharding(mesh)
    rep = replicated(mesh)

    def place(path_leaf):
        path, leaf = path_leaf
        keys = [getattr(p, "key", None) for p in path]
        if "coords" in keys:
            return jax.device_put(leaf, rs)
        return jax.device_put(leaf, rep)

    flat, treedef = jax.tree_util.tree_flatten_with_path(data)
    return jax.tree_util.tree_unflatten(treedef, [place(x) for x in flat])
