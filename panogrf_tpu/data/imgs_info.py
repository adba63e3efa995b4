"""imgs_info construction: the renderer's input schema.

Reference ``utils/imgs_info.py:105-277`` builds dict-of-arrays samples from
the 3-view habitat protocol (``data_readers/habitat_data_neuray.py:
531-686``): que = view 1, refs = [0, 2], srcs = [2, 0]; 512 random training
ray coords.  Channel-last here; poses are (3, 4) w2c.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

REF_IDS = (0, 2)
QUE_ID = 1
# source view for each reference view (the *other* ref), reference
# ``habitat_data_neuray.py:585-609``.
SRC_IDS = (2, 0)


def polar_weights(height: int, width: int) -> Array:
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) * (math.pi / height)
    return jnp.broadcast_to(jnp.sin(v)[:, None, None], (height, width, 1))


def pose_w2c(rots: Array, trans: Array) -> Array:
    """(V,3,3) + (V,3) -> (V,3,4) w2c matrices."""
    return jnp.concatenate([rots, trans[..., None]], axis=-1)


def build_imgs_info(sample: dict, ids, depth_range: tuple,
                    with_depth: bool = True) -> dict:
    """Per-view info dict for the given view ids.

    sample keys: rgb_panos (V, H, W, 3), depth_panos (V, H, W, 1),
    rots (V, 3, 3), trans (V, 3).
    """
    ids = list(ids)
    w2c = pose_w2c(sample["rots"], sample["trans"])[jnp.asarray(ids)]
    info = {
        "imgs": sample["rgb_panos"][jnp.asarray(ids)],
        "w2c": w2c,
        "depth_range": jnp.asarray([list(depth_range)] * len(ids),
                                   jnp.float32),
    }
    if with_depth and "depth_panos" in sample:
        info["true_depth"] = sample["depth_panos"][jnp.asarray(ids)]
    return info


def c2w_from_w2c(w2c: Array) -> Array:
    rot = jnp.swapaxes(w2c[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", rot, w2c[..., :3, 3])
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def sample_train_coords(rng: np.random.Generator, height: int, width: int,
                        num: int = 512) -> Array:
    """Random integer pixel coords (1, num, 2) like ``get_coords_mask``
    (reference ``utils/base_utils.py:585``)."""
    xs = rng.integers(0, width, size=num)
    ys = rng.integers(0, height, size=num)
    return jnp.asarray(np.stack([xs, ys], -1)[None], jnp.float32)


def full_image_coords(height: int, width: int) -> Array:
    """All pixel coords (1, H*W, 2) for full-image rendering (reference
    ``build_render_imgs_info``, ``utils/imgs_info.py:158-181``)."""
    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    return jnp.asarray(np.stack([xs, ys], -1).reshape(1, -1, 2), jnp.float32)


def build_render_sample_mv(sample: dict, coords: Array, ref_ids,
                           que_id: int,
                           render_depth_range=(0.5, 15.0)) -> dict:
    """Multi-view (V>2) variant (reference ``*_mv`` twins,
    ``get_database_split_mv``): arbitrary reference set + query view; each
    reference's MVS source views are the remaining references."""
    ref_info = build_imgs_info(sample, ref_ids, render_depth_range)
    que_info = build_imgs_info(sample, [que_id], render_depth_range)
    que_w2c = que_info.pop("w2c")
    que_info["c2w"] = c2w_from_w2c(que_w2c)[0]
    que_info["coords"] = coords
    return {"ref_imgs_info": ref_info, "que_imgs_info": que_info}


def build_render_sample(sample: dict, coords: Array,
                        render_depth_range=(0.5, 15.0),
                        src_for_mvs: bool = True) -> dict:
    """Assemble the renderer ``data`` dict from a 3-view sample.

    Matches the reference's que/ref/src split (que=1, refs=[0,2],
    srcs=[2,0]).  The MVS depth must be attached afterwards by running the
    frozen depth stack on (ref, src) pano pairs (see
    ``panogrf_tpu/models/depth_stack.py``).
    """
    ref_info = build_imgs_info(sample, REF_IDS, render_depth_range)
    que_info = build_imgs_info(sample, [QUE_ID], render_depth_range)
    que_w2c = que_info.pop("w2c")
    que_info["c2w"] = c2w_from_w2c(que_w2c)[0]
    que_info["coords"] = coords
    data = {"ref_imgs_info": ref_info, "que_imgs_info": que_info}
    if src_for_mvs:
        data["src_imgs_info"] = build_imgs_info(sample, SRC_IDS,
                                                render_depth_range,
                                                with_depth=False)
    return data
