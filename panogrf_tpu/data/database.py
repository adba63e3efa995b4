"""Scene database: per-sample view store + split protocol + cube cameras.

Reference ``dataset/database.py:74-731`` (M3DDatabase and friends): holds
one multi-view sample (images, depths, w2c/c2w poses), the train/test view
split (refs [0, 2], query [1] for the two-view protocol), and the
perspective cube-face cameras used by ``render_cubes.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import numpy as np


def get_poses(rots: np.ndarray, trans: np.ndarray):
    """(V,3,3)+(V,3) w2c -> (w2c (V,3,4), c2w (V,3,4))."""
    w2c = np.concatenate([rots, trans[..., None]], -1).astype(np.float32)
    rot_inv = np.swapaxes(rots, -1, -2)
    t_inv = -np.einsum("vij,vj->vi", rot_inv, trans)
    c2w = np.concatenate([rot_inv, t_inv[..., None]], -1).astype(np.float32)
    return w2c, c2w


def cube_intrinsics(width: int) -> np.ndarray:
    """90-deg FOV pinhole K for cube faces (reference database.py:99-108)."""
    f = 0.5 * width / math.tan(0.5 * 90.0 / 180.0 * math.pi)
    cx = (width - 1) / 2.0
    cy = (width - 1) / 2.0
    return np.asarray([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)


def cube_face_rotations() -> np.ndarray:
    """Camera-frame rotations of the 6 cube faces [F R B L U D] relative to
    the pano camera, EXACTLY matching the py360convert face layout of
    ``core/cubemap._e2c_grid`` so that a perspective render with
    ``R_face @ K^-1 [u, v, 1]`` rays reproduces ``equi_to_cube`` faces
    pixel-for-pixel (up to the sub-pixel focal-grid difference).

    Derivation: each e2c face is the plane ``xyz = C + col*Du + row*Dv`` in
    the py360convert sphere frame (lon = atan2(x, z), lat up = +y); the m3d
    pano camera frame is that frame with x negated (m3d ``theta = fx*2pi -
    pi/2``, see ``core/sphere._m3d_*``).  A pinhole face camera maps
    ``u+ -> col+``, ``v+ -> row+``, ``z -> face axis``, so the rotation's
    columns are [flip(Du), flip(Dv), flip(C-hat)] with flip = diag(-1,1,1).
    The previous roty/rotx table was 180-deg rotated per face — stitching
    those renders with ``cube_to_equi`` produced upside-down panos.
    """
    faces = np.asarray([
        # x_face          y_face          z_face (optical axis)
        [[-1, 0, 0], [0, -1, 0], [0, 0, 1]],    # F  (z = +0.5)
        [[0, 0, -1], [0, -1, 0], [-1, 0, 0]],   # R  (x = +0.5)
        [[1, 0, 0], [0, -1, 0], [0, 0, -1]],    # B  (z = -0.5)
        [[0, 0, 1], [0, -1, 0], [1, 0, 0]],     # L  (x = -0.5)
        [[-1, 0, 0], [0, 0, 1], [0, 1, 0]],     # U  (y = +0.5)
        [[-1, 0, 0], [0, 0, -1], [0, -1, 0]],   # D  (y = -0.5)
    ], np.float64)
    # columns are the face-frame basis images: transpose the row triplets
    return np.ascontiguousarray(np.swapaxes(faces, -1, -2)) \
        .astype(np.float32)


@dataclasses.dataclass
class PanoDatabase:
    """One multi-view panorama sample."""
    database_name: str
    images: np.ndarray          # (V, H, W, 3)
    depths: np.ndarray          # (V, H, W, 1)
    rots: np.ndarray            # (V, 3, 3) w2c
    trans: np.ndarray           # (V, 3)
    min_depth: float = 0.5
    max_depth: float = 15.0
    test_img_ids: Sequence[int] = (1,)

    def __post_init__(self):
        self.w2c, self.c2w = get_poses(self.rots, self.trans)
        self.img_ids = list(range(len(self.images)))
        self.train_img_ids = [i for i in self.img_ids
                              if i not in set(self.test_img_ids)]

    @property
    def depth_range(self) -> np.ndarray:
        return np.asarray([self.min_depth, self.max_depth], np.float32)

    def get_image(self, img_id: int) -> np.ndarray:
        return self.images[int(img_id)]

    def get_depth(self, img_id: int) -> np.ndarray:
        return self.depths[int(img_id)]

    def cube_cameras(self, img_id: int):
        """Per-face (w2c (6,3,4), K (3,3)) for perspective rendering of the
        view's cubemap (reference render_cubes.py protocol)."""
        face_r = cube_face_rotations()                 # (6, 3, 3) cam->face
        r = self.rots[int(img_id)]
        t = self.trans[int(img_id)]
        # x_face = R_face^T x_cam (face frame), x_cam = R x_w + t
        rots = np.einsum("fji,jk->fik", face_r, r)     # (6, 3, 3)
        trans = np.einsum("fji,j->fi", face_r, t)
        w2c = np.concatenate([rots, trans[..., None]], -1).astype(np.float32)
        width = self.images.shape[2] // 2
        return w2c, cube_intrinsics(width)


def get_database_split(database: PanoDatabase, split_type: str = "test"):
    """Reference ``dataset/database.py:660-697``: refs [0, 2], query [1]."""
    if not split_type.startswith("test"):
        raise NotImplementedError(split_type)
    name = database.database_name
    if name.startswith(("m3d", "residential", "CoffeeArea", "coffee_area",
                        "replica")):
        return [0, 2], list(database.test_img_ids)
    raise NotImplementedError(name)


def get_database_split_mv(database: PanoDatabase, reference_idx: int,
                          test_views: Sequence[int]):
    """Multi-view split (reference ``database.py:697-731``): refs are the
    first ``reference_idx`` views, queries are ``test_views``."""
    return list(range(reference_idx)), list(test_views)
