"""Procedural panoramic scene generator (habitat-sim replacement for CI).

The reference renders training data online with habitat-sim VectorEnvs
(``data_readers/create_rgb_dataset.py:97-614``): 3 camera positions offset
along the camera z axis by ``m3d_dist``, 6 cube faces stitched to ERP,
z-depth converted to distance.  That stack needs GPU+meshes; for tests,
development and benchmarks we instead ray-trace a procedural room —
analytic ERP images with EXACT distance depth and full photo-consistency
between views, which is precisely what the renderer/MVS math needs.

Scenes: a textured bounding sphere ("room") plus N lambertian spheres.
Everything is pure jnp, jit/vmap-friendly, and convention-aware.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.core.sphere import SphereConvention, get_convention

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SphereScene:
    centers: Array      # (N, 3)
    radii: Array        # (N,)
    colors: Array       # (N, 3)
    room_radius: float = 8.0

    @staticmethod
    def random(seed: int = 0, num: int = 12,
               room_radius: float = 8.0) -> "SphereScene":
        rng = np.random.default_rng(seed)
        # Keep every sphere clear of the camera spawn region (|p| <= ~1.8,
        # see make_*_view_sample): a camera inside an object sees its
        # interior and the views become photo-inconsistent.
        dirs = rng.normal(size=(num, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        radii = rng.uniform(0.4, 1.2, size=(num,))
        dist = rng.uniform(2.2, 5.5, size=(num,)) + radii
        centers = dirs * dist[:, None]
        colors = rng.uniform(0.1, 1.0, size=(num, 3))
        return SphereScene(jnp.asarray(centers, jnp.float32),
                           jnp.asarray(radii, jnp.float32),
                           jnp.asarray(colors, jnp.float32), room_radius)


def _ray_sphere(origin: Array, dirs: Array, center: Array,
                radius: Array) -> Array:
    """Nearest positive hit distance, inf if miss. dirs unit (..., 3)."""
    oc = origin - center
    b = jnp.sum(dirs * oc, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius ** 2
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 1e-3, t0, t1)
    return jnp.where((disc > 0) & (t > 1e-3), t, jnp.inf)


def _room_texture(dirs: Array) -> Array:
    """Smooth periodic texture on the room sphere (gives MVS something to
    match)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    r = 0.5 + 0.25 * jnp.sin(3.0 * x + 1.0) + 0.25 * jnp.sin(5.0 * z)
    g = 0.5 + 0.25 * jnp.sin(4.0 * y + 2.0) + 0.25 * jnp.cos(3.0 * x)
    b = 0.5 + 0.25 * jnp.cos(2.0 * z + 0.5) + 0.25 * jnp.sin(4.0 * y)
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


import functools


@functools.lru_cache(maxsize=8)
def _render_jit(height: int, width: int, conv_name: str):
    """Jitted renderer core (eager op dispatch costs ~4ms each on this box,
    and hundreds of ops per pano would dominate data generation)."""
    def run(centers, radii, colors, room_radius, cam_pos, cam_rot):
        class _S:  # lightweight scene namespace for _render_impl
            pass
        s = _S()
        s.centers, s.radii, s.colors = centers, radii, colors
        s.room_radius = room_radius
        return _render_impl(s, cam_pos, cam_rot, height, width,
                            get_convention(conv_name))
    return jax.jit(run, static_argnames=())


def render_panorama(scene: SphereScene, cam_pos: Array, cam_rot: Array,
                    height: int, width: int,
                    convention: SphereConvention | str = "m3d") -> tuple:
    """Jitted entry point; see :func:`_render_impl` for the math."""
    name = convention if isinstance(convention, str) else convention.name
    fn = _render_jit(height, width, name)
    return fn(scene.centers, scene.radii, scene.colors,
              jnp.asarray(scene.room_radius, jnp.float32),
              jnp.asarray(cam_pos, jnp.float32),
              jnp.asarray(cam_rot, jnp.float32))


def trace_rays(scene, cam_pos: Array, dirs_w: Array) -> tuple:
    """Trace unit world-frame rays against the scene.

    :param dirs_w: (H, W, 3) unit directions in world frame.
    :return: (rgb (H, W, 3), distance (H, W)) — euclidean hit distance.
    """
    ts = jax.vmap(lambda c, r: _ray_sphere(cam_pos, dirs_w, c, r))(
        scene.centers, scene.radii)                     # (N, H, W)
    t_room = _ray_sphere(cam_pos, dirs_w, jnp.zeros(3),
                         jnp.asarray(scene.room_radius))
    all_t = jnp.concatenate([ts, t_room[None]], axis=0)
    idx = jnp.argmin(all_t, axis=0)                     # (H, W)
    t = jnp.min(all_t, axis=0)

    hit_pts = cam_pos + dirs_w * t[..., None]
    # colors: sphere flat color shaded by normal·light; room textured.
    normals = (hit_pts[None] - scene.centers[:, None, None]) \
        / scene.radii[:, None, None, None]
    light = jnp.asarray([0.4, 0.8, 0.45])
    light = light / jnp.linalg.norm(light)
    shade = 0.55 + 0.45 * jnp.clip(
        jnp.einsum("nhwi,i->nhw", normals, light), 0.0, 1.0)
    obj_rgb = scene.colors[:, None, None, :] * shade[..., None]
    room_rgb = _room_texture(dirs_w)
    all_rgb = jnp.concatenate([obj_rgb, room_rgb[None]], axis=0)
    rgb = jnp.take_along_axis(
        all_rgb, idx[None, ..., None].repeat(3, -1), axis=0)[0]
    return rgb, t


def _render_impl(scene, cam_pos: Array, cam_rot: Array,
                 height: int, width: int,
                 convention: SphereConvention | str = "m3d") -> tuple:
    """Ray-trace one ERP view.

    :param cam_pos: (3,) world position; cam_rot: (3, 3) world-from-camera
        rotation (c2w).  World-to-camera is x_cam = R^T (x_w - p).
    :return: (rgb (H, W, 3), distance (H, W, 1)).
    """
    conv = get_convention(convention) if isinstance(convention, str) \
        else convention
    dirs_cam = conv.ray_directions(height, width)
    dirs_w = jnp.einsum("ij,hwj->hwi", cam_rot, dirs_cam)
    rgb, t = trace_rays(scene, cam_pos, dirs_w)
    return rgb, t[..., None]


@functools.lru_cache(maxsize=8)
def _render_cube_jit(face_w: int):
    from panogrf_tpu.data.database import (cube_face_rotations,
                                           cube_intrinsics)
    k_inv = np.linalg.inv(cube_intrinsics(face_w))
    # integer pixel coords (align-corners grid, cx = (w-1)/2 like the
    # reference cube cameras, ``dataset/database.py:99-108``)
    u, v = np.meshgrid(np.arange(face_w, dtype=np.float32),
                       np.arange(face_w, dtype=np.float32))
    hom = np.stack([u, v, np.ones_like(u)], axis=-1)     # (fw, fw, 3)
    dirs_face = np.einsum("ij,hwj->hwi", k_inv, hom)
    dirs_face /= np.linalg.norm(dirs_face, axis=-1, keepdims=True)
    face_r = cube_face_rotations()                        # x_cam = R_f x_face
    dirs_cam = np.einsum("fij,hwj->fhwi", face_r, dirs_face)
    dirs_cam_j = jnp.asarray(dirs_cam, jnp.float32)       # (6, fw, fw, 3)
    dz = jnp.asarray(dirs_face[..., 2:3], jnp.float32)    # cos to face axis

    def run(centers, radii, colors, room_radius, cam_pos, cam_rot):
        class _S:
            pass
        s = _S()
        s.centers, s.radii, s.colors = centers, radii, colors
        s.room_radius = room_radius
        dirs_w = jnp.einsum("ij,fhwj->fhwi", cam_rot, dirs_cam_j)
        rgb, t = jax.vmap(lambda d: trace_rays(s, cam_pos, d))(dirs_w)
        # z-depth = distance along the face optical axis (what habitat's
        # perspective depth sensor records and the LMDB stores for
        # ``depth_cubes``)
        zdepth = t[..., None] * dz[None]
        return rgb, zdepth

    return jax.jit(run)


def render_cube_faces(scene: SphereScene, cam_pos: Array, cam_rot: Array,
                      face_w: int) -> tuple:
    """Ray-trace the 6 cube faces of a view (habitat cube-sensor analogue).

    Faces follow the [F R B L U D] layout of ``core/cubemap.py`` with the
    90° pinhole of ``data/database.py:cube_intrinsics``; depth is z-depth
    (distance along each face's optical axis), matching what the reference
    pipeline stores in ``depth_cubes`` (``lmdb_write_render.py:225-231``).

    :param cam_rot: (3, 3) camera-to-world rotation of the PANO camera.
    :return: (rgb (6, fw, fw, 3), zdepth (6, fw, fw, 1)).
    """
    fn = _render_cube_jit(face_w)
    return fn(scene.centers, scene.radii, scene.colors,
              jnp.asarray(scene.room_radius, jnp.float32),
              jnp.asarray(cam_pos, jnp.float32),
              jnp.asarray(cam_rot, jnp.float32))


def make_multi_view_sample(scene: SphereScene, height: int, width: int,
                           num_views: int, spacing: float = 0.5,
                           seed: int = 0, convention: str = "m3d") -> dict:
    """V-view variant of the 3-view protocol (reference ``*_mv`` data
    twins): cameras spaced along the shared z axis, common yaw."""
    rng = np.random.default_rng(seed)
    yaw = rng.uniform(0, 2 * np.pi)
    cy, sy = np.cos(yaw), np.sin(yaw)
    rot_c2w = jnp.asarray([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]],
                          jnp.float32)
    base = jnp.asarray(rng.uniform(-1.0, 1.0, size=3), jnp.float32)
    z_axis = rot_c2w[:, 2]
    offsets = (np.arange(num_views) - (num_views - 1) / 2.0) * spacing
    rgbs, depths, rots, trans = [], [], [], []
    for off in offsets:
        p = base + float(off) * z_axis
        rgb, d = render_panorama(scene, p, rot_c2w, height, width,
                                 convention)
        rgbs.append(rgb)
        depths.append(d)
        r_w2c = rot_c2w.T
        rots.append(r_w2c)
        trans.append(-r_w2c @ p)
    return {"rgb_panos": jnp.stack(rgbs), "depth_panos": jnp.stack(depths),
            "rots": jnp.stack(rots), "trans": jnp.stack(trans)}


def make_three_view_sample(scene: SphereScene, height: int, width: int,
                           m3d_dist: float = 0.5, seed: int = 0,
                           convention: str = "m3d") -> dict:
    """Reproduce the habitat 3-position protocol (reference
    ``create_rgb_dataset.py:260-429``): positions offset +-m3d_dist along
    the camera z axis, reference view (index 1) at the origin with identity
    rotation (pose normalization at ``:370-399``).

    :return: dict rgb_panos (3, H, W, 3), depth_panos (3, H, W, 1),
        rots (3, 3, 3) w2c, trans (3, 3) w2c.
    """
    rng = np.random.default_rng(seed)
    yaw = rng.uniform(0, 2 * np.pi)
    cy, sy = np.cos(yaw), np.sin(yaw)
    rot_c2w = jnp.asarray([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]],
                          jnp.float32)
    base = jnp.asarray(rng.uniform(-1.0, 1.0, size=3), jnp.float32)
    z_axis = rot_c2w[:, 2]
    positions = [base - m3d_dist * z_axis, base, base + m3d_dist * z_axis]

    rgbs, depths, rots, trans = [], [], [], []
    for p in positions:
        rgb, d = render_panorama(scene, p, rot_c2w, height, width,
                                 convention)
        rgbs.append(rgb)
        depths.append(d)
        # w2c: x_cam = R_c2w^T (x_w - p) => rot = R^T, t = -R^T p
        r_w2c = rot_c2w.T
        rots.append(r_w2c)
        trans.append(-r_w2c @ p)
    return {
        "rgb_panos": jnp.stack(rgbs),
        "depth_panos": jnp.stack(depths),
        "rots": jnp.stack(rots),
        "trans": jnp.stack(trans),
    }
