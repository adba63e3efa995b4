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

    ts = jax.vmap(lambda c, r: _ray_sphere(cam_pos, dirs_w, c, r))(
        scene.centers, scene.radii)                     # (N, H, W)
    t_room = _ray_sphere(cam_pos, dirs_w, jnp.zeros(3),
                         jnp.asarray(scene.room_radius))
    all_t = jnp.concatenate([ts, t_room[None]], axis=0)
    idx = jnp.argmin(all_t, axis=0)                     # (H, W)
    t = jnp.min(all_t, axis=0)

    hit_pts = cam_pos + dirs_w * t[..., None]
    # colors: sphere flat color shaded by normal·light; room textured.
    n_obj = scene.centers.shape[0]
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
    return rgb, t[..., None]


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
