"""Panorama training augmentations.

Reference ``data_readers/habitat_data_neuray_ft_lmdb.py:56-84,112-194``:
yaw roll (circular longitude shift with consistent pose rotation),
left-right flip, and photometric jitter (gamma / brightness / color,
``habitat_data_neuray_ft.py:617-629``).  All jnp, batched over views so the
same transform applies consistently to every view of a sample.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def yaw_roll(sample: dict, shift_px: int) -> dict:
    """Circularly shift all panos by ``shift_px`` columns and rotate the
    world by the same yaw so poses stay consistent."""
    w = sample["rgb_panos"].shape[2]
    ang = 2.0 * math.pi * shift_px / w
    c, s = math.cos(ang), math.sin(ang)
    # m3d convention: yaw about the +y axis
    r_yaw = jnp.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]],
                        jnp.float32)
    out = dict(sample)
    out["rgb_panos"] = jnp.roll(sample["rgb_panos"], shift_px, axis=2)
    out["depth_panos"] = jnp.roll(sample["depth_panos"], shift_px, axis=2)
    # w2c' = R_cam_shift @ w2c: shifting pixels = rotating the camera.
    out["rots"] = jnp.einsum("ij,vjk->vik", r_yaw, sample["rots"])
    return out


def photometric_jitter(sample: dict, rng: jax.Array,
                       gamma_range=(0.8, 1.2), bright_range=(0.8, 1.2),
                       color_range=(0.9, 1.1)) -> dict:
    """Consistent gamma/brightness/per-channel color jitter across views."""
    k1, k2, k3 = jax.random.split(rng, 3)
    gamma = jax.random.uniform(k1, (), minval=gamma_range[0],
                               maxval=gamma_range[1])
    bright = jax.random.uniform(k2, (), minval=bright_range[0],
                                maxval=bright_range[1])
    color = jax.random.uniform(k3, (3,), minval=color_range[0],
                               maxval=color_range[1])
    out = dict(sample)
    rgb = jnp.clip(sample["rgb_panos"], 1e-4, 1.0)
    rgb = rgb ** gamma * bright * color
    out["rgb_panos"] = jnp.clip(rgb, 0.0, 1.0)
    return out


def augment_sample(sample: dict, rng: jax.Array,
                   max_shift: int | None = None) -> dict:
    """Full training augmentation: yaw roll + photometric jitter.

    (Left-right flip is intentionally excluded by default: it mirrors the
    world and requires flipping pose handedness; the reference applies it
    only in the LMDB depth-training path.)
    """
    w = sample["rgb_panos"].shape[2]
    k1, k2 = jax.random.split(rng)
    shift = int(jax.random.randint(k1, (), 0, max_shift or w))
    out = yaw_roll(sample, shift)
    return photometric_jitter(out, k2)


def jitter_rotation(rot: "np.ndarray", rng, angle_deg: float = 30.0):
    """Pose jitter: perturb each Euler angle of a rotation by
    U(-angle/2, +angle/2) degrees (reference ``mutils/jitter.py:6-18``,
    the legacy SynSin augmentation — optional, off by default).

    :param rot: (3, 3) rotation matrix; :param rng: np.random.Generator.
    :return: jittered (3, 3) rotation matrix.
    """
    import numpy as np

    # zyz Euler angles (matches quaternion.as_euler_angles convention)
    def to_euler(r):
        beta = np.arccos(np.clip(r[2, 2], -1.0, 1.0))
        if abs(r[2, 2]) > 1 - 1e-8:
            return np.asarray([np.arctan2(r[1, 0], r[0, 0]), beta, 0.0])
        alpha = np.arctan2(r[1, 2], r[0, 2])
        gamma = np.arctan2(r[2, 1], -r[2, 0])
        return np.asarray([alpha, beta, gamma])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    e = to_euler(np.asarray(rot, np.float64))
    e = e + (rng.random(3) - 0.5) * np.pi * angle_deg / 180.0
    return (rz(e[0]) @ ry(e[1]) @ rz(e[2])).astype(np.float32)
