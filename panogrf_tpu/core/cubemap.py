"""ERP <-> cubemap resampling as precomputed gather grids.

TPU-native replacement for the reference's two-library split:
* ``Equirec2Cube`` (reference ``UniFuse-Unidirectional-Fusion/UniFuse/datasets/
  util.py:7-100``) runs scipy ``map_coordinates`` on the **CPU** per sample —
  the round-trip the reference even performs mid-forward-pass at
  ``network/omni_mvsnet/pipeline3_model.py:266-283``.
* ``Cube2Equirec`` (reference ``UniFuse…/networks/layers.py:71-159``) uses a
  3D ``grid_sample`` over a (6, fw, fw) volume.

Here both directions are pure device-side gathers: the sampling grids are
static functions of (H, W, face_w) computed once with numpy (they become XLA
constants), and the resampling itself is a 4-tap bilinear gather that XLA
fuses with surrounding ops.  Face order is [F R B L U D] and all pixel-center
conventions match py360convert so converted UniFuse checkpoints see an
identical cube layout.

Layouts: cube tensors are (6, fw, fw, C) ("stacked") with helpers to convert
to the reference's horizontal strip (fw, 6*fw, C).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.ops.resample import bilinear_sample

Array = jax.Array


@functools.lru_cache(maxsize=32)
def _e2c_grid(equ_h: int, equ_w: int, face_w: int):
    """ERP pixel coords (6, fw, fw, 2) for each cube-face pixel.

    Matches reference ``datasets/util.py:_xyzcube/_xyz2coor`` including the
    half-pixel offsets.
    """
    rng = np.linspace(-0.5, 0.5, num=face_w, dtype=np.float64)
    gx, gy = np.meshgrid(rng, -rng)  # (fw, fw); gy flipped like reference

    xyz = np.zeros((6, face_w, face_w, 3), np.float64)
    xyz[0, ..., 0], xyz[0, ..., 1], xyz[0, ..., 2] = gx, gy, 0.5          # F
    xyz[1, ..., 2], xyz[1, ..., 1], xyz[1, ..., 0] = -gx, gy, 0.5         # R
    xyz[2, ..., 0], xyz[2, ..., 1], xyz[2, ..., 2] = -gx, gy, -0.5        # B
    xyz[3, ..., 2], xyz[3, ..., 1], xyz[3, ..., 0] = gx, gy, -0.5         # L
    xyz[4, ..., 0], xyz[4, ..., 2], xyz[4, ..., 1] = np.flipud(gx), np.flipud(gy), 0.5   # U
    xyz[5, ..., 0], xyz[5, ..., 2], xyz[5, ..., 1] = gx, gy, -0.5         # D

    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lon = np.arctan2(x, z)
    lat = np.arctan2(y, np.sqrt(x * x + z * z))
    coor_x = (lon / (2 * np.pi) + 0.5) * equ_w - 0.5
    coor_y = (-lat / np.pi + 0.5) * equ_h - 0.5
    # NOTE: cached grids must be numpy — jnp constants created inside a jit
    # trace are tracers in jax>=0.9 and caching them leaks across traces.
    return np.stack([coor_x, coor_y], axis=-1).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _c2e_grid(face_w: int, equ_h: int, equ_w: int):
    """(face index (H, W) int32, face pixel coords (H, W, 2)) per ERP pixel.

    Face assignment + gnomonic uv from reference
    ``networks/layers.py:90-145`` (py360convert).
    """
    if equ_w % 4 != 0:
        raise ValueError(
            f"cube_to_equi requires ERP width divisible by 4, got {equ_w}")
    tp = np.roll(np.arange(4).repeat(equ_w // 4)[None, :].repeat(equ_h, 0),
                 3 * equ_w // 8, 1)
    mask = np.zeros((equ_h, equ_w // 4), bool)
    idx = np.linspace(-np.pi, np.pi, equ_w // 4) / 4
    idx = equ_h // 2 - np.round(np.arctan(np.cos(idx)) * equ_h / np.pi).astype(int)
    for i, j in enumerate(idx):
        mask[:j, i] = 1
    mask = np.roll(np.concatenate([mask] * 4, 1), 3 * equ_w // 8, 1)
    tp[mask] = 4
    tp[np.flip(mask, 0)] = 5

    lon = ((np.linspace(0, equ_w - 1, num=equ_w, dtype=np.float64) + 0.5)
           / equ_w - 0.5) * 2 * np.pi
    lat = -((np.linspace(0, equ_h - 1, num=equ_h, dtype=np.float64) + 0.5)
            / equ_h - 0.5) * np.pi
    lon, lat = np.meshgrid(lon, lat)

    coor_u = np.zeros((equ_h, equ_w), np.float64)
    coor_v = np.zeros((equ_h, equ_w), np.float64)
    for i in range(4):
        m = tp == i
        coor_u[m] = 0.5 * np.tan(lon[m] - np.pi * i / 2)
        coor_v[m] = -0.5 * np.tan(lat[m]) / np.cos(lon[m] - np.pi * i / 2)
    m = tp == 4
    c = 0.5 * np.tan(np.pi / 2 - lat[m])
    coor_u[m] = c * np.sin(lon[m])
    coor_v[m] = c * np.cos(lon[m])
    m = tp == 5
    c = 0.5 * np.tan(np.pi / 2 - np.abs(lat[m]))
    coor_u[m] = c * np.sin(lon[m])
    coor_v[m] = -c * np.cos(lon[m])

    coor_u = np.clip(coor_u, -0.5, 0.5) * 2  # [-1, 1]
    coor_v = np.clip(coor_v, -0.5, 0.5) * 2
    # align_corners=True: [-1, 1] -> [0, fw-1]
    px = (coor_u + 1.0) * 0.5 * (face_w - 1)
    py = (coor_v + 1.0) * 0.5 * (face_w - 1)
    return (tp.astype(np.int32),
            np.stack([px, py], axis=-1).astype(np.float32))


@functools.lru_cache(maxsize=32)
def zdepth_cosine(face_w: int) -> Array:
    """Per-face-pixel cos factor converting radial distance to z-depth.

    cube_zdepth = distance * cos; reference ``datasets/util.py:22-24``.
    Shape (fw, fw), identical for every face.
    """
    rng = np.linspace(-0.5, 0.5, num=face_w, dtype=np.float64)
    gx, gy = np.meshgrid(rng, -rng)
    cos = 1.0 / np.sqrt((2 * gx) ** 2 + (2 * gy) ** 2 + 1)
    return np.asarray(cos, dtype=np.float32)


def equi_to_cube(equi: Array, face_w: int) -> Array:
    """Resample an ERP image (H, W, C) into a cubemap (6, fw, fw, C).

    Bilinear, longitude-wrapping.  Device-side replacement for the CPU
    ``Equirec2Cube.run`` (reference ``datasets/util.py:81-100``).
    """
    h, w, _ = equi.shape
    grid = jnp.asarray(_e2c_grid(h, w, face_w))  # (6, fw, fw, 2)
    return bilinear_sample(equi, grid, wrap_x=True)


def cube_to_equi(cube: Array, equ_h: int, equ_w: int) -> Array:
    """Resample a cubemap (6, fw, fw, C) to ERP (equ_h, equ_w, C).

    Bilinear within the selected face (border clamp), matching reference
    ``Cube2Equirec.forward`` with padding_mode='border' — the nearest-face
    selection means the 4 taps never cross a face boundary.
    """
    six, fw, fw2, c = cube.shape
    assert six == 6 and fw == fw2
    tp_np, pxy_np = _c2e_grid(fw, equ_h, equ_w)
    tp, pxy = jnp.asarray(tp_np), jnp.asarray(pxy_np)
    # Flatten faces into one tall image (6*fw, fw, C) and offset y by face.
    tall = cube.reshape(6 * fw, fw, c)
    # Clamp in-face coords so bilinear taps stay inside the face row block.
    px = jnp.clip(pxy[..., 0], 0.0, fw - 1.0)
    py = jnp.clip(pxy[..., 1], 0.0, fw - 1.0) + tp.astype(jnp.float32) * fw
    xy = jnp.stack([px, py], axis=-1)
    return bilinear_sample(tall, xy, wrap_x=False, pad_mode="border")


def stacked_to_strip(cube: Array) -> Array:
    """(6, fw, fw, C) -> horizontal strip (fw, 6*fw, C) [F R B L U D]."""
    return jnp.concatenate(list(cube), axis=1)


def strip_to_stacked(strip: Array, face_w: int) -> Array:
    """(fw, 6*fw, C) -> (6, fw, fw, C)."""
    fw = face_w
    return jnp.stack(jnp.split(strip, 6, axis=1), axis=0)
