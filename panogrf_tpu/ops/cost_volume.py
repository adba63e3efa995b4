"""Spherical-sweep cost volume (vectorized warp-and-diff).

TPU-native replacement for reference ``models/spherical_cost_volume.py:
231-341`` which loops in Python over D=64 depth hypotheses issuing one
``grid_sample`` each (the reference's hottest loop, SURVEY §3.1).  Here the
whole (D, H, W) sweep is a single batched gather expression that XLA fuses
(measured: the XLA gather path beats a hand-written Pallas sweep kernel at
these shapes, so no custom kernel ships for this op).

Geometry (reference ``get_cv_per_depth``, ``spherical_cost_volume.py:
135-230``): for each ref pixel with unit direction d and hypothesis depth t,
the world point is R_ref^-1 ((t*d) - t_ref); its source-camera position is
R_src w + t_src; re-projected to ERP uv via the dataset convention and
sampled bilinearly from the source feature map.  Cost is ``abs_diff`` (or
``dot``) against the reference feature map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from panogrf_tpu.core.sphere import SphereConvention
from panogrf_tpu.ops.resample import (bilinear_sample,
                                      make_mm_backward_sampler)

Array = jax.Array

# The sweep's backward wrt src features is a 33.6M-point scatter-add at
# the full recipe — XLA serializes TPU scatters, measured 130x the
# forward (tools/profile_mvs.py; it was ~3.3 s of the 4.34 s MVS train
# step).  The matmul-backward sampler turns that transpose into dense
# MXU contractions with IDENTICAL gradients (tests/test_resample.py);
# uv is pure geometry here (frozen mono depth + poses), so its zero
# cotangent is exact, not an approximation.
_sweep_sample = make_mm_backward_sampler(wrap_x=True, pad_mode="border")


def sweep_coordinates(depth_volume: Array, dirs: Array, rot_ref: Array,
                      tran_ref: Array, rot_src: Array, tran_src: Array,
                      convention: SphereConvention, height: int,
                      width: int) -> tuple:
    """Project ref-view sweep points into the source ERP view.

    :param depth_volume: (D, H, W) per-pixel hypothesis depths (ref view).
    :param dirs: (H, W, 3) unit ray directions of the ref camera (pixel
        centers, matching the reference's cost-volume grid).
    :param rot_ref/tran_ref: ref world-to-camera (x_cam = R x_w + t).
    :param rot_src/tran_src: src world-to-camera.
    :return: (uv (D, H, W, 2) source pixel coords, src_depth (D, H, W)).
    """
    pts_ref = depth_volume[..., None] * dirs  # (D, H, W, 3) ref cam frame
    # cam -> world: w = R_ref^T (p - t_ref)
    w = jnp.einsum("ji,dhwj->dhwi", rot_ref, pts_ref - tran_ref)
    # world -> src cam
    c = jnp.einsum("ij,dhwj->dhwi", rot_src, w) + tran_src
    uv, depth = convention.project_to_pixels(c, height, width, mode="center")
    return uv, depth


def spherical_sweep_cost(ref_feats: Array, src_feats: Array,
                         depth_volume: Array, rot_ref: Array, tran_ref: Array,
                         rot_src: Array, tran_src: Array,
                         convention: SphereConvention,
                         cost_type: str = "abs_diff",
                         mm_backward: bool = True) -> Array:
    """Cost volume for one (ref, src) pair.

    :param ref_feats: (H, W, C) reference feature map.
    :param src_feats: (H, W, C) source feature map.
    :param depth_volume: (D, H, W) hypothesis depths.
    :param mm_backward: route the warp's feature gradient through the
        dense-matmul transpose instead of XLA's serialized scatter (same
        gradients; see ``_sweep_sample``).  Disable only to reproduce the
        scatter path for measurement.
    :return: (D, H, W, C) cost volume.
    """
    h, w, _ = ref_feats.shape
    uv, _ = sweep_coordinates(depth_volume, dirs_for(convention, h, w),
                              rot_ref, tran_ref, rot_src, tran_src,
                              convention, h, w)
    sample = _sweep_sample if mm_backward else (
        lambda f, q: bilinear_sample(f, q, wrap_x=True))
    warped = sample(src_feats, uv)                        # (D, H, W, C)
    if cost_type == "abs_diff":
        return jnp.abs(warped - ref_feats[None])
    if cost_type == "dot":
        return warped * ref_feats[None]
    if cost_type == "none":
        return warped
    raise ValueError(f"unknown cost type {cost_type!r}")


def dirs_for(convention: SphereConvention, h: int, w: int) -> Array:
    """Pixel-center unit ray directions (reference sweep grid)."""
    return convention.ray_directions(h, w, mode="center")


def batched_sweep_cost(ref_feats: Array, src_feats: Array,
                       depth_volume: Array, rots: Array, trans: Array,
                       convention: SphereConvention,
                       cost_type: str = "abs_diff") -> Array:
    """Batched two-view cost volume matching the reference input layout.

    :param ref_feats: (B, H, W, C); :param src_feats: (B, H, W, C)
    :param depth_volume: (B, D, H, W)
    :param rots: (B, 2, 3, 3) w2c rotations, index 0 = src, 1 = ref.
    :param trans: (B, 2, 3) w2c translations.
    :return: (B, D, H, W, C)
    """
    def one(rf, sf, dv, rot, tr):
        return spherical_sweep_cost(rf, sf, dv, rot[1], tr[1], rot[0], tr[0],
                                    convention, cost_type)
    return jax.vmap(one)(ref_feats, src_feats, depth_volume, rots, trans)
