"""Bilinear resampling primitives for ERP feature maps.

These replace every ``torch.nn.functional.grid_sample`` call in the reference
(``network/ops.py:32-52`` ``interpolate_feats``, the cost-volume warp at
``models/spherical_cost_volume.py:193-197``, cube/tangent resampling).

Design notes (TPU):
* Sampling is a gather over the H*W-flattened map plus a 4-tap weighted sum.
  XLA lowers this to an efficient dynamic-gather; for the hot paths (cost
  volume sweep, per-ray rendering) fused Pallas kernels in
  ``panogrf_tpu.ops.pallas`` build on the same index math.
* Channel-last layout ``(H, W, C)`` everywhere: the channel axis maps to TPU
  lanes so the 4-tap blend is a VPU op across C.
* Longitude wraps (``wrap_x=True``): the correct spherical topology, unlike
  the reference which leaks zeros/border values across the seam.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _gather_hw(img: Array, iy: Array, ix: Array) -> Array:
    """Gather pixels from (H, W, C) at integer indices iy/ix of shape (...,)."""
    h, w, _ = img.shape
    flat = img.reshape(h * w, -1)
    idx = iy * w + ix
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, -1)


def bilinear_sample(img: Array, xy: Array, *, wrap_x: bool = True,
                    pad_mode: str = "border") -> Array:
    """Bilinearly sample ``img`` (H, W, C) at pixel coords ``xy`` (..., 2).

    Coordinates are in pixel units with ``align_corners=True`` semantics:
    x = 0 is the center of the first column, x = W-1 of the last (matching
    reference ``network/ops.py:interpolate_feats`` with align_corners=True).

    :param wrap_x: treat x as periodic with period W (ERP longitude).
    :param pad_mode: 'border' clamps y (and x when not wrapping); 'zeros'
        zeroes out-of-range taps like grid_sample's padding_mode='zeros'.
    :return: (..., C) sampled features.
    """
    h, w, _ = img.shape
    x, y = xy[..., 0], xy[..., 1]

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = x - x0f
    ty = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if wrap_x:
        x0w = jnp.mod(x0, w)
        x1w = jnp.mod(x1, w)
    else:
        x0w = jnp.clip(x0, 0, w - 1)
        x1w = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)

    v00 = _gather_hw(img, y0c, x0w)
    v01 = _gather_hw(img, y0c, x1w)
    v10 = _gather_hw(img, y1c, x0w)
    v11 = _gather_hw(img, y1c, x1w)

    tx = tx[..., None]
    ty = ty[..., None]
    out = ((v00 * (1 - tx) + v01 * tx) * (1 - ty)
           + (v10 * (1 - tx) + v11 * tx) * ty)

    if pad_mode == "zeros":
        valid_y = (y >= -1.0) & (y <= h * 1.0)
        in_y = ((y0 >= 0) | (y1 <= h - 1)) & valid_y
        mask = in_y
        if not wrap_x:
            mask = mask & (x >= -1.0) & (x <= w * 1.0)
        out = out * mask[..., None].astype(out.dtype)
    return out


def batched_bilinear_sample(imgs: Array, xy: Array, **kw) -> Array:
    """vmap of :func:`bilinear_sample` over a leading batch axis.

    :param imgs: (B, H, W, C)
    :param xy:   (B, ..., 2)
    :return:     (B, ..., C)
    """
    return jax.vmap(functools.partial(bilinear_sample, **kw))(imgs, xy)


def interpolate_feats(feats: Array, points: Array, h: int | None = None,
                      w: int | None = None, *, wrap_x: bool = True,
                      pad_mode: str = "border") -> Array:
    """Sample feature maps at pixel coordinates given in a *reference* frame.

    TPU-native equivalent of reference ``network/ops.py:32-52``: ``points``
    are pixel coordinates in an (h, w) image; if the feature map has a
    different resolution the coordinates are rescaled (this is how the
    renderer samples 1/4-res ray features with full-res coords, reference
    ``network/render_ops.py:126-143``).

    :param feats:  (B, fh, fw, C) channel-last feature maps.
    :param points: (B, N, 2) pixel coords in the (h, w) frame.
    """
    b, fh, fw, _ = feats.shape
    if h is None and w is None:
        h, w = fh, fw
    if fh != h or fw != w:
        scale = jnp.asarray([(fw - 1.0) / (w - 1.0), (fh - 1.0) / (h - 1.0)],
                            dtype=points.dtype)
        points = points * scale
    return batched_bilinear_sample(feats, points, wrap_x=wrap_x,
                                   pad_mode=pad_mode)


def resize_bilinear(img: Array, out_hw: tuple, *, channel_axis: int = -1) -> Array:
    """Bilinear resize via jax.image (half-pixel centers), channel-last."""
    if channel_axis != -1:
        raise NotImplementedError("channel-last only")
    *lead, h, w, c = img.shape
    return jax.image.resize(img, (*lead, *out_hw, c), method="bilinear")
