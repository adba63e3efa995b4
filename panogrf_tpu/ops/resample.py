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


def _gather_2x2(img_padded: Array, y0: Array, x0: Array) -> Array:
    """Fetch the 2x2 bilinear window per point with ONE lax.gather.

    TPU gathers are latency-bound per gather row, so fetching the whole
    (2, 2, C) window in a single gather is ~4x cheaper than 4 separate
    single-pixel gathers (the naive formulation).

    :param img_padded: (H+1, W+1, C) — last row/col pre-filled so the 2x2
        slice at (y0, x0) with y0<=H-1, x0<=W-1 is always in bounds.
    :param y0/x0: (...,) int32.
    :return: (..., 2, 2, C).
    """
    start = jnp.stack([y0.reshape(-1), x0.reshape(-1)], axis=-1)
    c = img_padded.shape[-1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    out = jax.lax.gather(
        img_padded, start, dn, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP)
    return out.reshape(*y0.shape, 2, 2, c)


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

    if wrap_x:
        x = jnp.mod(x, 1.0 * w)
    else:
        x = jnp.clip(x, 0.0, w - 1.0)
    y_clamped = jnp.clip(y, 0.0, h - 1.0)   # border semantics pre-floor
    x0f = jnp.floor(x)
    y0f = jnp.floor(y_clamped)
    tx = x - x0f
    ty = y_clamped - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # Pad one row (clamp) and one column (wrap or clamp) so the 2x2 window
    # starting at (y0, x0) is always in bounds after index clipping.
    col = img[:, :1] if wrap_x else img[:, -1:]
    imgp = jnp.concatenate([img, col], axis=1)
    imgp = jnp.concatenate([imgp, imgp[-1:]], axis=0)

    if not wrap_x:
        x0 = jnp.clip(x0, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    win = _gather_2x2(imgp, y0c, x0)           # (..., 2, 2, C)

    tx = tx[..., None].astype(img.dtype)   # keep bf16 paths bf16
    ty = ty[..., None].astype(img.dtype)
    top = win[..., 0, 0, :] * (1 - tx) + win[..., 0, 1, :] * tx
    bot = win[..., 1, 0, :] * (1 - tx) + win[..., 1, 1, :] * tx
    out = top * (1 - ty) + bot * ty

    if pad_mode == "zeros":
        y1 = y0 + 1
        valid_y = (y >= -1.0) & (y <= h * 1.0)
        in_y = ((y0 >= 0) | (y1 <= h - 1)) & valid_y
        mask = in_y
        if not wrap_x:
            mask = mask & (xy[..., 0] >= -1.0) & (xy[..., 0] <= w * 1.0)
        out = out * mask[..., None].astype(out.dtype)
    return out


def _bilinear_taps(x: Array, y: Array, h: int, w: int, wrap_x: bool):
    """Shared tap/weight math of ``bilinear_sample`` (border-y semantics):
    returns int32 (x0, x1, y0, y1) effective indices and (tx, ty) weights
    such that out = Σ taps — exactly the forward's padded-window reads."""
    if wrap_x:
        x = jnp.mod(x, 1.0 * w)
    else:
        x = jnp.clip(x, 0.0, w - 1.0)
    yc = jnp.clip(y, 0.0, h - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(yc)
    tx = x - x0f
    ty = yc - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    if wrap_x:
        x1 = jnp.mod(x0 + 1, w)          # padded col W == col 0
    else:
        x0 = jnp.clip(x0, 0, w - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)  # padded col W == col W-1
    y1 = jnp.minimum(y0 + 1, h - 1)      # padded row H == row H-1
    return x0, x1, y0, y1, tx, ty


def _bilinear_grad_img(g: Array, xy: Array, h: int, w: int,
                       wrap_x: bool, chunk: int = 8192) -> Array:
    """d(bilinear_sample)/d(img) as DENSE MXU contractions — no scatter.

    The mathematical transpose of the 4-tap gather is a scatter-add,
    which XLA serializes on TPU (measured: the cost-volume sweep's
    backward ran 130x its forward, ~3.3 s of the 4.34 s MVS train step).
    Because bilinear weights factor per axis, the scatter equals

        grad_img[y, x, c] = sum_q By[q, y] * Bx[q, x] * g[q, c]

    with By/Bx the 2-hot per-point row/col weight matrices — two chunked
    matmuls (K = points) that the MXU eats.  Exact same accumulation as
    the scatter (duplicate taps sum), verified bit-close in
    tests/test_resample.py.

    :param g: (..., C) cotangent of the sampled output.
    :param xy: (..., 2) the forward's sample coords.
    :return: (h, w, C) gradient wrt the image, float32.
    """
    c = g.shape[-1]
    gf = g.reshape(-1, c).astype(jnp.float32)
    x = xy[..., 0].reshape(-1)
    y = xy[..., 1].reshape(-1)
    x0, x1, y0, y1, tx, ty = _bilinear_taps(x, y, h, w, wrap_x)
    n = gf.shape[0]
    s = min(chunk, n)
    pad = (-n) % s
    if pad:
        zf32 = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        gf, tx, ty = zf32(gf), zf32(tx), zf32(ty)
        zi = lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
        x0, x1, y0, y1 = zi(x0), zi(x1), zi(y0), zi(y1)
    k = (n + pad) // s
    resh = lambda a: a.reshape(k, s, *a.shape[1:])
    xs = tuple(map(resh, (gf, x0, x1, y0, y1,
                          tx.astype(jnp.float32), ty.astype(jnp.float32))))

    def body(acc, args):
        gq, x0q, x1q, y0q, y1q, txq, tyq = args
        by = (jax.nn.one_hot(y0q, h, dtype=jnp.float32)
              * (1.0 - tyq)[:, None]
              + jax.nn.one_hot(y1q, h, dtype=jnp.float32) * tyq[:, None])
        bx = (jax.nn.one_hot(x0q, w, dtype=jnp.float32)
              * (1.0 - txq)[:, None]
              + jax.nn.one_hot(x1q, w, dtype=jnp.float32) * txq[:, None])
        tmp = by[:, :, None] * gq[:, None, :]            # (s, h, c)
        return acc + jnp.einsum("qx,qhc->hxc", bx, tmp), None

    acc0 = jnp.zeros((h, w, c), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, xs)
    return out


def make_mm_backward_sampler(wrap_x: bool = True, pad_mode: str = "border"):
    """``bilinear_sample`` with the matmul backward of
    :func:`_bilinear_grad_img` wrt the image and a ZERO cotangent for the
    coordinates.

    Use where the sample coords carry no trainable dependence (the MVS
    cost-volume sweep: uv is pure geometry of the frozen mono depth and
    the poses, ``models/mvs.py``).  Differentiating the returned function
    wrt ``xy`` silently yields zeros — do NOT use it for coord-optimizing
    paths.  Forward is bit-identical to ``bilinear_sample``.
    """
    def fwd(img, xy):
        return bilinear_sample(img, xy, wrap_x=wrap_x, pad_mode=pad_mode)

    @jax.custom_vjp
    def sample(img, xy):
        return fwd(img, xy)

    def sample_fwd(img, xy):
        # residuals must be arrays: a zero-size strut carries the image's
        # static shape/dtype into the backward
        strut = jnp.zeros(img.shape[:2] + (0,), img.dtype)
        return fwd(img, xy), (xy, strut)

    def sample_bwd(res, g):
        xy, strut = res
        dt = strut.dtype
        h, w, _ = strut.shape
        if pad_mode == "zeros":
            # the forward multiplies its out-of-range mask INTO the
            # output, so the image cotangent needs the same factor;
            # sampling a ones-image reproduces the mask exactly (the
            # bilinear weights sum to 1 wherever the point is valid)
            mask = bilinear_sample(jnp.ones((h, w, 1), jnp.float32), xy,
                                   wrap_x=wrap_x, pad_mode="zeros")
            g = g * mask.astype(g.dtype)
        gi = _bilinear_grad_img(g, xy, h, w, wrap_x).astype(dt)
        return gi, jnp.zeros_like(xy)

    sample.defvjp(sample_fwd, sample_bwd)
    return sample


def nearest_sample(img: Array, xy: Array, *, wrap_x: bool = True) -> Array:
    """Nearest-neighbor sample ``img`` (H, W, C) at pixel coords ``xy``.

    One flat-index row fetch per point — half the DRAM segments of the
    2x2 bilinear window (the window spans two map rows).  Intended for
    the serving fast_gather path, whose merged map is ALREADY a 4x
    bilinearly-upsampled feature map: rounding on that grid displaces a
    feature lookup by <=0.5 px of a smooth signal (quality A/B in
    tools/ab_quality.py, mode 'nearest').
    """
    h, w, _ = img.shape
    x = jnp.round(xy[..., 0])
    y = jnp.clip(jnp.round(xy[..., 1]), 0.0, h - 1.0)
    if wrap_x:
        x = jnp.mod(x, 1.0 * w)
    else:
        x = jnp.clip(x, 0.0, w - 1.0)
    idx = y.astype(jnp.int32) * w + x.astype(jnp.int32)
    flat = img.reshape(h * w, -1)
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
        *idx.shape, img.shape[-1])


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


def interpolate_feats_pointmajor(feats: Array, pts: Array, h: int, w: int,
                                 *, wrap_x: bool = True,
                                 nearest: bool = False) -> Array:
    """Multi-view sampling emitting point-major (pn, V, C).

    Measured on v5e: per-view 2x2-window gathers followed by a
    (V, pn, C)->(pn, V, C) swap cost 27 ms per 1M-point map — the swap is
    free relative to the gather — while a single stacked-map point-major
    gather degenerates to 2.1 s (XLA loses the per-view uniform-operand
    structure).  So: gather per view, then swap.

    :param feats: (V, fh, fw, C); pts (V, pn, 2) pixel coords in the
        (h, w) frame (align-corners scaling to the map resolution).
    :param nearest: single-row nearest fetch instead of the bilinear
        window (see :func:`nearest_sample`).
    :return: (pn, V, C).
    """
    if nearest:
        b, fh, fw, _ = feats.shape
        if fh != h or fw != w:
            scale = jnp.asarray([(fw - 1.0) / (w - 1.0),
                                 (fh - 1.0) / (h - 1.0)], pts.dtype)
            pts = pts * scale
        out = jax.vmap(functools.partial(nearest_sample,
                                         wrap_x=wrap_x))(feats, pts)
    else:
        out = interpolate_feats(feats, pts, h, w, wrap_x=wrap_x)
    return jnp.swapaxes(out, 0, 1)


def resize_bilinear(img: Array, out_hw: tuple, *, channel_axis: int = -1) -> Array:
    """Bilinear resize via jax.image (half-pixel centers), channel-last."""
    if channel_axis != -1:
        raise NotImplementedError("channel-last only")
    *lead, h, w, c = img.shape
    return jax.image.resize(img, (*lead, *out_hw, c), method="bilinear")
