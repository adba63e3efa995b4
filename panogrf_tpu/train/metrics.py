"""Image and depth metrics (pure jnp; TPU/CPU).

Mirrors reference ``network/metrics.py`` (PSNR_SSIM :173-286, WSPSNR
:118-171) and the ERP depth metric stack of ``train_depth.py:995-1193``.
SSIM follows tf.image.ssim (gaussian window 11, sigma 1.5) which the
reference's ``eval.py:23`` uses for the headline numbers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def psnr(pred: Array, gt: Array, max_val: float = 1.0) -> Array:
    """pred/gt: (..., H, W, C) in [0, max_val]."""
    mse = jnp.mean((pred - gt) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-10))


def ws_psnr(pred: Array, gt: Array, max_val: float = 1.0) -> Array:
    """sin(phi)-weighted spherical PSNR (reference metrics.py:118-171)."""
    h = pred.shape[-3]
    v = (jnp.arange(h, dtype=pred.dtype) + 0.5) * (math.pi / h)
    w = jnp.sin(v)[:, None, None]
    se = (pred - gt) ** 2
    wmse = (jnp.sum(se * w, axis=(-3, -2, -1))
            / (jnp.sum(jnp.broadcast_to(w, pred.shape[-3:]))))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(wmse, 1e-10))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return g


def _filter2d_sep(img: Array, k: Array) -> Array:
    """Separable valid-mode filter over (H, W) of (H, W, C)."""
    # along W
    def conv_axis(x, axis):
        x = jnp.moveaxis(x, axis, -1)
        shape = x.shape
        flat = x.reshape(-1, 1, shape[-1])
        # HIGHEST precision: TPU convs default to bf16 inputs, and the
        # E[x^2] - mu^2 variance cancellation then produces garbage (SSIM
        # outside [-1, 1] was observed).
        out = jax.lax.conv_general_dilated(
            flat, k.reshape(1, 1, -1), (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST)
        out = out.reshape(*shape[:-1], -1)
        return jnp.moveaxis(out, -1, axis)
    return conv_axis(conv_axis(img, 0), 1)


def ssim(pred: Array, gt: Array, max_val: float = 1.0) -> Array:
    """tf.image.ssim-compatible SSIM for (H, W, C) images."""
    k = _gaussian_kernel()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _filter2d_sep(pred, k)
    mu_y = _filter2d_sep(gt, k)
    xx = _filter2d_sep(pred * pred, k) - mu_x * mu_x
    yy = _filter2d_sep(gt * gt, k) - mu_y * mu_y
    xy = _filter2d_sep(pred * gt, k) - mu_x * mu_y
    l = (2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)
    cs = (2 * xy + c2) / (xx + yy + c2)
    return jnp.mean(l * cs)


def render_metrics(pred_img: Array, gt_img: Array) -> dict:
    """The validation metric dict (psnr/ssim/ws-psnr), key names matching
    reference ``network/metrics.py:227-231``."""
    return {
        "psnr_nr": psnr(pred_img, gt_img),
        "ssim_nr": ssim(pred_img, gt_img),
        "wspsnr_nr": ws_psnr(pred_img, gt_img),
    }


# ---------------------------------------------------------------------------
# depth metrics (reference train_depth.py:995-1193)
# ---------------------------------------------------------------------------

def depth_metrics_erp(pred: Array, gt: Array, min_depth: float = 0.1,
                      max_depth: float = 10.0) -> dict:
    """sin(phi)-weighted MAE / RMSE / AbsRel / delta thresholds.

    pred/gt: (H, W) or (H, W, 1) distances in meters.
    """
    pred = pred.reshape(pred.shape[0], pred.shape[1])
    gt = gt.reshape(gt.shape[0], gt.shape[1])
    h, w = gt.shape
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (math.pi / h)
    wmap = jnp.broadcast_to(jnp.sin(v)[:, None], (h, w))
    valid = ((gt > min_depth) & (gt < max_depth)).astype(jnp.float32)
    wv = wmap * valid
    denom = jnp.sum(wv) + 1e-7
    pred = jnp.clip(pred, min_depth, max_depth)

    abs_err = jnp.abs(pred - gt)
    mae = jnp.sum(abs_err * wv) / denom
    rmse = jnp.sqrt(jnp.sum((pred - gt) ** 2 * wv) / denom)
    absrel = jnp.sum(abs_err / jnp.maximum(gt, 1e-6) * wv) / denom
    ratio = jnp.maximum(pred / jnp.maximum(gt, 1e-6),
                        gt / jnp.maximum(pred, 1e-6))
    out = {"mae": mae, "rmse": rmse, "abs_rel": absrel}
    for i, name in enumerate(["delta1", "delta2", "delta3"]):
        thresh = 1.25 ** (i + 1)
        out[name] = jnp.sum((ratio < thresh).astype(jnp.float32) * wv) / denom
    return out


def depth_metrics_erp_full(pred: Array, gt: Array, min_depth: float = 0.1,
                           max_depth: float = 10.0) -> dict:
    """Reference-exact ERP depth table (``train_depth.py:995-1106``):
    unweighted l1/l2/rmse, sin(phi)-weighted wl1/wl2/wrmse, inverse-depth
    imae/irmse, and relative_{105,110,125,125_2,125_3} accuracy fractions
    (relative error < threshold - 1 — NOT the max-ratio delta).

    pred/gt: (H, W) or (H, W, 1) radial distances in meters.
    """
    pred = pred.reshape(pred.shape[0], pred.shape[1]).astype(jnp.float32)
    gt = gt.reshape(gt.shape[0], gt.shape[1]).astype(jnp.float32)
    h, w = gt.shape
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (math.pi / h)
    wmap = jnp.broadcast_to(jnp.sin(v)[:, None], (h, w))
    valid = ((gt > min_depth) & (gt < max_depth)).astype(jnp.float32)
    vsum = jnp.sum(valid) + 1e-7
    mw = wmap * valid
    mwsum = jnp.sum(mw) + 1e-7

    inv = lambda d: jnp.where(valid > 0, 1.0 / jnp.maximum(d, 1e-6), 0.0)
    abs_err = jnp.abs(gt - pred) * valid
    out = {
        "l1_error": jnp.sum(abs_err) / vsum,
        # NOTE: l2/rmse intentionally sum over ALL pixels while dividing
        # by the valid count — reproducing the reference exactly
        # (train_depth.py:1057-1060 applies no valid mask to l2).
        "l2_error": jnp.sum((gt - pred) ** 2) / vsum,
        "wl1_error": jnp.sum(jnp.abs(gt - pred) * mw) / mwsum,
        "wl2_error": jnp.sum((gt - pred) ** 2 * mw) / mwsum,
        "imae_error": jnp.sum(jnp.abs(inv(gt) - inv(pred)) * valid) / vsum,
        "irmse_error": jnp.sqrt(
            jnp.sum((inv(gt) - inv(pred)) ** 2 * valid) / vsum),
    }
    out["rmse_error"] = jnp.sqrt(out["l2_error"])
    out["wrmse_error"] = jnp.sqrt(out["wl2_error"])
    rel = jnp.abs(gt - pred) / jnp.maximum(gt, 1e-6) * valid
    for name, t in [("relative_105", 1.05), ("relative_110", 1.10),
                    ("relative_125", 1.25), ("relative_125_2", 1.25 ** 2),
                    ("relative_125_3", 1.25 ** 3)]:
        out[name] = jnp.sum(((rel < t - 1.0) & (valid > 0)).astype(
            jnp.float32)) / vsum
    return out


def distance_to_zdepth(distance: Array) -> Array:
    """ERP radial distance -> z-depth (inverse of the stitcher's
    zdepth_to_distance ratio; reference ``distance_to_zdepth_torch``,
    ``habitat_data_neuray_ft_lmdb.py:208``).  (H, W) or (H, W, 1).
    """
    squeeze = distance.shape[-1] == 1
    d = distance[..., 0] if squeeze else distance
    h, w = d.shape[-2:]
    theta = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (2 * math.pi / w)
    phi = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (math.pi / h)
    tt, pp = jnp.meshgrid(theta, phi)
    dirs = jnp.stack([jnp.sin(pp) * jnp.sin(tt), jnp.cos(pp),
                      jnp.sin(pp) * jnp.cos(tt)], -1)
    m = jnp.maximum(jnp.max(jnp.abs(dirs), axis=-1), 1e-6)
    cw = h // 2
    k = (cw - 1.0) / cw
    ratio = jnp.sqrt(1.0 + (1.0 / m ** 2 - 1.0) * k * k)
    out = d / ratio
    return out[..., None] if squeeze else out


def depth_metrics_zdepth(pred: Array, gt: Array, min_depth: float = 0.1,
                         max_depth: float = 10.0) -> dict:
    """Cube-face z-depth metric table (reference ``train_depth.py:
    1108-1193`` compute_zdepth_results): convert radial distance to
    z-depth, resample onto the four lateral cube faces, and score
    l1/rmse/imae/irmse + relative thresholds on valid (0.1 < z < max)
    pixels.  Face set matches the reference's ``cubemap_sides=(2,3,4,5)``
    (its four lateral faces; our layout's laterals are faces 0-3).
    """
    from panogrf_tpu.core.cubemap import equi_to_cube
    pz = distance_to_zdepth(pred.reshape(*pred.shape[:2], -1)[..., :1])
    gz = distance_to_zdepth(gt.reshape(*gt.shape[:2], -1)[..., :1])
    face_w = gt.shape[0] // 2
    pc = equi_to_cube(pz, face_w)[:4, ..., 0]    # (4, fw, fw) laterals
    gc = equi_to_cube(gz, face_w)[:4, ..., 0]
    valid = ((gc > 0.1) & (gc < max_depth)).astype(jnp.float32)
    vsum = jnp.sum(valid) + 1e-7
    inv = lambda d: jnp.where(valid > 0, 1.0 / jnp.maximum(d, 1e-6), 0.0)
    out = {
        "l1_error": jnp.sum(jnp.abs(gc - pc) * valid) / vsum,
        # unmasked l2 like the reference (train_depth.py:1152-1155)
        "l2_error": jnp.sum((gc - pc) ** 2) / vsum,
        "imae_error": jnp.sum(jnp.abs(inv(gc) - inv(pc)) * valid) / vsum,
        "irmse_error": jnp.sqrt(
            jnp.sum((inv(gc) - inv(pc)) ** 2 * valid) / vsum),
    }
    out["rmse_error"] = jnp.sqrt(out["l2_error"])
    rel = jnp.abs(gc - pc) / jnp.maximum(gc, 1e-6) * valid
    for name, t in [("relative_105", 1.05), ("relative_110", 1.10),
                    ("relative_125", 1.25), ("relative_125_2", 1.25 ** 2),
                    ("relative_125_3", 1.25 ** 3)]:
        out[name] = jnp.sum(((rel < t - 1.0) & (valid > 0)).astype(
            jnp.float32)) / vsum
    return out
