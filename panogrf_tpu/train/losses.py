"""Loss registry for renderer and depth-net training.

Renderer losses mirror reference ``network/loss.py`` (RenderLoss :55-164,
DepthLoss :166-229, ConsistencyLoss :23-53); depth-net losses mirror
``models/loss_lib.py`` (compute_l1_sphere_loss :37-68, BerhuLoss :129,
loss_uncertainty :160) and ``network/uncert_loss.py`` (NLL :14).

All functions are pure: (data_pr, data_gt, step) -> dict of scalar losses,
summed by the trainer like the reference sums every ``*loss*`` output
(``train/trainer.py:376-394``).
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# renderer losses
# ---------------------------------------------------------------------------

def _masked_rgb_loss(rgb_pr: Array, rgb_gt: Array, ray_mask: Array | None,
                     polar_weights: Array | None) -> Array:
    loss = jnp.sum((rgb_pr - rgb_gt) ** 2, axis=-1)  # (qn, rn)
    if polar_weights is not None:
        w = polar_weights[..., 0] if polar_weights.ndim == 3 else polar_weights
        loss = loss * w
        if ray_mask is not None:
            m = ray_mask.astype(loss.dtype)
            return jnp.sum(loss * m, 1) / (jnp.sum(m * w, 1) + 1e-7)
        return jnp.sum(loss, 1) / (jnp.sum(w, 1) + 1e-7)
    if ray_mask is not None:
        m = ray_mask.astype(loss.dtype)
        return jnp.sum(loss * m, 1) / (jnp.sum(m, 1) + 1e-7)
    return jnp.mean(loss, 1)


def render_loss(data_pr: dict, data_gt: dict, step: int = 0, *,
                use_ray_mask: bool = True, use_nr_fine_loss: bool = True,
                use_polar_weighted_loss: bool = False) -> dict:
    """Coarse + fine masked MSE (reference ``loss.py:55-164``)."""
    rgb_gt = data_pr["pixel_colors_gt"]
    mask = data_pr.get("ray_mask") if use_ray_mask else None
    pw = data_pr.get("polar_weights") if use_polar_weighted_loss else None
    out = {"loss_rgb_nr": _masked_rgb_loss(
        data_pr["pixel_colors_nr"], rgb_gt, mask, pw)}
    if use_nr_fine_loss and "pixel_colors_nr_fine" in data_pr:
        out["loss_rgb_nr_fine"] = _masked_rgb_loss(
            data_pr["pixel_colors_nr_fine"], rgb_gt, mask, pw)
    return out


def normalize_inv_depth(depth: Array, depth_range: Array) -> Array:
    """Depth -> normalized inverse depth given per-view (near, far)."""
    near = -1.0 / depth_range[:, 0:1]
    far = -1.0 / depth_range[:, 1:2]
    d = -1.0 / jnp.maximum(depth, 1e-5)
    return jnp.clip((d - near) / (far - near), 0.0, 1.0)


def depth_loss(data_pr: dict, data_gt: dict, step: int = 0, *,
               loss_type: str = "l2", smooth_l1_beta: float = 0.05) -> dict:
    """Supervise the dist-decoder expected depth (reference loss.py:166-229).

    Needs ``depth_mean``/``depth_coords`` in predictions and
    ``ref_imgs_info.true_depth`` (rfn, H, W, 1) + ``depth_range`` in gt.
    """
    if "depth_mean" not in data_pr:
        return {}
    ref = data_gt["ref_imgs_info"]
    if "true_depth" not in ref:
        return {"loss_depth": jnp.zeros(())}
    coords = data_pr["depth_coords"]        # (rfn, pn, 2)
    from panogrf_tpu.ops.resample import interpolate_feats
    h, w = ref["true_depth"].shape[1:3]
    depth_gt = interpolate_feats(ref["true_depth"], coords, h, w)[..., 0]
    depth_gt = normalize_inv_depth(depth_gt, ref["depth_range"])

    def one(pred):
        if loss_type == "l2":
            l = (depth_gt - pred) ** 2
        else:  # smooth_l1
            diff = jnp.abs(depth_gt - pred)
            l = jnp.where(diff < smooth_l1_beta,
                          0.5 * diff ** 2 / smooth_l1_beta,
                          diff - 0.5 * smooth_l1_beta)
        return jnp.mean(l, axis=1)

    out = {"loss_depth": one(data_pr["depth_mean"])}
    if "depth_mean_fine" in data_pr:
        out["loss_depth_fine"] = one(data_pr["depth_mean_fine"])
    return out


def consistency_loss(data_pr: dict, data_gt: dict, step: int = 0) -> dict:
    """CE between rendered and self-predicted hit prob (loss.py:23-53)."""
    if "hit_prob_self" not in data_pr:
        return {}
    def ce(p0, p1):
        p0 = jax.lax.stop_gradient(p0)
        v = -p0 * jnp.log(p1 + 1e-5) - (1 - p0) * jnp.log(1 - p1 + 1e-5)
        return jnp.mean(jnp.mean(v, -1), 1)
    out = {"loss_prob": ce(data_pr["hit_prob_nr"], data_pr["hit_prob_self"])}
    if "hit_prob_nr_fine" in data_pr and "hit_prob_self_fine" in data_pr:
        out["loss_prob_fine"] = ce(data_pr["hit_prob_nr_fine"],
                                   data_pr["hit_prob_self_fine"])
    return out


# ---------------------------------------------------------------------------
# depth-network losses (mono / MVS training)
# ---------------------------------------------------------------------------

def sin_phi_map(height: int, width: int, dtype=jnp.float32) -> Array:
    v = (jnp.arange(height, dtype=dtype) + 0.5) * (math.pi / height)
    return jnp.broadcast_to(jnp.sin(v)[:, None], (height, width))


def l1_sphere_loss(pred: Array, gt: Array, mask: Array | None = None) -> Array:
    """sin(phi)-weighted L1 (reference ``models/loss_lib.py:37-68``).

    pred/gt: (B, H, W, 1); mask optional (B, H, W, 1) validity.
    """
    b, h, w, _ = pred.shape
    wmap = sin_phi_map(h, w)[None, :, :, None]
    diff = jnp.abs(pred - gt) * wmap
    if mask is not None:
        return jnp.sum(diff * mask) / (jnp.sum(mask * wmap) + 1e-7)
    return jnp.sum(diff) / (jnp.sum(wmap) * b + 1e-7)


def berhu_loss(pred: Array, gt: Array, mask: Array | None = None,
               threshold: float = 0.2) -> Array:
    """Reverse Huber (reference ``models/loss_lib.py:129-158``)."""
    diff = jnp.abs(pred - gt)
    if mask is not None:
        diff = diff * mask
    delta = threshold * jnp.max(diff)
    part1 = jnp.where(diff <= delta, diff, 0.0)
    part2 = jnp.where(diff > delta,
                      (diff ** 2 + delta ** 2) / (2 * delta + 1e-9), 0.0)
    denom = jnp.sum(mask) + 1e-7 if mask is not None else diff.size
    return jnp.sum(part1 + part2) / denom


def gaussian_nll_loss(mu: Array, sigma: Array, gt: Array,
                      mask: Array | None = None,
                      sin_weighted: bool = True) -> Array:
    """Gaussian negative log-likelihood depth loss (reference
    ``models/loss_lib.py:96-127,160-207``; ``network/uncert_loss.py:14``)."""
    var = jnp.maximum(sigma ** 2, 1e-6)
    nll = 0.5 * (jnp.log(var) + (gt - mu) ** 2 / var)
    if sin_weighted:
        h, w = mu.shape[1:3]
        nll = nll * sin_phi_map(h, w)[None, :, :, None]
    if mask is not None:
        return jnp.sum(nll * mask) / (jnp.sum(mask) + 1e-7)
    return jnp.mean(nll)


def laplacian_nll_loss(mu: Array, b_scale: Array, gt: Array,
                       mask: Array | None = None) -> Array:
    b_ = jnp.maximum(b_scale, 1e-4)
    nll = jnp.log(2 * b_) + jnp.abs(gt - mu) / b_
    if mask is not None:
        return jnp.sum(nll * mask) / (jnp.sum(mask) + 1e-7)
    return jnp.mean(nll)


# ---------------------------------------------------------------------------
# registry (reference name2loss, loss.py:484)
# ---------------------------------------------------------------------------

def _depth_ft_loss(*args, **kw):
    from panogrf_tpu.train.ft_losses import depth_ft_loss
    return depth_ft_loss(*args, **kw)


NAME2LOSS: Dict[str, Callable] = {
    "render": render_loss,
    "depth": depth_loss,
    "consistency": consistency_loss,
    "depth_ft": _depth_ft_loss,
}


def total_loss(loss_terms: dict) -> Array:
    """Sum every scalarized '*loss*' entry like reference
    ``train/trainer.py:376-394``."""
    total = jnp.zeros(())
    for k, v in loss_terms.items():
        if "loss" in k:
            total = total + jnp.mean(v)
    return total
