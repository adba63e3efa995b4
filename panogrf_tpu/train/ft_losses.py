"""Fine-tune-stage depth supervision losses (uncertainty-aware).

Reference ``network/uncert_loss.py`` (NLL + per-point), ``network/
urf_loss.py`` (Urban Radiance Fields depth loss) and ``network/ae_loss.py``
(autoencoder reconstruction) — the loss family used by ``DepthFTLoss``
(``network/loss.py:232-482``) during per-scene finetuning against cached
MVS depth/uncertainty.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def is_not_in_expected_distribution(mean: Array, var: Array,
                                    m_mean: Array, m_var: Array) -> Array:
    """Gate: supervise only where prediction disagrees with the measurement
    (reference ``uncert_loss.py:6-11``)."""
    delta_bad = (jnp.abs(mean - m_mean) - jnp.sqrt(m_var)) > 0.0
    var_bad = m_var < var
    return delta_bad | var_bad


def nll_depth_loss(pred_mean: Array, pred_var: Array, target_mean: Array,
                   target_var: Array, min_depth: float, max_depth: float,
                   apply_all: bool = False, clip_sigma: float = 0.0,
                   weights: Array | None = None) -> Array:
    """Gaussian NLL against cached MVS depth (reference ``compute_nll_loss``,
    ``uncert_loss.py:14-56``).  Shapes (qn, rn)."""
    pv = jnp.square(jnp.maximum(jnp.sqrt(jnp.maximum(pred_var, 0.0)),
                                clip_sigma))
    if apply_all:
        gate = jnp.ones_like(pred_mean, bool)
    else:
        gate = is_not_in_expected_distribution(pred_mean, pv, target_mean,
                                               target_var)
    gate = gate & (target_mean > min_depth) & (target_mean < max_depth)
    gate = gate.astype(pred_mean.dtype)
    eps = 1e-3
    var = jnp.maximum(pv, eps)
    nll = 0.5 * (jnp.log(var) + (pred_mean - target_mean) ** 2 / var)
    w = gate if weights is None else gate * weights
    return jnp.sum(nll * w, axis=1) / (jnp.sum(w, axis=1) + 1e-7)


def perpoint_depth_loss(weights: Array, tvals: Array, target_depth: Array,
                        target_var: Array, min_depth: float,
                        sigma_factor: float = 1.0) -> Array:
    """Per-sample hit-probability supervision: weights should form a
    Gaussian bump at the measured depth (reference ``uncert_loss.py:57-``).

    :param weights: (qn, rn, dn) hit probabilities; tvals (qn, rn, dn);
        target_depth/target_var (qn, rn).
    """
    d_t = target_depth[..., None]
    sigma = jnp.sqrt(jnp.maximum(target_var, 1e-8))[..., None] * sigma_factor
    mask_valid = (d_t >= min_depth).astype(weights.dtype)
    target_w = jnp.exp(-0.5 * ((tvals - d_t) / sigma) ** 2)
    target_w = target_w / (jnp.sum(target_w, -1, keepdims=True) + 1e-8)
    l = jnp.sum((weights - target_w) ** 2 * mask_valid, axis=-1)
    return jnp.mean(l, axis=1)


def urf_depth_loss(depth_pr: Array, tvals: Array, weights: Array,
                   target_depth: Array, target_var: Array,
                   min_depth: float) -> tuple:
    """Urban-RF style (expected-depth MSE, near-surface match, empty-space
    suppression) — reference ``urf_loss.py:6-60``.

    :return: (d_loss (qn,), n_loss (qn,), e_loss (qn,)).
    """
    var_t = jnp.broadcast_to(target_var[..., None], tvals.shape)
    sigma = jnp.sqrt(jnp.maximum(var_t, 1e-10))
    eps = sigma * 3.0
    valid = (target_depth >= min_depth)
    d_loss = jnp.mean(((depth_pr - target_depth) * valid) ** 2, axis=-1)

    d_t = jnp.broadcast_to(target_depth[..., None], tvals.shape)
    dmask = d_t >= min_depth
    near = (tvals > (d_t - eps)) & (tvals < (d_t + eps)) & dmask
    empty = ((tvals > (d_t + eps)) | (tvals < (d_t - eps))) & dmask

    dist = jnp.where(near, tvals - d_t, 0.0)
    distr = (1.0 / (sigma * math.sqrt(2 * math.pi))
             * jnp.exp(-(dist ** 2) / (2 * sigma ** 2)))
    distr = distr / (jnp.max(distr) + 1e-12)
    distr = distr * near
    n_loss = jnp.mean(jnp.sum(near * (weights - distr) ** 2, -1), -1)
    e_loss = jnp.mean(jnp.sum((empty * weights) ** 2, -1), -1)
    return d_loss, n_loss, e_loss


def ae_recon_loss(pred_imgs: dict, gt_img: Array) -> Array:
    """Multi-scale autoencoder reconstruction (reference ``ae_loss.py``).

    :param pred_imgs: {scale: (B, H/2^s, W/2^s, 3)} sigmoid outputs.
    """
    total = jnp.zeros(())
    for scale, pred in pred_imgs.items():
        h, w = pred.shape[1:3]
        gt = jax.image.resize(gt_img, (gt_img.shape[0], h, w, 3), "bilinear")
        total = total + jnp.mean(jnp.abs(pred - gt))
    return total / max(len(pred_imgs), 1)


def depth_ft_loss(data_pr: dict, data_gt: dict, step: int = 0, *,
                  loss_type: str = "mse", min_depth: float = 0.5,
                  max_depth: float = 15.0) -> dict:
    """DepthFTLoss dispatcher (reference ``loss.py:232-482``): supervise the
    rendered depth against the cached MVS depth of the sampled query view.

    Needs data_pr: render_depth(_fine), render_uncert(_fine) optional,
    hit_prob_nr(_fine), que_depth(_fine); data_gt['que_imgs_info'] with
    ``mvs_depth_at_coords`` (qn, rn) and ``mvs_var_at_coords``.
    """
    que = data_gt.get("que_imgs_info", {})
    if "mvs_depth_at_coords" not in que or "render_depth" not in data_pr:
        return {}
    tgt = que["mvs_depth_at_coords"]
    var = que.get("mvs_var_at_coords", jnp.full_like(tgt, 0.01))
    out = {}
    for suffix in ["", "_fine"]:
        if f"render_depth{suffix}" not in data_pr:
            continue
        pred = data_pr[f"render_depth{suffix}"]
        if loss_type == "mse":
            valid = ((tgt > min_depth) & (tgt < max_depth)).astype(pred.dtype)
            l = jnp.sum((pred - tgt) ** 2 * valid, 1) / \
                (jnp.sum(valid, 1) + 1e-7)
        elif loss_type == "nll":
            uncert = data_pr.get(f"render_uncert{suffix}")
            l = nll_depth_loss(pred, uncert, tgt, var, min_depth, max_depth)
        elif loss_type == "perpoint":
            l = perpoint_depth_loss(
                data_pr[f"hit_prob_nr{suffix}"],
                data_pr[f"que_depth{suffix}"], tgt, var, min_depth)
        elif loss_type == "urf":
            d, n, e = urf_depth_loss(
                pred, data_pr[f"que_depth{suffix}"],
                data_pr[f"hit_prob_nr{suffix}"], tgt, var, min_depth)
            l = d + n + e
        else:
            raise ValueError(loss_type)
        out[f"loss_depth_ft{suffix}"] = l
    return out
