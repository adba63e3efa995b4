"""DINER occlusion-aware depth-guided ray sampling.

Reference ``network/original_depth_guided_sample.py:46-333`` plus the
projection gatherer ``network/render_ops.py:260-290``
(project_points_dict_diner): project ``n_candidates`` uniform samples into
every reference view, score each by the Gaussian(mu_mvs, sigma_mvs) surface
likelihood, shortlist the top ``n_samples`` per ray, optionally replace the
tail with Gaussian draws around the likelihood-weighted depth, and fill
zero-likelihood slots uniformly.

All data-dependent steps (argsort/top-k, masked fill) are static-shape jnp
— no boolean indexing, so the whole sampler jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from panogrf_tpu.core.sphere import SphereConvention
from panogrf_tpu.ops.resample import interpolate_feats

Array = jax.Array


def project_depth_info(ref_data: dict, que_pts: Array,
                       convention: SphereConvention) -> dict:
    """Gather per-candidate MVS depth stats from every reference view.

    ref_data needs: mvs_depth (rfn, dh, dw, 1), mvs_uncert (rfn, dh, dw, 1),
    w2c (rfn, 3, 4), imgs (rfn, H, W, 3) for the pixel frame; optionally
    mvs_normal (rfn, dh, dw, 3) for backface culling (reference
    ``render_ops.py:260-290`` with ``include_norm``).
    :param que_pts: (qn, rn, cn, 3) world candidate points.
    :return: dict of (rfn, qn, rn, cn) arrays mu/uncert/depth
        (+ normal (rfn, qn, rn, cn, 3)).
    """
    qn, rn, cn, _ = que_pts.shape
    rfn, h, w, _ = ref_data["imgs"].shape
    pts = que_pts.reshape(-1, 3)
    w2c = ref_data["w2c"]
    cam = jnp.einsum("vij,pj->vpi", w2c[:, :, :3], pts) + w2c[:, None, :, 3]
    xy, depth = convention.project_to_pixels(cam, h, w)
    mu = interpolate_feats(ref_data["mvs_depth"], xy, h, w)[..., 0]
    uncert = interpolate_feats(ref_data["mvs_uncert"], xy, h, w)[..., 0]

    def rs(t):
        return t.reshape(rfn, qn, rn, cn)

    out = {"mu": rs(mu), "uncert": rs(uncert), "depth": rs(depth)}
    if "mvs_normal" in ref_data:
        nrm = interpolate_feats(ref_data["mvs_normal"], xy, h, w)
        out["normal"] = nrm.reshape(rfn, qn, rn, cn, 3)
    return out


def fill_uniform(z: Array, near: float, far: float,
                 rng: jax.Array | None = None) -> Array:
    """Fill zero slots with stratified uniform depths (reference
    ``fill_up_uniform_samples``, :334-366)."""
    z = jnp.sort(z, axis=-1)  # zeros first
    missing = z == 0.0
    n_missing = jnp.sum(missing, axis=-1, keepdims=True)
    step = (far - near) / jnp.maximum(n_missing, 1)
    idx = jnp.broadcast_to(
        jnp.arange(z.shape[-1], dtype=z.dtype), z.shape)
    if rng is not None:
        jitter = jax.random.uniform(rng, z.shape)
    else:
        jitter = jnp.full(z.shape, 0.5)
    z_fill = near + idx * step + jitter * step
    return jnp.sort(jnp.where(missing, z_fill, z), axis=-1)


def sample_depthguided(que_depth: Array, prj: dict, n_samples: int,
                       n_gaussian: int, near: float, far: float,
                       depth_diff_max: float = 0.05,
                       fixed_sigma: float = 0.0,
                       rng: jax.Array | None = None,
                       que_dir: Array | None = None,
                       w2c: Array | None = None) -> Array:
    """Shortlist candidate depths by occlusion-aware surface likelihood.

    :param que_depth: (qn, rn, cn) uniform candidate depths (sorted).
    :param prj: output of :func:`project_depth_info`.
    :param que_dir: optional (qn, rn, cn, 3) NEGATED unit ray directions
        (as produced by depth2points_spherical); with ``prj['normal']``
        present enables backface culling: candidates whose forward ray
        direction points along the surface normal in the reference camera
        frame are discarded (reference
        ``original_depth_guided_sample.py:112-154``, cos <= 0 mask).
    :param w2c: (rfn, 3, 4) reference world-to-camera (for que_dir
        transform).
    :return: (qn, rn, n_samples) selected depths (sorted, gaps filled).
    """
    mu, uncert, prj_depth = prj["mu"], prj["uncert"], prj["depth"]
    sigma = (jnp.full_like(mu, fixed_sigma) if fixed_sigma > 0
             else jnp.sqrt(jnp.maximum(uncert, 1e-8)))
    cn = que_depth.shape[-1]
    step = (far - near) / cn

    # per-view Gaussian bin mass at the candidate (reference :156-162)
    valid = jnp.abs(mu - prj_depth) < depth_diff_max
    if "normal" in prj and que_dir is not None and w2c is not None:
        # forward ray dir = -que_dir; rotate into each ref camera frame
        fwd = -que_dir                                    # (qn, rn, cn, 3)
        fwd_cam = jnp.einsum("vij,qrcj->vqrci", w2c[:, :, :3], fwd)
        cosd = jnp.sum(fwd_cam * prj["normal"], axis=-1)  # (rfn,qn,rn,cn)
        valid = valid & (cosd <= 0.0)
    denom = sigma * jnp.sqrt(2.0)
    lik = 0.5 * jnp.abs(
        jax.scipy.special.erf((prj_depth + step / 2 - mu) / denom)
        - jax.scipy.special.erf((prj_depth - step / 2 - mu) / denom))
    lik = jnp.where(valid, lik, 0.0)
    # max over reference views (reference :168)
    pt_lik = jnp.max(lik, axis=0)                     # (qn, rn, cn)

    # occlusion-aware transmittance weighting (reference :170-171).
    # NOTE: like the reference (:209 argsorts pt_likelihood, NOT the
    # opaque variant), the shortlist ranks by raw likelihood; ``opaque``
    # only shapes the Gaussian tail moments below (:226-235).
    opaque = pt_lik.at[..., 1:].multiply(
        jnp.cumprod(1.0 - pt_lik, axis=-1)[..., :-1])

    top_lik, top_idx = jax.lax.top_k(pt_lik, n_samples)
    z_sel = jnp.take_along_axis(que_depth, top_idx, axis=-1)
    z_sel = jnp.where(top_lik == 0.0, 0.0, z_sel)

    if n_gaussian > 0:
        w = opaque + 1e-12
        wsum = jnp.sum(w, axis=-1, keepdims=True)
        mean = jnp.sum(que_depth * w, -1, keepdims=True) / wsum
        var = jnp.sum((que_depth - mean) ** 2 * w, -1, keepdims=True) / wsum
        std = jnp.sqrt(jnp.maximum(var, 1e-10))
        any_lik = jnp.any(opaque != 0.0, axis=-1, keepdims=True)
        if rng is not None:
            noise = jax.random.normal(
                rng, (*que_depth.shape[:-1], n_gaussian))
        else:
            noise = jnp.zeros((*que_depth.shape[:-1], n_gaussian))
        gauss = jnp.where(any_lik, noise * std + mean, 0.0)
        z_sel = z_sel.at[..., -n_gaussian:].set(gauss)

    fill_rng = None if rng is None else jax.random.fold_in(rng, 1)
    return fill_uniform(jnp.clip(z_sel, 0.0, far), near, far, fill_rng)
