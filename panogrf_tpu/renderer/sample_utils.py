"""Depth-guided sampling utilities (3-sigma and quadratic schedules).

Reference ``network/sample_utils.py``: Gaussian 3-sigma resampling around a
cached depth prior (``sample_3sigma`` :6-14 over ``sample_pdf`` :17-61),
stratified perturbation (:64-79), and the depth +- 3*std precompute used by
the ft renderer (:82-88).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def sample_pdf(bins: Array, weights: Array, n_samples: int,
               rng: jax.Array | None = None) -> Array:
    """Inverse-CDF sampling from per-bin weights.

    :param bins: (..., nb) bin edges; weights (..., nb-1).
    :return: (..., n_samples) samples.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)

    if rng is None:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(rng, (*cdf.shape[:-1], n_samples))

    # Comparison-count searchsorted (see render_ops.sample_fine_depth).
    inds = jnp.sum((cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32),
                   axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    def take(src, idx):
        return jnp.take_along_axis(src, idx, axis=-1)

    cdf_b, cdf_a = take(cdf, below), take(cdf, above)
    bin_b, bin_a = take(bins, jnp.minimum(below, bins.shape[-1] - 1)), \
        take(bins, jnp.minimum(above, bins.shape[-1] - 1))
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bin_b + t * (bin_a - bin_b)


def sample_3sigma(low: Array, high: Array, n: int, near: float, far: float,
                  rng: jax.Array | None = None) -> Array:
    """Sample n depths from a clamped Gaussian spanning [low, high] = mu±3σ.

    Reference ``sample_utils.py:6-14``.
    :param low/high: (...,) 3-sigma bounds.
    """
    t = jnp.linspace(0.0, 1.0, n)
    step = (high - low) / (n - 1)
    edges = jnp.clip(low[..., None] * (1 - t) + high[..., None] * t,
                     near, far)
    factor = (edges[..., 1:] - edges[..., :-1]) / jnp.maximum(
        step[..., None], 1e-8)
    x = jnp.linspace(-3.0, 3.0, n - 1)
    gauss = (1.0 / math.sqrt(2 * math.pi)) * jnp.exp(-0.5 * x ** 2)
    weights = factor * gauss
    return sample_pdf(edges, weights, n, rng)


def perturb_z_vals(z_vals: Array, rng: jax.Array) -> Array:
    """Stratified jitter within per-sample bins (reference :64-79)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
    lower = jnp.concatenate([z_vals[..., :1], mids], -1)
    t = jax.random.uniform(rng, z_vals.shape)
    return lower + (upper - lower) * t


def precompute_depth_sampling(depth: Array, std: Array) -> Array:
    """(depth, depth-3σ, depth+3σ) stacked on the last axis (:82-88)."""
    return jnp.stack([depth, depth - 3.0 * std, depth + 3.0 * std], -1)


def precompute_quadratic_samples(near: float, far: float,
                                 num_samples: int) -> Array:
    """Quadratic depth schedule (reference :94-101)."""
    start = 0.1
    x = jnp.linspace(0.0, 1.0, num_samples)
    a = (far - near) / (1.0 + 2.0 * start)
    b = 2.0 * start * a
    return a * x ** 2 + b * x + near
