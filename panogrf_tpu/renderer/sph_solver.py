"""Spherical-harmonics least-squares solver + depth->normal.

* :class:`SphericalHarmonicsSolver` — regularized weighted LS fit of SH
  coefficients per point, reference ``network/sph_solver.py:5-59`` (used by
  the direct-rendering color path, off by default but part of the model
  surface / checkpoints).
* :func:`depth2normal` — central-difference normals on the ERP point cloud
  for DINER backface culling, reference
  ``network/orig_diner_depth2normal.py:7-100``.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.core.sphere import SphereConvention

Array = jax.Array


def _sh_basis(dirs: Array, degree: int) -> Array:
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    parts = [jnp.ones_like(x)[..., None]]
    if degree >= 1:
        parts.append(jnp.stack([x, y, z], -1))
    if degree >= 2:
        parts.append(jnp.stack(
            [x * y, y * z, -x**2 - y**2 + 2 * z**2, z * x, x**2 - y**2], -1))
    if degree >= 3:
        parts.append(jnp.stack([
            (3 * x**2 - y**2) * y, x * y * z, y * (4 * z**2 - x**2 - y**2),
            z * (2 * z**2 - 3 * x**2 - 3 * y**2),
            x * (4 * z**2 - x**2 - y**2), (x**2 - y**2) * z,
            (x**2 - 3 * y**2) * x], -1))
    if degree >= 4:
        parts.append(jnp.stack([
            x * y * (x**2 - y**2), (3 * x**2 - y**2) * y * z,
            x * y * (7 * z**2 - 1), y * z * (7 * z**2 - 3),
            35 * z**4 - 30 * z**2 + 3, x * z * (7 * z**2 - 3),
            (x**2 - y**2) * (7 * z**2 - 1), (x**2 - 3 * y**2) * x * z,
            x**2 * (x**2 - 3 * y**2) - y**2 * (3 * x**2 - y**2)], -1))
    return jnp.concatenate(parts, -1)


@dataclasses.dataclass(frozen=True)
class SphericalHarmonicsSolver:
    degree: int = 3
    init_regs: tuple = (0.001, 0.005, 0.05, 0.1)

    def _regs(self) -> Array:
        regs = [np.zeros(1)]
        for l in range(1, self.degree + 1):
            regs.append(np.ones(2 * l + 1) * self.init_regs[l - 1])
        return jnp.asarray(np.concatenate(regs), jnp.float32)

    def fit(self, directions: Array, colors: Array, weights: Array,
            eps: float = 1e-4) -> Array:
        """Weighted regularized LS fit: (b,n,3),(b,n,3),(b,n) -> (b,k,3)."""
        A = _sh_basis(directions, self.degree)
        insufficient = jnp.sum(weights, 1, keepdims=True) < eps
        weights = weights + insufficient.astype(weights.dtype) * eps
        Aw = jnp.swapaxes(A * weights[..., None], -1, -2)   # (b,k,n)
        mat = Aw @ A + jnp.diag(self._regs())[None]
        return jnp.linalg.solve(mat, Aw @ colors)

    __call__ = fit

    def predict(self, directions: Array, theta: Array) -> Array:
        return _sh_basis(directions, self.degree) @ theta


def depth2normal(mvs_depth: Array, convention: SphereConvention) -> Array:
    """Central-difference normals from ERP distance maps.

    :param mvs_depth: (N, H, W, 1) radial distance.
    :return: (N, H, W, 3) unit normals in camera frame (0 where depth==0).
    """
    n, h, w, _ = mvs_depth.shape
    rays = convention.ray_directions(h, w)                    # (H, W, 3)
    pts = rays[None] * mvs_depth                              # (N, H, W, 3)
    # wrap pad W, zero pad H (reference :42-47)
    p = jnp.pad(pts, ((0, 0), (1, 1), (0, 0), (0, 0)))
    p = jnp.concatenate([p[:, :, -1:], p, p[:, :, :1]], axis=2)
    down = p[:, 2:, 1:-1]
    up = p[:, :-2, 1:-1]
    right = p[:, 1:-1, 2:]
    left = p[:, 1:-1, :-2]
    normal = jnp.cross(down - up, right - left)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
    return jnp.where(mvs_depth == 0, 0.0, normal)
