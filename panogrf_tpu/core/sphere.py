"""Canonical spherical geometry for equirectangular (ERP) panoramas.

This is the single source of truth for every coordinate convention in the
framework.  The reference implementation scatters four per-dataset coordinate
systems over several duplicated torch/numpy helpers (see
reference ``network/spt_utils.py:37-199``, ``helpers/my_torch_helpers.py``,
``models/spherical_cost_volume.py:272-300``); here each convention is a small
set of pure functions captured by a :class:`SphereConvention` object so the
math is written once, tested once, and traced once under ``jit``.

Conventions supported (matching the reference's ``dataset_name`` values):

* ``m3d``          — Matterport3D / habitat rendering (the primary dataset).
* ``replica_test`` — Replica evaluation protocol.
* ``residential``  — SOMSI residential scenes.
* ``coffee_area``  — SOMSI CoffeeArea scene (reference spells it "CoffeeArea").

All functions are shape-polymorphic: coordinates live in the trailing axis
(``(..., 2)`` for pixel/spherical-2d, ``(..., 3)`` for cartesian/spherical-3d)
and are float32 by default.  Everything here is differentiable and safe to
use inside jit/vmap/scan — no data-dependent control flow.

Pixel coordinate semantics
--------------------------
``corner`` mode maps pixel x ∈ [0, W-1] onto the full longitude range (the
reference's ``spt_utils.Utils`` behaviour, i.e. torch ``align_corners=True``).
``center`` mode maps pixel centers x+0.5 ∈ (0, W) onto longitude (the
reference's cost-volume grid at ``models/spherical_cost_volume.py:281-283``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict

import jax
import jax.numpy as jnp

Array = jax.Array

_TWO_PI = 2.0 * math.pi
_PI = math.pi
# Guard values keeping gradients finite at the poles.  _EPS_TRIG must stay
# representable in float32 next to 1.0 (1 - 1e-8 rounds back to 1.0f and
# acos'(1) = -inf), hence the larger clip.
_EPS = 1e-8
_EPS_TRIG = 1e-6


def _safe_acos(x: Array) -> Array:
    return jnp.arccos(jnp.clip(x, -1.0 + _EPS_TRIG, 1.0 - _EPS_TRIG))


def _safe_asin(x: Array) -> Array:
    return jnp.arcsin(jnp.clip(x, -1.0 + _EPS_TRIG, 1.0 - _EPS_TRIG))


def _safe_atan2(a: Array, b: Array) -> Array:
    """atan2 with finite gradients at the (0, 0) pole singularity.

    Longitude is undefined at the poles; we pick theta(=atan2) at a point
    nudged off the axis so autodiff through pole-crossing rays stays finite
    (the reference instead trips an ipdb NaN guard, ``spt_utils.py:137``).
    """
    degenerate = (jnp.abs(a) < _EPS) & (jnp.abs(b) < _EPS)
    b_safe = jnp.where(degenerate, _EPS, b)
    return jnp.arctan2(jnp.where(degenerate, 0.0, a), b_safe)


@dataclasses.dataclass(frozen=True)
class SphereConvention:
    """A spherical/ERP coordinate convention.

    ``spherical`` tuples are (theta, phi, radius); the meaning of theta/phi
    differs per convention and matches the reference dataset exactly.
    """

    name: str
    # (theta, phi) from normalized pixel fractions fx, fy in [0, 1].
    _pix_to_sph: Callable[[Array, Array], tuple]
    # cartesian (x, y, z) from (theta, phi, r)
    _sph_to_cart: Callable[[Array, Array, Array], tuple]
    # (theta, phi) from cartesian (x, y, z, r)
    _cart_to_sph: Callable[[Array, Array, Array, Array], tuple]
    # normalized pixel fractions (fx, fy) in [0, 1] from (theta, phi)
    _sph_to_pix: Callable[[Array, Array], tuple]

    # ---- public API -----------------------------------------------------

    def equi_to_spherical(self, xy: Array, height: int, width: int,
                          radius: float = 1.0, mode: str = "corner") -> Array:
        """Pixel coords (..., 2) -> spherical (..., 3) = (theta, phi, r).

        Mirrors reference ``network/spt_utils.py:37-87`` (corner mode) and the
        pixel-center grids of ``models/spherical_cost_volume.py:281-283``.
        """
        x, y = xy[..., 0], xy[..., 1]
        if mode == "corner":
            fx = jnp.clip(x, 0.0, width - 1.0) / (width - 1.0)
            fy = jnp.clip(y, 0.0, height - 1.0) / (height - 1.0)
        elif mode == "center":
            fx = (x + 0.5) / width
            fy = (y + 0.5) / height
        else:
            raise ValueError(f"unknown pixel mode {mode!r}")
        theta, phi = self._pix_to_sph(fx, fy)
        r = jnp.full_like(theta, radius)
        return jnp.stack([theta, phi, r], axis=-1)

    def spherical_to_cartesian(self, sph: Array) -> Array:
        """Spherical (..., 2 or 3) -> cartesian (..., 3)."""
        theta, phi = sph[..., 0], sph[..., 1]
        r = sph[..., 2] if sph.shape[-1] == 3 else jnp.ones_like(theta)
        x, y, z = self._sph_to_cart(theta, phi, r)
        return jnp.stack([x, y, z], axis=-1)

    def cartesian_to_spherical(self, pts: Array) -> Array:
        """Cartesian (..., 3) -> spherical (..., 3) = (theta, phi, radius).

        Radius uses a small epsilon like reference ``spt_utils.py:132-136`` to
        avoid NaNs at the origin / poles.
        """
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        r = jnp.linalg.norm(pts, axis=-1)
        theta, phi = self._cart_to_sph(x, y, z, jnp.maximum(r, _EPS))
        return jnp.stack([theta, phi, r], axis=-1)

    def spherical_to_equi(self, sph: Array, height: int, width: int,
                          mode: str = "corner") -> Array:
        """Spherical (..., >=2) -> pixel coords (..., 2).

        In ``corner`` mode output x ∈ [0, W-1]; in ``center`` mode the output
        is still expressed in the same pixel frame (x = fx*W - 0.5).
        """
        theta, phi = sph[..., 0], sph[..., 1]
        fx, fy = self._sph_to_pix(theta, phi)
        if mode == "corner":
            x = fx * (width - 1.0)
            y = fy * (height - 1.0)
        elif mode == "center":
            x = fx * width - 0.5
            y = fy * height - 0.5
        else:
            raise ValueError(f"unknown pixel mode {mode!r}")
        return jnp.stack([x, y], axis=-1)

    # ---- derived helpers -------------------------------------------------

    def pixel_grid(self, height: int, width: int) -> Array:
        """(H, W, 2) grid of (x, y) pixel coordinates (float32)."""
        x = jnp.arange(width, dtype=jnp.float32)
        y = jnp.arange(height, dtype=jnp.float32)
        xx, yy = jnp.meshgrid(x, y, indexing="xy")
        return jnp.stack([xx, yy], axis=-1)

    def ray_directions(self, height: int, width: int,
                       mode: str = "corner") -> Array:
        """Unit ray directions per ERP pixel, shape (H, W, 3).

        Equivalent to reference ``network/ray_utils.py:4-16``.
        """
        sph = self.equi_to_spherical(self.pixel_grid(height, width),
                                     height, width, mode=mode)
        dirs = self.spherical_to_cartesian(sph)
        return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def project_to_pixels(self, pts_cam: Array, height: int, width: int,
                          mode: str = "corner") -> tuple:
        """Camera-frame points (..., 3) -> (pixel xy (...,2), distance (...,)).

        The spherical "depth" is the euclidean distance from the camera
        center (reference ``network/ray_utils.py:18-22``).
        """
        sph = self.cartesian_to_spherical(pts_cam)
        xy = self.spherical_to_equi(sph, height, width, mode=mode)
        return xy, sph[..., 2]


# ---------------------------------------------------------------------------
# Convention definitions.  fx, fy are pixel fractions in [0, 1].
# ---------------------------------------------------------------------------

def _m3d_pix_to_sph(fx, fy):
    theta = fx * _TWO_PI - 0.5 * _PI
    phi = fy * _PI
    return theta, phi


def _m3d_sph_to_cart(theta, phi, r):
    sp = jnp.sin(phi)
    return r * sp * jnp.cos(theta), r * jnp.cos(phi), r * sp * jnp.sin(theta)


def _m3d_cart_to_sph(x, y, z, r):
    theta = _safe_atan2(z, x)
    phi = _safe_acos(y / r)
    return theta, phi


def _m3d_sph_to_pix(theta, phi):
    fx = jnp.mod(theta + 0.5 * _PI, _TWO_PI) / _TWO_PI
    fy = phi / _PI
    return fx, fy


def _replica_pix_to_sph(fx, fy):
    theta = fx * _TWO_PI - _PI
    phi = 0.5 * _PI - fy * _PI
    return theta, phi


def _replica_sph_to_cart(theta, phi, r):
    cp = jnp.cos(phi)
    return r * jnp.sin(theta) * cp, -r * jnp.sin(phi), r * jnp.cos(theta) * cp


def _replica_cart_to_sph(x, y, z, r):
    theta = _safe_atan2(x, z)
    phi = -_safe_asin(y / r)
    return theta, phi


def _replica_sph_to_pix(theta, phi):
    fx = jnp.mod(theta + _PI, _TWO_PI) / _TWO_PI
    fy = (0.5 * _PI - phi) / _PI
    return fx, fy


def _residential_pix_to_sph(fx, fy):
    theta = _PI * (2.0 * fx - 1.5)
    phi = _PI * (0.5 - fy)
    return theta, phi


def _residential_sph_to_cart(theta, phi, r):
    cp = jnp.cos(phi)
    return r * jnp.cos(theta) * cp, r * jnp.sin(phi), r * jnp.sin(theta) * cp


def _residential_cart_to_sph(x, y, z, r):
    theta = -_safe_atan2(-z, x)
    # Wrap (pi/2, 2pi] down by 2pi as reference spt_utils.py:146-151 does.
    theta = jnp.where(theta > 0.5 * _PI, theta - _TWO_PI, theta)
    phi = _safe_asin(y / r)
    return theta, phi


def _residential_sph_to_pix(theta, phi):
    fx = jnp.mod(theta / _TWO_PI + 0.75, 1.0)
    fy = 0.5 - phi / _PI
    return fx, fy


def _coffee_pix_to_sph(fx, fy):
    theta = _TWO_PI * (1.0 - fx)
    phi = fy * _PI
    return theta, phi


def _coffee_sph_to_cart(theta, phi, r):
    sp = jnp.sin(phi)
    return r * sp * jnp.cos(theta), r * sp * jnp.sin(theta), r * jnp.cos(phi)


def _coffee_cart_to_sph(x, y, z, r):
    theta = _safe_atan2(y, x)
    theta = jnp.where(theta < 0, theta + _TWO_PI, theta)
    phi = _safe_acos(z / r)
    return theta, phi


def _coffee_sph_to_pix(theta, phi):
    fx = jnp.mod(1.0 - theta / _TWO_PI, 1.0)
    fy = phi / _PI
    return fx, fy


M3D = SphereConvention("m3d", _m3d_pix_to_sph, _m3d_sph_to_cart,
                       _m3d_cart_to_sph, _m3d_sph_to_pix)
REPLICA = SphereConvention("replica_test", _replica_pix_to_sph,
                           _replica_sph_to_cart, _replica_cart_to_sph,
                           _replica_sph_to_pix)
RESIDENTIAL = SphereConvention("residential", _residential_pix_to_sph,
                               _residential_sph_to_cart,
                               _residential_cart_to_sph,
                               _residential_sph_to_pix)
COFFEE_AREA = SphereConvention("coffee_area", _coffee_pix_to_sph,
                               _coffee_sph_to_cart, _coffee_cart_to_sph,
                               _coffee_sph_to_pix)

CONVENTIONS: Dict[str, SphereConvention] = {
    "m3d": M3D,
    "replica_test": REPLICA,
    "residential": RESIDENTIAL,
    "CoffeeArea": COFFEE_AREA,
    "coffee_area": COFFEE_AREA,
}


def get_convention(name: str) -> SphereConvention:
    try:
        return CONVENTIONS[name]
    except KeyError:
        raise KeyError(
            f"unknown sphere convention {name!r}; "
            f"available: {sorted(set(CONVENTIONS))}") from None


# ---------------------------------------------------------------------------
# Shared ERP utilities (convention independent)
# ---------------------------------------------------------------------------

def sin_phi_weights(height: int, width: int | None = None) -> Array:
    """sin(phi) latitude weights at pixel centers.

    Used for WS-PSNR and polar-weighted losses (reference
    ``network/metrics.py:124-138``, ``utils/imgs_info.py``).
    Returns (H,) if ``width`` is None else (H, W).
    """
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) * (_PI / height)
    w = jnp.sin(v)
    if width is None:
        return w
    return jnp.broadcast_to(w[:, None], (height, width))


def world_rays(c2w: Array, directions: Array) -> tuple:
    """Transform camera-frame ray directions to world frame.

    :param c2w: (3, 4) or (4, 4) camera-to-world transform.
    :param directions: (..., 3) camera-frame directions.
    :return: (origins (..., 3), directions (..., 3)) in world frame.

    Mirrors reference ``network/ray_utils.py:53-71``.
    """
    rot = c2w[:3, :3]
    trans = c2w[:3, 3]
    dirs_w = jnp.einsum("ij,...j->...i", rot, directions)
    origins = jnp.broadcast_to(trans, dirs_w.shape)
    return origins, dirs_w


def pose_to_w2c(rot: Array, trans: Array) -> Array:
    """(3,3) rotation + (3,) translation -> (3,4) world-to-camera matrix."""
    return jnp.concatenate([rot, trans[..., :, None]], axis=-1)


def w2c_to_c2w(w2c: Array) -> Array:
    """Invert a (..., 3, 4) world-to-camera pose to camera-to-world."""
    rot = w2c[..., :3, :3]
    trans = w2c[..., :3, 3:]
    rot_inv = jnp.swapaxes(rot, -1, -2)
    trans_inv = -rot_inv @ trans
    return jnp.concatenate([rot_inv, trans_inv], axis=-1)


def transform_points(w2c: Array, pts: Array) -> Array:
    """Apply (3, 4) world-to-camera transform to points (..., 3)."""
    return jnp.einsum("ij,...j->...i", w2c[:3, :3], pts) + w2c[:3, 3]
