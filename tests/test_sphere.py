"""Golden + round-trip tests for the canonical spherical geometry (L0).

The round-trip properties mirror the implicit invariants of reference
``network/spt_utils.py``: equi -> spherical -> cartesian -> spherical -> equi
must be the identity (away from poles), for every dataset convention.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from panogrf_tpu.core import sphere

H, W = 64, 128
CONVS = ["m3d", "replica_test", "residential", "coffee_area"]


@pytest.mark.parametrize("name", CONVS)
def test_roundtrip_equi_sphere_cart(name):
    conv = sphere.get_convention(name)
    grid = conv.pixel_grid(H, W)
    # Stay away from exact poles where longitude is degenerate.
    grid = grid[4:-4]
    sph = conv.equi_to_spherical(grid, H, W, radius=2.5)
    cart = conv.spherical_to_cartesian(sph)
    sph2 = conv.cartesian_to_spherical(cart)
    xy = conv.spherical_to_equi(sph2, H, W)
    np.testing.assert_allclose(np.asarray(sph2[..., 2]), 2.5, atol=1e-4)
    gx = np.asarray(grid[..., 0])
    xr = np.asarray(xy[..., 0])
    # Longitude is periodic with period W-1 pixels in corner mode.
    dx = np.minimum(np.abs(xr - gx), np.abs(np.abs(xr - gx) - (W - 1)))
    assert dx.max() < 5e-3
    np.testing.assert_allclose(np.asarray(xy[..., 1]), grid[..., 1], atol=5e-3)


@pytest.mark.parametrize("name", CONVS)
def test_unit_radius_directions(name):
    conv = sphere.get_convention(name)
    dirs = conv.ray_directions(H, W)
    norms = np.linalg.norm(np.asarray(dirs), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_m3d_golden_points():
    """Closed-form anchors for the m3d convention.

    theta = x/(W-1)*2pi - pi/2, phi = y/(H-1)*pi  (spt_utils.py:53-55);
    cart: x = sin(phi)cos(theta), y = cos(phi), z = sin(phi)sin(theta)
    (spt_utils.py:106-111).
    """
    conv = sphere.M3D
    # Top-left pixel: theta=-pi/2, phi=0 -> north pole (0, 1, 0).
    sph = conv.equi_to_spherical(jnp.array([0.0, 0.0]), H, W)
    cart = conv.spherical_to_cartesian(sph)
    np.testing.assert_allclose(np.asarray(cart), [0.0, 1.0, 0.0], atol=1e-6)
    # Equator, x where theta=0: x = (W-1)/4 -> dir (1, 0, 0).
    xy = jnp.array([(W - 1) / 4.0, (H - 1) / 2.0])
    cart = conv.spherical_to_cartesian(conv.equi_to_spherical(xy, H, W))
    np.testing.assert_allclose(np.asarray(cart), [1.0, 0.0, 0.0], atol=1e-6)
    # theta=pi/2 (x = (W-1)/2) -> dir (0, 0, 1).
    xy = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0])
    cart = conv.spherical_to_cartesian(conv.equi_to_spherical(xy, H, W))
    np.testing.assert_allclose(np.asarray(cart), [0.0, 0.0, 1.0], atol=1e-6)


def test_m3d_center_mode_matches_cost_volume_grid():
    """Pixel-center grid equals spherical_cost_volume.py:281-283 formulas."""
    conv = sphere.M3D
    grid = conv.pixel_grid(H, W)
    sph = conv.equi_to_spherical(grid, H, W, mode="center")
    theta = np.asarray(sph[..., 0])
    phi = np.asarray(sph[..., 1])
    xs = np.arange(W)
    ys = np.arange(H)
    theta_ref = (xs + 0.5) * (2 * np.pi / W) - np.pi / 2
    phi_ref = (ys + 0.5) * (np.pi / H)
    np.testing.assert_allclose(theta[0], theta_ref, atol=1e-5)
    np.testing.assert_allclose(phi[:, 0], phi_ref, atol=1e-5)


def test_pose_helpers_roundtrip(rng):
    # Random rotation via QR.
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=(3,))
    w2c = sphere.pose_to_w2c(jnp.asarray(q, jnp.float32),
                             jnp.asarray(t, jnp.float32))
    c2w = sphere.w2c_to_c2w(w2c)
    pts = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    cam = sphere.transform_points(w2c, pts)
    back = sphere.transform_points(c2w, cam)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_sin_phi_weights():
    w = np.asarray(sphere.sin_phi_weights(H))
    assert w.shape == (H,)
    assert w.max() <= 1.0 and w.min() > 0
    np.testing.assert_allclose(w[H // 2 - 1], w[H // 2], atol=1e-6)  # symmetric
