"""Tests for ERP bilinear resampling and ERP<->cube round trips."""

import numpy as np
import jax.numpy as jnp

from panogrf_tpu.ops import resample
from panogrf_tpu.core import cubemap, sphere


def test_bilinear_identity(rng):
    img = jnp.asarray(rng.normal(size=(16, 32, 4)), jnp.float32)
    grid = sphere.M3D.pixel_grid(16, 32)
    out = resample.bilinear_sample(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_bilinear_midpoint():
    img = jnp.zeros((4, 8, 1)).at[1, 2, 0].set(1.0).at[1, 3, 0].set(3.0)
    out = resample.bilinear_sample(img, jnp.array([2.5, 1.0]))
    np.testing.assert_allclose(np.asarray(out), [2.0], atol=1e-6)


def test_bilinear_wrap_seam():
    """x between W-1 and W interpolates across the longitude seam."""
    img = jnp.zeros((4, 8, 1)).at[2, 7, 0].set(2.0).at[2, 0, 0].set(4.0)
    out = resample.bilinear_sample(img, jnp.array([7.5, 2.0]), wrap_x=True)
    np.testing.assert_allclose(np.asarray(out), [3.0], atol=1e-6)


def test_interpolate_feats_rescales(rng):
    """Sampling a half-res feature map with full-res coords lands right."""
    feats = jnp.asarray(rng.normal(size=(2, 8, 16, 3)), jnp.float32)
    # Full-res frame is 16x32; corner coordinate (31, 15) -> feature (15, 7).
    pts = jnp.broadcast_to(jnp.array([[31.0, 15.0]]), (2, 1, 2))
    out = resample.interpolate_feats(feats, pts, 16, 32)
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               np.asarray(feats[:, 7, 15]), atol=1e-5)


def test_cube_roundtrip_smooth():
    """ERP -> cube -> ERP reproduces a smooth function away from poles."""
    H, W = 64, 128
    conv = sphere.M3D
    dirs = conv.ray_directions(H, W)  # (H, W, 3) smooth on sphere
    img = (dirs * 0.5 + 0.5).astype(jnp.float32)
    cube = cubemap.equi_to_cube(img, H // 2)
    back = cubemap.cube_to_equi(cube, H, W)
    err = np.abs(np.asarray(back) - np.asarray(img))[4:-4]
    assert err.mean() < 0.01 and err.max() < 0.06


def test_cube_faces_orientation():
    """Front face center looks along +z (m3d 'front' = lon 0 in py360 frame)."""
    H, W = 64, 128
    conv = sphere.M3D
    # Build an ERP image encoding the py360 longitude/latitude.
    grid = conv.pixel_grid(H, W)
    lon = (grid[..., 0] + 0.5 - 0.0) / W  # just x fraction
    img = jnp.stack([lon, grid[..., 1] / H, jnp.zeros_like(lon)], axis=-1)
    cube = cubemap.equi_to_cube(img, 32)
    # py360 lon=atan2(x,z): front face (z=+0.5) center has lon=0 ->
    # ERP x fraction 0.5 (coor_x=(lon/2pi+0.5)*W).
    center = np.asarray(cube[0, 16, 16, 0])
    assert abs(center - 0.5) < 0.02


def test_strip_layout_roundtrip(rng):
    cube = jnp.asarray(rng.normal(size=(6, 8, 8, 2)), jnp.float32)
    strip = cubemap.stacked_to_strip(cube)
    assert strip.shape == (8, 48, 2)
    back = cubemap.strip_to_stacked(strip, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cube))


def test_zdepth_cosine_range():
    cos = np.asarray(cubemap.zdepth_cosine(16))
    assert cos.max() <= 1.0 + 1e-6
    assert cos.min() > 1.0 / np.sqrt(3) - 1e-3  # corner of the cube
