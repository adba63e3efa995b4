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


class TestMMBackwardSampler:
    """make_mm_backward_sampler: forward bit-identical to bilinear_sample,
    image gradient identical to the scatter-add transpose (the TPU
    pathology it replaces — see ops/cost_volume.py _sweep_sample)."""

    def _case(self, wrap_x, pad_mode, seed=0):
        import jax
        import jax.numpy as jnp
        from panogrf_tpu.ops.resample import (bilinear_sample,
                                              make_mm_backward_sampler)
        rng = np.random.default_rng(seed)
        h, w, c = 7, 12, 5
        img = jnp.asarray(rng.normal(size=(h, w, c)), jnp.float32)
        # coords cover interior, border, beyond-border and wrap seam;
        # includes exact-integer hits (duplicate taps must sum)
        xy = jnp.asarray(np.stack([
            rng.uniform(-3, w + 3, size=(4, 33)),
            rng.uniform(-3, h + 3, size=(4, 33))], -1), jnp.float32)
        xy = xy.at[0, 0].set(jnp.asarray([3.0, 2.0]))
        xy = xy.at[0, 1].set(jnp.asarray([w - 1.0, h - 1.0]))
        cot = jnp.asarray(rng.normal(size=(4, 33, c)), jnp.float32)
        mm = make_mm_backward_sampler(wrap_x=wrap_x, pad_mode=pad_mode)

        out_ref = bilinear_sample(img, xy, wrap_x=wrap_x, pad_mode=pad_mode)
        out_mm = mm(img, xy)
        np.testing.assert_array_equal(np.asarray(out_ref),
                                      np.asarray(out_mm))

        g_ref = jax.grad(lambda im: (bilinear_sample(
            im, xy, wrap_x=wrap_x, pad_mode=pad_mode) * cot).sum())(img)
        g_mm = jax.grad(lambda im: (mm(im, xy) * cot).sum())(img)
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_mm),
                                   rtol=1e-5, atol=1e-5)

    def test_wrap_border(self):
        self._case(True, "border")

    def test_nowrap_border(self):
        self._case(False, "border")

    def test_wrap_zeros(self):
        self._case(True, "zeros")

    def test_nowrap_zeros(self):
        self._case(False, "zeros")

    def test_chunked_padding(self):
        """Point counts that don't divide the scan chunk still sum right."""
        import jax
        import jax.numpy as jnp
        from panogrf_tpu.ops.resample import (_bilinear_grad_img,
                                              bilinear_sample)
        rng = np.random.default_rng(3)
        h, w, c = 5, 9, 3
        img = jnp.asarray(rng.normal(size=(h, w, c)), jnp.float32)
        xy = jnp.asarray(rng.uniform(0, 8, size=(11, 2)), jnp.float32)
        cot = jnp.asarray(rng.normal(size=(11, c)), jnp.float32)
        g_ref = jax.grad(lambda im: (bilinear_sample(
            im, xy, wrap_x=True) * cot).sum())(img)
        g_mm = _bilinear_grad_img(cot, xy, h, w, True, chunk=4)
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_mm),
                                   rtol=1e-5, atol=1e-5)

    def test_mvs_model_grads_match_scatter_path(self):
        """End-to-end: MVS train-step gradients with the mm-backward sweep
        equal the scatter-path gradients (flag off)."""
        import jax
        import jax.numpy as jnp
        from panogrf_tpu.core.sphere import get_convention
        from panogrf_tpu.ops import cost_volume as cv
        rng = np.random.default_rng(11)
        h4, w4, c, d = 8, 16, 6, 5
        conv = get_convention("m3d")
        rf = jnp.asarray(rng.normal(size=(h4, w4, c)), jnp.float32)
        sf = jnp.asarray(rng.normal(size=(h4, w4, c)), jnp.float32)
        dv = jnp.asarray(rng.uniform(0.5, 8.0, size=(d, h4, w4)),
                         jnp.float32)
        rot = jnp.stack([jnp.eye(3), jnp.eye(3)])
        tr = jnp.zeros((2, 3)).at[0, 2].set(0.3)

        def loss(sfx, mm):
            cvol = cv.spherical_sweep_cost(rf, sfx, dv, rot[1], tr[1],
                                           rot[0], tr[0], conv,
                                           mm_backward=mm)
            return (cvol ** 2).sum()

        g_mm = jax.grad(lambda s: loss(s, True))(sf)
        g_sc = jax.grad(lambda s: loss(s, False))(sf)
        np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_sc),
                                   rtol=1e-4, atol=1e-4)
