"""Tangent-patch projection tests (round trip + layout)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panogrf_tpu.core import tangent


def test_patch_counts():
    for nrows, n in tangent.NPATCHES.items():
        assert tangent.patch_centers(nrows).shape == (n, 2)


@pytest.mark.parametrize("nrows", [3, 4])
def test_roundtrip_smooth(nrows):
    """ERP -> patches -> ERP reproduces a smooth function away from poles."""
    H, W = 64, 128
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    lat = (2 * ys / (H - 1) - 1) * np.pi / 2
    lon = (2 * xs / (W - 1) - 1) * np.pi
    img = np.stack([np.sin(2 * lon) * np.cos(lat), np.sin(lat),
                    np.cos(lon) * np.cos(lat)], -1).astype(np.float32)
    img = jnp.asarray(img * 0.5 + 0.5)
    patches = tangent.equi_to_tangent(img, nrows, (64, 64), (80.0, 80.0))
    assert patches.shape == (tangent.NPATCHES[nrows], 64, 64, 3)
    back = tangent.tangent_to_equi(patches, (H, W), nrows, (80.0, 80.0))
    err = np.abs(np.asarray(back) - np.asarray(img))[6:-6]
    assert err.mean() < 0.02, err.mean()


def test_patch_ownership_covers_all():
    idx, xy = tangent._p2e_grid(32, 64, 4, 32, 32, 80.0, 80.0)
    assert idx.min() >= 0 and idx.max() < 18
    # every in-patch coordinate stays within FOV extents (valid gnomonic)
    assert np.isfinite(xy).all()
