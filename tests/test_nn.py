"""Shape and behavior tests for the L1 NN building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panogrf_tpu.nn import blocks


def _init_apply(mod, *args, **kwargs):
    # Eager dispatch costs ~4ms/op on this box — always jit in tests.
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), *args, **kwargs)
    out = jax.jit(mod.apply)(variables, *args, **kwargs)
    return variables, out


def test_wrap_pad_2d_seam():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 2, 4, 1)
    p = blocks.wrap_pad_2d(x, 1, 1)
    assert p.shape == (1, 4, 6, 1)
    np.testing.assert_allclose(np.asarray(p[0, 1, 0, 0]), 3.0)  # wraps W
    np.testing.assert_allclose(np.asarray(p[0, 0, :, 0]), 0.0)  # zero H


def test_wrapconv_longitude_equivariance():
    """An ERP conv must commute with a longitude roll (no seam artifacts)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 16, 3)),
                    jnp.float32)
    mod = blocks.WrapConv(4, 3)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    y1 = jax.jit(mod.apply)(variables, jnp.roll(x, 5, axis=2))
    y2 = jnp.roll(jax.jit(mod.apply)(variables, x), 5, axis=2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_residual_block_shapes():
    x = jnp.ones((2, 8, 16, 16))
    _, y = _init_apply(blocks.ResidualBlock(32), x)
    assert y.shape == (2, 8, 16, 32)


def test_basic_block_stride():
    x = jnp.ones((1, 8, 16, 8))
    _, y = _init_apply(blocks.BasicBlock(16, stride=2), x)
    assert y.shape == (1, 4, 8, 16)


def test_resunet_light_quarter_res():
    x = jnp.ones((1, 32, 64, 3))
    mod = blocks.ResUNetLight(out_dim=32, layers=(1, 1, 1), inplanes=16)
    _, y = _init_apply(mod, x)
    assert y.shape == (1, 8, 16, 32)


def test_resize_linear_align_corners():
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 4, 1)
    y = blocks.resize_linear(x, (8,), axes=(2,), align_corners=True)
    # endpoints preserved with align_corners
    assert float(y[0, 0, 0, 0]) == 0.0
    assert abs(float(y[0, 0, -1, 0]) - 3.0) < 1e-6


def test_unet3d_shapes():
    x = jnp.ones((1, 8, 8, 16, 4))  # (B, D, H, W, C)
    mod = blocks.UNet3D(base_features=4, num_layers=2, out_features=1)
    _, y = _init_apply(mod, x)
    assert y.shape == (1, 8, 8, 16, 1)


def test_conv3d_wrap_equivariance():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 4, 8, 2)),
                    jnp.float32)
    mod = blocks.WrapConv3D(3, 3)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    y1 = jax.jit(mod.apply)(variables, jnp.roll(x, 3, axis=3))
    y2 = jnp.roll(jax.jit(mod.apply)(variables, x), 3, axis=3)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_mobilenet_v2_encoder_taps():
    """MobileNetV2 encoder: reference tap channels/strides
    (mobilenet.py:168-201, num_ch_enc = [16, 24, 32, 96, 320])."""
    from panogrf_tpu.nn.resnet import mobilenet_v2
    m = mobilenet_v2()
    x = jnp.zeros((1, 64, 128, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert [f.shape for f in feats] == [
        (1, 32, 64, 16), (1, 16, 32, 24), (1, 8, 16, 32),
        (1, 4, 8, 96), (1, 2, 4, 320)]
