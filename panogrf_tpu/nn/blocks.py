"""ERP-aware NN building blocks (Flax, channel-last NHWC).

TPU-native re-implementations of reference L1 components:
* WrapConv family      — reference ``models/common_blocks.py:258-293``
  (WrapPadding), ``network/ops.py:6-31`` (conv3x3/conv1x1 wrappers).
* ResidualBlock        — reference ``network/ops.py:61-117``.
* BasicBlock / ResUNetLight — reference ``network/ops.py:127-455``.
* ConvINELU / UpconvINELU   — reference ``network/ops.py:199-233``.
* ConvBlock2 / Conv3DBlockv2 / UNet2 — reference
  ``models/common_blocks.py:96-535`` (the OmniSyn-style UNet runner used by
  the MVS nets).

Layout: NHWC for 2D, NDHWC for 3D (channel on TPU lanes).  Instance norm is
``nn.GroupNorm(group_size=1)``.  All spatial up/down sampling uses static
factors so shapes stay fully static under jit.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


# ---------------------------------------------------------------------------
# padding / resize primitives
# ---------------------------------------------------------------------------

def wrap_pad_2d(x: Array, pad_h: int, pad_w: int) -> Array:
    """Zero-pad latitude (H), circular-pad longitude (W). NHWC.

    Reference ``models/common_blocks.py:258-293``.
    """
    if pad_h:
        x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (0, 0), (0, 0)))
    if pad_w:
        x = jnp.concatenate([x[:, :, -pad_w:], x, x[:, :, :pad_w]], axis=2)
    return x


def wrap_pad_3d(x: Array, pad_d: int, pad_h: int, pad_w: int) -> Array:
    """Zero-pad depth & latitude, circular-pad longitude. NDHWC.

    Reference ``models/common_blocks.py:458-505`` (WrapPadding3D).
    """
    if pad_d:
        x = jnp.pad(x, ((0, 0), (pad_d, pad_d), (0, 0), (0, 0), (0, 0)))
    if pad_h:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_h, pad_h), (0, 0), (0, 0)))
    if pad_w:
        x = jnp.concatenate([x[..., -pad_w:, :], x, x[..., :pad_w, :]],
                            axis=-2)
    return x


def upsample2x_nearest(x: Array) -> Array:
    """Nearest 2x upsample over the two axes before channels (NHWC/NDHWC)."""
    for axis in range(1, x.ndim - 1)[::-1]:
        x = jnp.repeat(x, 2, axis=axis)
    return x


def _axis_linear_weights(n_in: int, n_out: int, align_corners: bool):
    if align_corners and n_out > 1:
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
        src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, n_in - 1.0)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    t = src - i0.astype(jnp.float32)
    return i0, i1, t


def resize_linear(x: Array, out_sizes: Sequence[int], *, axes: Sequence[int],
                  align_corners: bool = False) -> Array:
    """Separable linear resize supporting torch's align_corners semantics.

    XLA compiles each axis pass to two gathers + a fused blend; used for the
    UNet trilinear/bilinear up-sampling (reference interpolate calls).
    """
    for axis, n_out in zip(axes, out_sizes):
        n_in = x.shape[axis]
        if n_in == n_out:
            continue
        i0, i1, t = _axis_linear_weights(n_in, n_out, align_corners)
        x0 = jnp.take(x, i0, axis=axis)
        x1 = jnp.take(x, i1, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = n_out
        t = t.reshape(shape)
        x = x0 * (1 - t) + x1 * t
    return x


def upsample2x_bilinear(x: Array, align_corners: bool = True) -> Array:
    """2x bilinear upsample on H, W of an NHWC tensor."""
    _, h, w, _ = x.shape
    return resize_linear(x, (2 * h, 2 * w), axes=(1, 2),
                         align_corners=align_corners)


# ---------------------------------------------------------------------------
# conv modules
# ---------------------------------------------------------------------------

class WrapConv(nn.Module):
    """2D conv with ERP wrap padding (VALID conv after explicit pad).

    With ``wrap=False`` falls back to zero ('SAME'-style explicit) padding so
    one module covers both the reference's wrap and plain conv paths.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    wrap: bool = True
    padding: int | None = None  # default (k-1)//2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        p = (k - 1) // 2 if self.padding is None else self.padding
        if p:
            if self.wrap:
                x = wrap_pad_2d(x, p, p)
            else:
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(self.features, (k, k), strides=(self.stride,) * 2,
                       padding="VALID", use_bias=self.use_bias)(x)


class WrapConv3D(nn.Module):
    """3D conv over (D, H, W) with circular padding on W only."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    wrap: bool = True
    padding: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        p = (k - 1) // 2 if self.padding is None else self.padding
        if p:
            if self.wrap:
                x = wrap_pad_3d(x, p, p, p)
            else:
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)))
        return nn.Conv(self.features, (k, k, k), strides=(self.stride,) * 3,
                       padding="VALID", use_bias=self.use_bias)(x)


class InstanceNorm(nn.Module):
    """Per-channel spatial normalization with affine params.

    Equivalent to torch InstanceNorm2d(affine=True, track_running_stats=False)
    used throughout the renderer (reference ``network/ops.py:220,280``).
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.GroupNorm(num_groups=None, group_size=1,
                            epsilon=self.epsilon, use_bias=True,
                            use_scale=True)(x)


class ConvINELU(nn.Module):
    """conv -> instance norm -> ELU (reference ``network/ops.py:199-223``)."""
    features: int
    kernel_size: int = 3
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = WrapConv(self.features, self.kernel_size, wrap=self.wrap)(x)
        x = InstanceNorm()(x)
        return nn.elu(x)


class UpconvINELU(nn.Module):
    """2x bilinear upsample (align_corners) + ConvINELU.

    Reference ``network/ops.py:225-233``.
    """
    features: int
    kernel_size: int = 3
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = upsample2x_bilinear(x, align_corners=True)
        return ConvINELU(self.features, self.kernel_size, wrap=self.wrap)(x)


class ResidualBlock(nn.Module):
    """Pre-activation residual block (reference ``network/ops.py:61-117``).

    norm-relu-conv3x3-norm-relu-conv3x3 with 1x1 shortcut when dims change.
    """
    features: int
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = InstanceNorm()(x)
        h = nn.relu(h)
        h = WrapConv(self.features, 3, use_bias=False, wrap=self.wrap)(h)
        h = InstanceNorm()(h)
        h = nn.relu(h)
        h = WrapConv(self.features, 3, use_bias=False, wrap=self.wrap)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1))(x)
        return x + h


class BasicBlock(nn.Module):
    """ResNet basic block with instance norm (reference ``ops.py:127-197``)."""
    features: int
    stride: int = 1
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        h = WrapConv(self.features, 3, stride=self.stride, use_bias=False,
                     wrap=self.wrap)(x)
        h = InstanceNorm()(h)
        h = nn.relu(h)
        h = WrapConv(self.features, 3, use_bias=False, wrap=self.wrap)(h)
        h = InstanceNorm()(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False)(x)
            identity = InstanceNorm()(identity)
        return nn.relu(h + identity)


class ResUNetLight(nn.Module):
    """2D ResUNet image encoder -> ``out_dim`` features at 1/4 resolution.

    Reference ``network/ops.py:235-455``.  ``layers`` gives the BasicBlock
    counts of the three stride-2 stages (planes 32/64/128).
    """
    out_dim: int = 32
    layers: Sequence[int] = (2, 3, 6)
    inplanes: int = 32
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if x.shape[1] % 16 or x.shape[2] % 16:
            raise ValueError(
                f"ResUNetLight needs H, W divisible by 16, got "
                f"{x.shape[1]}x{x.shape[2]}")
        # stem: 7x7 stride 2
        h = x
        if self.wrap:
            h = wrap_pad_2d(h, 3, 3)
        else:
            h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)))
        h = nn.Conv(self.inplanes, (7, 7), strides=(2, 2), padding="VALID",
                    use_bias=False)(h)
        x0 = nn.relu(InstanceNorm()(h))

        def stage(h, planes, blocks):
            h = BasicBlock(planes, stride=2, wrap=self.wrap)(h)
            for _ in range(1, blocks):
                h = BasicBlock(planes, wrap=self.wrap)(h)
            return h

        x1 = stage(x0, 32, self.layers[0])    # 1/4
        x2 = stage(x1, 64, self.layers[1])    # 1/8
        x3 = stage(x2, 128, self.layers[2])   # 1/16

        h = UpconvINELU(64, wrap=self.wrap)(x3)            # 1/8
        h = jnp.concatenate([x2, h], axis=-1)
        h = ConvINELU(64, wrap=self.wrap)(h)
        h = UpconvINELU(32, wrap=self.wrap)(h)             # 1/4
        h = jnp.concatenate([x1, h], axis=-1)
        h = ConvINELU(32, wrap=self.wrap)(h)
        return nn.Conv(self.out_dim, (1, 1))(h)            # 1/4 res


# ---------------------------------------------------------------------------
# OmniSyn-style UNet blocks (MVS feature / cost nets)
# ---------------------------------------------------------------------------

class ConvBlock2(nn.Module):
    """conv-lrelu-conv-lrelu(-pool) (reference ``common_blocks.py:96-187``).

    Returns (pooled, unpooled) like the reference.
    """
    features: int
    kernel_size: int = 3
    wrap: bool = True
    use_activation: bool = True
    upscale: bool = False
    pool: bool = True
    use_residual: bool = False

    @nn.compact
    def __call__(self, x: Array) -> tuple:
        if self.upscale:
            x = resize_linear(x, (x.shape[1] * 2, x.shape[2] * 2),
                              axes=(1, 2), align_corners=False)
        h = WrapConv(self.features, self.kernel_size, wrap=self.wrap)(x)
        if self.use_activation:
            h = nn.leaky_relu(h, 0.01)
        h = WrapConv(self.features, self.kernel_size, wrap=self.wrap)(h)
        if self.use_activation:
            h = nn.leaky_relu(h, 0.01)
        if self.use_residual:
            h = h + x
        pooled = nn.avg_pool(h, (2, 2), strides=(2, 2)) if self.pool else h
        return pooled, h


class ConvBnLReLU3D(nn.Module):
    """Wrap-padded conv3d + BatchNorm + LeakyReLU (reference
    ``models/cost_reg.py:15-40`` ConvBnReLU3DWrap, inplace_abn off).

    ``bn_axis``: cross-replica SyncBN axis for shard_map/pmap data
    parallelism (see ``nn/resnet.py`` module docstring — the TPU-native
    stand-in for the reference's vendored ``sync_batchnorm``)."""
    features: int
    stride: int = 1
    wrap: bool = True
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = WrapConv3D(self.features, 3, stride=self.stride,
                       use_bias=False, wrap=self.wrap)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.bn_axis)(x)
        return nn.leaky_relu(x, 0.01)


class UpConvBn3D(nn.Module):
    """Trilinear 2x upsample + wrap-padded conv3d + BN + LeakyReLU
    (reference ``cost_reg.py:59-98`` UpConv3DWrap)."""
    features: int
    wrap: bool = True
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: Array, target_shape, train: bool = False) -> Array:
        x = resize_linear(x, tuple(target_shape), axes=(1, 2, 3),
                          align_corners=False)
        x = WrapConv3D(self.features, 3, use_bias=False, wrap=self.wrap)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.bn_axis)(x)
        return nn.leaky_relu(x, 0.01)


class CostRegNet(nn.Module):
    """MVSNet-style 3D UNet cost regularizer — the ``use_new_reg3dnet``
    alternative to :class:`UNet3D` (reference ``models/cost_reg.py:99-174``):
    8->16->32->64 strided encoder, trilinear-upsampling decoder with
    additive skips, 1-channel prob head.  NDHWC; input (B, D, H, W, C).
    """
    wrap: bool = True
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ax = self.bn_axis
        conv0 = ConvBnLReLU3D(8, wrap=self.wrap, bn_axis=ax,
                              name="conv0")(x, train)
        h = ConvBnLReLU3D(16, 2, wrap=self.wrap, bn_axis=ax,
                          name="conv1")(conv0, train)
        conv2 = ConvBnLReLU3D(16, wrap=self.wrap, bn_axis=ax,
                              name="conv2")(h, train)
        h = ConvBnLReLU3D(32, 2, wrap=self.wrap, bn_axis=ax,
                          name="conv3")(conv2, train)
        conv4 = ConvBnLReLU3D(32, wrap=self.wrap, bn_axis=ax,
                              name="conv4")(h, train)
        h = ConvBnLReLU3D(64, 2, wrap=self.wrap, bn_axis=ax,
                          name="conv5")(conv4, train)
        h = ConvBnLReLU3D(64, wrap=self.wrap, bn_axis=ax,
                          name="conv6")(h, train)
        h = conv4 + UpConvBn3D(32, wrap=self.wrap, bn_axis=ax,
                               name="conv7")(h, conv4.shape[1:4], train)
        h = conv2 + UpConvBn3D(16, wrap=self.wrap, bn_axis=ax,
                               name="conv9")(h, conv2.shape[1:4], train)
        h = conv0 + UpConvBn3D(8, wrap=self.wrap, bn_axis=ax,
                               name="conv11")(h, conv0.shape[1:4], train)
        return WrapConv3D(1, 3, use_bias=False, wrap=self.wrap,
                          name="prob")(h)


class Conv3DBlock(nn.Module):
    """conv3d-lrelu-conv3d-lrelu(-pool) over NDHWC.

    Reference ``common_blocks.py:366-455`` (Conv3DBlockv2).
    """
    features: int
    kernel_size: int = 3
    wrap: bool = True
    use_activation: bool = True
    pool: bool = True

    @nn.compact
    def __call__(self, x: Array) -> tuple:
        h = WrapConv3D(self.features, self.kernel_size, wrap=self.wrap)(x)
        if self.use_activation:
            h = nn.leaky_relu(h, 0.01)
        h = WrapConv3D(self.features, self.kernel_size, wrap=self.wrap)(h)
        if self.use_activation:
            h = nn.leaky_relu(h, 0.01)
        pooled = (nn.avg_pool(h, (2, 2, 2), strides=(2, 2, 2))
                  if self.pool else h)
        return pooled, h


class UNet3D(nn.Module):
    """3D UNet cost regularizer built from Conv3DBlock.

    Equivalent to the reference's ``UNet2`` over Conv3DBlockv2 encoders and
    decoders (``models/test_models.py:107-146``): ``num_layers`` stride-2
    encoder levels with channels base*2^i, trilinear upsampling, skip concat,
    final decoder to ``out_features``.
    """
    base_features: int = 32      # 2 ** (0 + size + 1) with size=4
    num_layers: int = 3
    out_features: int = 1
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # Encoder: num_layers pooled stages + unpooled bottleneck.
        skips = []
        h = x
        for i in range(self.num_layers):
            feats = self.base_features * (2 ** (i + 1))
            h, unpooled = Conv3DBlock(feats, wrap=self.wrap)(h)
            skips.append(unpooled)
        feats = self.base_features * (2 ** (self.num_layers + 1))
        _, h = Conv3DBlock(feats, wrap=self.wrap, pool=False)(h)

        def up(h, target):
            return resize_linear(
                h, (target.shape[1], target.shape[2], target.shape[3]),
                axes=(1, 2, 3), align_corners=False)

        # First decoder: upsample only, NO skip concat — and the deepest
        # encoder skip is never consumed.  This mirrors the reference
        # UNet2.forward exactly (``models/common_blocks.py:215-243``).
        h = up(h, skips[-1])
        _, h = Conv3DBlock(self.base_features * (2 ** (self.num_layers - 1)),
                           wrap=self.wrap, pool=False)(h)
        for i in range(self.num_layers - 2, -1, -1):
            h = up(h, skips[i])
            h = jnp.concatenate([h, skips[i]], axis=-1)
            feats = (self.base_features * (2 ** i) if i > 0
                     else self.out_features)
            _, h = Conv3DBlock(feats, wrap=self.wrap, pool=False)(h)
        return h
