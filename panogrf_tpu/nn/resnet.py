"""Flax ResNet-18/34 encoders (torchvision-compatible layout, NHWC).

Used as the ERP and cubemap encoders of UniFuse and the Equi feature net
(reference ``models/resnet.py``, applied in ``models/unifuse.py:33-47`` and
``models/my_equi.py:52-64``).  Only the feature-pyramid forward is
implemented (no fc head) because every consumer taps the 5 levels:
[conv1+bn+relu (1/2), layer1 (1/4), layer2 (1/8), layer3 (1/16),
layer4 (1/32)].

``wrap=True`` applies ERP wrap padding to every conv (the reference's
``erp_convert`` module rewriter, ``models/convert_module.py:29``); cube
encoders use ``wrap=False`` (plain zero padding).

BatchNorm follows torchvision semantics: running stats are Flax
``batch_stats`` collections; pass ``train=True`` to update them.

``bn_axis`` is the cross-replica (SyncBN) switch — the TPU-native
equivalent of the reference's vendored ``sync_batchnorm/batchnorm.py``:
set it to a mesh axis name (e.g. ``'data'``) when the module runs inside
``shard_map``/``pmap`` over that axis and BatchNorm reduces its batch
statistics across replicas via ``lax.pmean``.  Leave ``None`` under plain
``jit`` — with GSPMD-sharded batches, XLA already computes GLOBAL batch
statistics (sharded-axis reductions are all-reduced automatically), so
SyncBN is implicit; the explicit axis is only for per-replica traces.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from panogrf_tpu.nn.blocks import wrap_pad_2d

Array = jax.Array


class _ConvPad(nn.Module):
    """Conv with explicit wrap/zero padding (VALID conv after pad)."""
    features: int
    kernel: int
    stride: int = 1
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = (self.kernel - 1) // 2
        if p:
            if self.wrap:
                x = wrap_pad_2d(x, p, p)
            else:
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(self.features, (self.kernel,) * 2,
                       strides=(self.stride,) * 2, padding="VALID",
                       use_bias=False)(x)


class _BN(nn.Module):
    bn_axis: str | None = None   # cross-replica SyncBN axis (module doc)

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, axis_name=self.bn_axis)(x)


class ResNetBasicBlock(nn.Module):
    features: int
    stride: int = 1
    wrap: bool = True
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        identity = x
        h = _ConvPad(self.features, 3, self.stride, self.wrap)(x)
        h = _BN(self.bn_axis)(h, train)
        h = nn.relu(h)
        h = _ConvPad(self.features, 3, 1, self.wrap)(h)
        h = _BN(self.bn_axis)(h, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            identity = _BN(self.bn_axis, name="downsample_bn")(identity,
                                                               train)
        return nn.relu(h + identity)


class ResNetEncoder(nn.Module):
    """ResNet-18/34 feature pyramid.

    :return: list of 5 NHWC feature maps at strides [2, 4, 8, 16, 32] with
        channels [64, 64, 128, 256, 512].
    """
    block_counts: Sequence[int] = (2, 2, 2, 2)  # resnet18
    wrap: bool = True
    bn_axis: str | None = None   # SyncBN mesh axis (module docstring)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> list:
        feats = []
        h = _ConvPad(64, 7, 2, self.wrap)(x)
        h = _BN(self.bn_axis)(h, train)
        h = nn.relu(h)
        feats.append(h)                                   # 1/2, 64
        # torchvision maxpool: k3 s2 p1
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        for i, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.block_counts)):
            stride = 1 if i == 0 else 2
            h = ResNetBasicBlock(planes, stride, self.wrap,
                                 self.bn_axis)(h, train)
            for _ in range(1, blocks):
                h = ResNetBasicBlock(planes, 1, self.wrap,
                                     self.bn_axis)(h, train)
            feats.append(h)
        return feats


def resnet18(wrap: bool = True, bn_axis: str | None = None) -> ResNetEncoder:
    return ResNetEncoder((2, 2, 2, 2), wrap, bn_axis)


def resnet34(wrap: bool = True, bn_axis: str | None = None) -> ResNetEncoder:
    return ResNetEncoder((3, 4, 6, 3), wrap, bn_axis)


# ---------------------------------------------------------------------------
# MobileNetV2 encoder (reference ``models/mobilenet.py:82-207``, the
# ``num_layers == 2`` choice of the UniFuse/Equi encoder dict,
# ``models/unifuse.py:33``).
# ---------------------------------------------------------------------------

class _ConvBNReLU6(nn.Module):
    """conv(+groups) -> BN -> ReLU6 (reference ``mobilenet.py:38-48``)."""
    features: int
    kernel: int = 3
    stride: int = 1
    depthwise: bool = False
    wrap: bool = True
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        p = (self.kernel - 1) // 2
        if p:
            if self.wrap:
                x = wrap_pad_2d(x, p, p)
            else:
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        groups = x.shape[-1] if self.depthwise else 1
        x = nn.Conv(self.features, (self.kernel,) * 2,
                    strides=(self.stride,) * 2, padding="VALID",
                    feature_group_count=groups, use_bias=False)(x)
        x = _BN(self.bn_axis)(x, train)
        return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    """MobileNetV2 block (reference ``mobilenet.py:50-80``)."""
    features: int
    stride: int = 1
    expand_ratio: int = 6
    wrap: bool = True
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        h = x
        if self.expand_ratio != 1:
            h = _ConvBNReLU6(hidden, 1, wrap=self.wrap,
                             bn_axis=self.bn_axis)(h, train)
        h = _ConvBNReLU6(hidden, 3, self.stride, depthwise=True,
                         wrap=self.wrap, bn_axis=self.bn_axis)(h, train)
        h = nn.Conv(self.features, (1, 1), use_bias=False)(h)
        h = _BN(self.bn_axis)(h, train)
        if self.stride == 1 and inp == self.features:
            return x + h
        return h


# (expand_ratio, channels, repeats, stride) — reference mobilenet.py:110-119
_MBV2_SETTING = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                 (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                 (6, 320, 1, 1))


class MobileNetV2Encoder(nn.Module):
    """MobileNetV2 5-tap feature pyramid, same interface as
    :class:`ResNetEncoder`.

    Tap points match reference ``mobilenet.py:168-201``: features after
    Sequential indices [0:2], [2:4], [4:7], [7:14], [14:18] -> channels
    (16, 24, 32, 96, 320) at strides (2, 4, 8, 16, 32).
    """
    wrap: bool = True
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> list:
        h = _ConvBNReLU6(32, 3, 2, wrap=self.wrap,
                         bn_axis=self.bn_axis)(x, train)       # features[0]
        feats = []
        block_idx = 1
        taps = {2, 4, 7, 14, 18}
        for t, c, n, s in _MBV2_SETTING:
            for i in range(n):
                if block_idx in taps:
                    feats.append(h)
                h = InvertedResidual(c, s if i == 0 else 1, t,
                                     self.wrap, self.bn_axis)(h, train)
                block_idx += 1
        feats.append(h)                                        # after [17]
        return feats


def mobilenet_v2(wrap: bool = True,
                 bn_axis: str | None = None) -> MobileNetV2Encoder:
    return MobileNetV2Encoder(wrap, bn_axis)
