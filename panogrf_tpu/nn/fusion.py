"""Cube->ERP feature fusion layers (Concat / BiProj / CEE + SE).

Reference ``UniFuse-Unidirectional-Fusion/UniFuse/networks/layers.py:162-243``
(re-exported by ``models/layers.py``).  NHWC Flax modules; BatchNorm carries
``batch_stats`` like torchvision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


class Concat(nn.Module):
    """cat -> 1x1 conv -> relu (reference ``layers.py:162-172``)."""
    features: int

    @nn.compact
    def __call__(self, equi_feat: Array, c2e_feat: Array,
                 train: bool = False) -> Array:
        x = jnp.concatenate([equi_feat, c2e_feat], axis=-1)
        return nn.relu(nn.Conv(self.features, (1, 1), use_bias=False)(x))


class BiProj(nn.Module):
    """BiFuse-style gated addition (reference ``layers.py:176-192``)."""
    features: int

    @nn.compact
    def __call__(self, equi_feat: Array, c2e_feat: Array,
                 train: bool = False) -> Array:
        e = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME",
                            name="conv_e2c")(equi_feat))
        c = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME",
                            name="conv_c2e")(c2e_feat))
        mask = nn.sigmoid(nn.Conv(1, (1, 1), name="conv_mask")(
            jnp.concatenate([e, c], axis=-1)))
        return equi_feat + c * mask


class SELayer(nn.Module):
    """Squeeze-excitation (reference ``layers.py:196-211``)."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.relu(nn.Dense(c // self.reduction, use_bias=False)(y))
        y = nn.sigmoid(nn.Dense(c, use_bias=False)(y))
        return x * y[:, None, None, :]


class CEELayer(nn.Module):
    """Cube-ERP enhancement fusion (reference ``layers.py:214-242``).

    ``bn_axis``: cross-replica SyncBN axis (see ``nn/resnet.py``)."""
    features: int
    use_se: bool = True
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, equi_feat: Array, c2e_feat: Array,
                 train: bool = False) -> Array:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name,
                                       axis_name=self.bn_axis)
        x = jnp.concatenate([equi_feat, c2e_feat], axis=-1)
        x = nn.relu(bn("res_bn1")(
            nn.Conv(self.features, (1, 1), use_bias=False,
                    name="res_conv1")(x)))
        shortcut = bn("res_bn2")(
            nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="res_conv2")(x))
        x = c2e_feat + shortcut
        x = jnp.concatenate([equi_feat, x], axis=-1)
        if self.use_se:
            x = SELayer()(x)
        return nn.relu(nn.Conv(self.features, (1, 1), use_bias=False,
                               name="conv")(x))


FUSION_LAYERS = {"cat": Concat, "biproj": BiProj, "cee": CEELayer}


def make_fusion(kind: str, features: int, se: bool = True,
                bn_axis: str | None = None) -> nn.Module:
    if kind == "cee":
        return CEELayer(features, use_se=se, bn_axis=bn_axis)
    return FUSION_LAYERS[kind](features)
