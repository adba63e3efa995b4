"""Ray-feature initialization net (CostVolumeInitNet equivalent).

Reference ``network/init_net.py:423-646``: per reference view, encode the
image with a ResUNet, encode the (frozen) MVS or mono depth in normalized
inverse-depth space, concatenate and project to 32-ch ray features.

The frozen depth stack itself is NOT a submodule here (see
``panogrf_tpu/models/mvs.py`` docstring): callers pass ``mvs_depth`` in.
Note the reference computes a softmaxed ``cost_reg`` volume too but its
consumer (``volume_conv2d``) is commented out (``init_net.py:533-537,
608-636``) — only the depth is actually used, so we drop the dead path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from panogrf_tpu.nn.blocks import (ResUNetLight, ResidualBlock, WrapConv,
                                   InstanceNorm, resize_linear)

Array = jax.Array


def normalize_inverse_depth(depth: Array, min_depth: float,
                            max_depth: float) -> Array:
    """Depth -> clamped normalized inverse depth (disparity).

    Reference ``init_net.py:112-124`` (extract_depth_for_init_impl).
    """
    near_inv = -1.0 / min_depth
    far_inv = -1.0 / max_depth
    d = -1.0 / jnp.maximum(depth, 1e-5)
    d = (d - near_inv) / (far_inv - near_inv)
    return jnp.clip(d, 0.0, 1.0)


class _ConvResConv(nn.Module):
    """conv3x3 -> ResidualBlock(s) -> conv1x1 head used by init/vis nets
    (reference ``init_net.py:539-574``, ``vis_encoder.py:17-22``)."""
    features: int
    num_res: int = 1
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = WrapConv(self.features, 3, use_bias=False, wrap=self.wrap)(x)
        for _ in range(self.num_res):
            x = ResidualBlock(self.features, wrap=self.wrap)(x)
        return nn.Conv(self.features, (1, 1), use_bias=False)(x)


class CostVolumeInitNet(nn.Module):
    """(ref imgs, mvs depth) -> 32-ch ray features at 1/4 depth-res.

    :param depth_hw: the MVS working resolution (depth_height, depth_width);
        ray features come out at depth_hw/4.
    """
    depth_hw: tuple = (256, 512)
    min_depth: float = 0.1          # mvs depth range for normalization
    max_depth: float = 10.0
    feat_dim: int = 32
    wrap: bool = True
    # 'ERP' or 'ERP+TP' (reference init_net_feature_type,
    # ``init_net.py:516-524``)
    feature_type: str = "ERP"
    nrows: int = 4
    patch_size: int = 64

    @nn.compact
    def __call__(self, imgs: Array, mvs_depth: Array) -> Array:
        """
        :param imgs: (rfn, H, W, 3) reference images (render resolution).
        :param mvs_depth: (rfn, dh, dw, 1) frozen depth (any resolution).
        :return: ray_feats (rfn, dh/4, dw/4, feat_dim).
        """
        dh, dw = self.depth_hw
        x = resize_linear(imgs, (dh, dw), axes=(1, 2))
        if self.feature_type == "ERP+TP":
            from panogrf_tpu.nn.erp_tp import ERPTPEncoder
            ref_feats = ERPTPEncoder(
                out_dim=self.feat_dim, layers=(2, 3, 6), inplanes=32,
                nrows=self.nrows, patch_size=self.patch_size,
                wrap=self.wrap, name="res_net")(x)
        else:
            ref_feats = ResUNetLight(
                out_dim=self.feat_dim, layers=(2, 3, 6), inplanes=32,
                wrap=self.wrap, name="res_net")(x)     # (rfn, dh/4, dw/4)

        depth = normalize_inverse_depth(mvs_depth, self.min_depth,
                                        self.max_depth)
        if depth.shape[1] != dh or depth.shape[2] != dw:
            depth = resize_linear(depth, (dh, dw), axes=(1, 2))
        depth = resize_linear(depth, (dh // 4, dw // 4), axes=(1, 2))
        depth_feats = _ConvResConv(32, wrap=self.wrap,
                                   name="depth_conv")(depth)

        out = jnp.concatenate([ref_feats, depth_feats], axis=-1)
        return _ConvResConv(self.feat_dim, wrap=self.wrap,
                            name="out_conv")(out)


class DefaultVisEncoder(nn.Module):
    """[img feats ⊕ init ray feats] -> refined ray feats (reference
    ``network/vis_encoder.py:6-33``)."""
    feat_dim: int = 32
    wrap: bool = True

    @nn.compact
    def __call__(self, ray_feats: Array, img_feats: Array) -> Array:
        if img_feats.shape[1:3] != ray_feats.shape[1:3]:
            img_feats = resize_linear(
                img_feats, (ray_feats.shape[1], ray_feats.shape[2]),
                axes=(1, 2))
        x = jnp.concatenate([img_feats, ray_feats], axis=-1)
        x = WrapConv(32, 3, use_bias=False, wrap=self.wrap)(x)
        x = ResidualBlock(32, wrap=self.wrap)(x)
        x = ResidualBlock(32, wrap=self.wrap)(x)
        return nn.Conv(32, (1, 1), use_bias=False)(x)
