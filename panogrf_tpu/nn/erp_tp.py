"""Dual-branch ERP + tangent-patch encoders.

Reference ``network/resnet_erp_tp.py:109-518`` (ResUNetLight_ERP_TP, the
optional "ERP+TP" renderer image encoder selected by
``local_feature_type: ERP+TP``) and ``models/my_erp_tp.py`` /
``my_tp_only.py`` / ``my_cube_only.py`` (mono-depth encoder variants).

Design: the tangent branch folds the N gnomonic patches into the batch
axis (like the cube encoder folds 6 faces, reference
``resnet_convert.py:101``), shares conv weights across patches, and is
resampled back to ERP at each level for fusion (Concat / BiProj / CEE).
The sphere-aware resampling is the static-grid gather of
``panogrf_tpu.core.tangent`` — no disk-cached grids, no grid_sample.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from panogrf_tpu.core import tangent
from panogrf_tpu.nn.blocks import (BasicBlock, ConvINELU, InstanceNorm,
                                   UpconvINELU, WrapConv, wrap_pad_2d)
from panogrf_tpu.nn.fusion import make_fusion

Array = jax.Array


class ERPTPEncoder(nn.Module):
    """ERP + tangent-patch ResUNet -> ``out_dim`` features at 1/4 res.

    Drop-in alternative to ``ResUNetLight`` (reference ERP+TP image
    encoder).  ``nrows`` selects the patch layout (3/4/5/6 ->
    10/18/26/46 patches, reference ``npatches_dict``).
    """
    out_dim: int = 32
    layers: Sequence[int] = (1, 2, 6)
    inplanes: int = 16
    nrows: int = 4
    patch_size: int = 64
    fov: float = 80.0
    fusion_type: str = "cee"
    se_in_fusion: bool = True
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b, h, w, c = x.shape
        npatch = tangent.NPATCHES[self.nrows]
        ps = (self.patch_size, self.patch_size)
        fov = (self.fov, self.fov)

        # tangent branch input: (B*N, ph, pw, C)
        patches = jax.vmap(lambda img: tangent.equi_to_tangent(
            img, self.nrows, ps, fov))(x)
        tp = patches.reshape(b * npatch, *ps, c)

        def stem(h_, wrap):
            if wrap:
                h_ = wrap_pad_2d(h_, 3, 3)
            else:
                h_ = jnp.pad(h_, ((0, 0), (3, 3), (3, 3), (0, 0)))
            h_ = nn.Conv(self.inplanes, (7, 7), strides=(2, 2),
                         padding="VALID", use_bias=False)(h_)
            return nn.relu(InstanceNorm()(h_))

        def stage(h_, planes, blocks, wrap):
            h_ = BasicBlock(planes, stride=2, wrap=wrap)(h_)
            for _ in range(1, blocks):
                h_ = BasicBlock(planes, wrap=wrap)(h_)
            return h_

        def tp_to_erp(feat_flat: Array, eh: int, ew: int) -> Array:
            """(B*N, fh, fw, C) -> (B, eh, ew, C)."""
            fh = feat_flat.shape[1]
            grouped = feat_flat.reshape(b, npatch, fh, fh, -1)
            return jax.vmap(lambda p: tangent.tangent_to_equi(
                p, (eh, ew), self.nrows, fov))(grouped)

        e = stem(x, self.wrap)
        t = stem(tp, False)
        planes = (32, 64, 128)
        feats = []
        for li, (pl_, nb) in enumerate(zip(planes, self.layers)):
            e = stage(e, pl_, nb, self.wrap)
            t = stage(t, pl_, nb, False)
            eh, ew = e.shape[1], e.shape[2]
            t_erp = tp_to_erp(t, eh, ew)
            e = make_fusion(self.fusion_type, pl_, self.se_in_fusion)(
                e, t_erp, train)
            feats.append(e)

        x1, x2, x3 = feats
        d = UpconvINELU(64, wrap=self.wrap)(x3)
        d = jnp.concatenate([x2, d], axis=-1)
        d = ConvINELU(64, wrap=self.wrap)(d)
        d = UpconvINELU(32, wrap=self.wrap)(d)
        d = jnp.concatenate([x1, d], axis=-1)
        d = ConvINELU(32, wrap=self.wrap)(d)
        return nn.Conv(self.out_dim, (1, 1))(d)


class TPOnlyEncoder(nn.Module):
    """Tangent-patch-only encoder (reference ``models/my_tp_only.py``):
    patch ResNet stages, resampled to ERP at the output level only."""
    out_dim: int = 32
    nrows: int = 4
    patch_size: int = 64
    fov: float = 80.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b, h, w, c = x.shape
        npatch = tangent.NPATCHES[self.nrows]
        ps = (self.patch_size, self.patch_size)
        fov = (self.fov, self.fov)
        patches = jax.vmap(lambda img: tangent.equi_to_tangent(
            img, self.nrows, ps, fov))(x)
        t = patches.reshape(b * npatch, *ps, c)
        t = BasicBlock(32, stride=2, wrap=False)(t)
        t = BasicBlock(32, stride=2, wrap=False)(t)
        t = BasicBlock(self.out_dim, wrap=False)(t)
        fh = t.shape[1]
        grouped = t.reshape(b, npatch, fh, fh, -1)
        return jax.vmap(lambda p: tangent.tangent_to_equi(
            p, (h // 4, w // 4), self.nrows, fov))(grouped)


class CubeOnlyEncoder(nn.Module):
    """Cubemap-only encoder (reference ``models/my_cube_only.py``)."""
    out_dim: int = 32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        from panogrf_tpu.core import cubemap
        b, h, w, c = x.shape
        fw = h // 2
        cube = jax.vmap(lambda img: cubemap.equi_to_cube(img, fw))(x)
        t = cube.reshape(b * 6, fw, fw, c)
        t = BasicBlock(32, stride=2, wrap=False)(t)
        t = BasicBlock(32, stride=2, wrap=False)(t)
        t = BasicBlock(self.out_dim, wrap=False)(t)
        grouped = t.reshape(b, 6, fw // 4, fw // 4, -1)
        return jax.vmap(lambda cb: cubemap.cube_to_equi(
            cb, h // 4, w // 4))(grouped)


# encoder registry mirroring the reference's Net_dict / name2... pattern
ENCODERS = {
    "ERP+TP": ERPTPEncoder,
    "TP": TPOnlyEncoder,
    "Cube": CubeOnlyEncoder,
}
