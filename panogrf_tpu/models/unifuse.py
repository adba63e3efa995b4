"""UniFuse 360° monocular depth + Equi feature network (Flax, NHWC).

TPU-native rebuild of:
* ``UniFuse`` — reference ``models/unifuse.py:13-203``: ResNet ERP encoder +
  ResNet cubemap encoder (6 faces folded into batch), per-level cube->ERP
  resampling fused into the ERP decoder, sigmoid depth head.
* ``Equi``    — reference ``models/my_equi.py:15-153``: ERP-only encoder/
  decoder returning 32-ch features at 1/4 resolution (the MVS feature net
  selected by ``net: "Equi"`` in all shipped configs).

Differences from the reference by design:
* cube tensors use the stacked (B, 6, fw, fw, C) layout; the reference's
  horizontal-strip split/cat dance (``models/unifuse.py:128,151``) becomes a
  single reshape.
* cube->ERP resampling is the static-grid gather of
  :mod:`panogrf_tpu.core.cubemap` — no CPU round trip, no grid_sample.
* optional ``uncertainty=True`` adds the 2-channel (mu, sigma) head used by
  ``mono_uncertainty`` configs (reference ``select_mononet.py:4-138``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from panogrf_tpu.core import cubemap
from panogrf_tpu.nn.fusion import make_fusion
from panogrf_tpu.nn.blocks import upsample2x_nearest, wrap_pad_2d

Array = jax.Array

# torchvision-resnet18 encoder channels / decoder channels, reference
# ``models/unifuse.py:49-57``.
NUM_CH_ENC = (64, 64, 128, 256, 512)
NUM_CH_DEC = (16, 32, 64, 128, 256)

# ImageNet normalization applied to mono inputs (reference
# ``network/omni_mvsnet/pipeline3_model.py`` normalize_input).
IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def normalize_imagenet(x: Array) -> Array:
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def _make_encoder(num_layers: int):
    """Encoder choice (reference ``models/unifuse.py:33-39``:
    {2: mobilenet_v2, 18: resnet18, 34: resnet34, ...})."""
    from panogrf_tpu.nn import resnet as R
    if num_layers == 2:
        return R.MobileNetV2Encoder
    if num_layers == 18:
        return lambda **kw: R.ResNetEncoder((2, 2, 2, 2), **kw)
    if num_layers == 34:
        return lambda **kw: R.ResNetEncoder((3, 4, 6, 3), **kw)
    raise ValueError(f"unsupported num_layers {num_layers} "
                     "(2=mobilenet_v2, 18, 34)")


class ConvELU(nn.Module):
    """Conv3x3 (zero or wrap pad) + ELU, reference ``UniFuse…/networks/
    layers.py:7-61`` (Conv3x3/Conv3x3_wrap + ConvBlock)."""
    features: int
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.wrap:
            x = wrap_pad_2d(x, 1, 1)
        else:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.Conv(self.features, (3, 3), padding="VALID")(x)
        return nn.elu(x)


class Conv3x3Head(nn.Module):
    """Plain padded conv3x3 output head (no activation)."""
    features: int
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.wrap:
            x = wrap_pad_2d(x, 1, 1)
        else:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return nn.Conv(self.features, (3, 3), padding="VALID")(x)


class UniFuse(nn.Module):
    """Two-branch 360 mono-depth network.

    Inputs: ``equi`` (B, H, W, 3) and ``cube`` (B, 6, H/2, H/2, 3), both
    already ImageNet-normalized.  Returns a dict with ``pred_depth``
    (B, H, W, 1), ``mono_feat`` (B, H/2, W/2, 32 — the deconv_1 tap the
    MVS pipeline consumes) and, with ``uncertainty=True``, ``pred``
    (B, H, W, 2) = (mu, sigma).
    """
    max_depth: float = 10.0
    min_depth: float = 0.1
    fusion_type: str = "cee"
    se_in_fusion: bool = True
    wrap: bool = True
    out_type: str = "depth"          # 'depth' | 'disparity'
    uncertainty: bool = False
    num_layers: int = 18
    # cross-replica SyncBN axis for shard_map data parallelism (the
    # TPU-native equivalent of the reference's sync_batchnorm; see
    # ``nn/resnet.py`` module docstring)
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, equi: Array, cube: Array, train: bool = False) -> dict:
        b, h, w, _ = equi.shape
        assert cube.shape[1] == 6 and cube.shape[2] == h // 2

        enc = _make_encoder(self.num_layers)
        equi_feats = enc(wrap=self.wrap, bn_axis=self.bn_axis,
                         name="equi_encoder")(equi, train)
        cube_flat = cube.reshape(b * 6, *cube.shape[2:])
        cube_feats = enc(wrap=False, bn_axis=self.bn_axis,
                         name="cube_encoder")(cube_flat, train)

        def c2e(feat_flat: Array, level: int) -> Array:
            """Cube feature (B*6, fh, fw, C) -> ERP (B, eh, ew, C)."""
            fw = feat_flat.shape[1]
            eh, ew = h >> level, w >> level
            stacked = feat_flat.reshape(b, 6, fw, fw, -1)
            return jax.vmap(lambda cb: cubemap.cube_to_equi(cb, eh, ew))(
                stacked)

        def fusion(i: int, equi_f: Array, cube_f: Array, level: int) -> Array:
            c2e_f = c2e(cube_f, level)
            return make_fusion(self.fusion_type, equi_f.shape[-1],
                               self.se_in_fusion,
                               bn_axis=self.bn_axis)(equi_f, c2e_f, train)

        outputs = {}
        # level indices: enc feats at strides 2,4,8,16,32 -> levels 1..5
        x = fusion(5, equi_feats[4], cube_feats[4], 5)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[4], self.wrap)(x))  # 1/16

        f3 = fusion(4, equi_feats[3], cube_feats[3], 4)
        x = jnp.concatenate([x, f3], axis=-1)
        x = ConvELU(NUM_CH_DEC[4], self.wrap)(x)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[3], self.wrap)(x))  # 1/8

        f2 = fusion(3, equi_feats[2], cube_feats[2], 3)
        x = jnp.concatenate([x, f2], axis=-1)
        x = ConvELU(NUM_CH_DEC[3], self.wrap)(x)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[2], self.wrap)(x))  # 1/4

        f1 = fusion(2, equi_feats[1], cube_feats[1], 2)
        x = jnp.concatenate([x, f1], axis=-1)
        x = ConvELU(NUM_CH_DEC[2], self.wrap)(x)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[1], self.wrap)(x))  # 1/2

        f0 = fusion(1, equi_feats[0], cube_feats[0], 1)
        x = jnp.concatenate([x, f0], axis=-1)
        x = ConvELU(NUM_CH_DEC[1], self.wrap)(x)
        # The MVS pipeline consumes this deconv_1 feature (32ch @ 1/2 res) —
        # reference ``UniFuse…/networks/unifuse.py:170-174`` (NOT the
        # deconv_2 tap of the standalone ``models/unifuse.py:178``).
        outputs["mono_feat"] = x
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[0], self.wrap)(x))  # 1/1

        x = ConvELU(NUM_CH_DEC[0], self.wrap)(x)
        equi_out = Conv3x3Head(1, self.wrap)(x)

        if self.out_type == "disparity":
            max_disp, min_disp = 1.0 / self.min_depth, 1.0 / self.max_depth
            disp = nn.sigmoid(equi_out) * (max_disp - min_disp) + min_disp
            depth = 1.0 / disp
        else:
            depth = self.max_depth * nn.sigmoid(equi_out)
        outputs["pred_depth"] = depth

        if self.uncertainty:
            # (mu, sigma) head: conv3x3 over the penultimate features, like
            # the reference's mono uncertainty wrapper.
            pred = Conv3x3Head(2, self.wrap, name="uncert_head")(x)
            mu = self.max_depth * nn.sigmoid(pred[..., :1])
            sigma = nn.softplus(pred[..., 1:]) + 1e-3
            outputs["pred"] = jnp.concatenate([mu, sigma], axis=-1)
        return outputs


class Equi(nn.Module):
    """ERP-only encoder/decoder -> 32-ch features at 1/4 resolution.

    Reference ``models/my_equi.py:100-141`` (the shipped MVS feature net).
    Optional ``with_sin`` appends a sin(phi) channel to the input (reference
    ``my_equi.py:32-47,106-109``).
    """
    wrap: bool = True
    with_sin: bool = False
    num_layers: int = 18
    bn_axis: str | None = None   # SyncBN axis (see UniFuse)

    @nn.compact
    def __call__(self, equi: Array, train: bool = False) -> Array:
        if self.with_sin:
            b, h, w, _ = equi.shape
            import math
            phi = jnp.sin((jnp.arange(h, dtype=jnp.float32) + 0.5)
                          * math.pi / h)
            sin_map = jnp.broadcast_to(phi[None, :, None, None], (b, h, w, 1))
            equi = jnp.concatenate([equi, sin_map], axis=-1)
        feats = _make_encoder(self.num_layers)(
            wrap=self.wrap, bn_axis=self.bn_axis,
            name="equi_encoder")(equi, train)

        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[4], self.wrap)(feats[4]))
        x = jnp.concatenate([x, feats[3]], axis=-1)
        x = ConvELU(NUM_CH_DEC[4], self.wrap)(x)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[3], self.wrap)(x))
        x = jnp.concatenate([x, feats[2]], axis=-1)
        x = ConvELU(NUM_CH_DEC[3], self.wrap)(x)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[2], self.wrap)(x))
        x = jnp.concatenate([x, feats[1]], axis=-1)
        x = ConvELU(NUM_CH_DEC[2], self.wrap)(x)
        return ConvELU(NUM_CH_DEC[1], self.wrap)(x)   # (B, H/4, W/4, 32)


class EquiDepth(nn.Module):
    """ERP-only mono-depth network (full decoder to sigmoid depth).

    Reference ``UniFuse…/networks/equi.py:14-115`` — the ``Equi`` choice of
    the ``select_mono`` factory (``select_mononet.py:13``), i.e. UniFuse
    without the cubemap branch.  Same decoder ladder, depth head
    ``max_depth * sigmoid`` and optional (mu, sigma) uncertainty head as
    :class:`UniFuse`.
    """
    max_depth: float = 10.0
    wrap: bool = True
    uncertainty: bool = False
    num_layers: int = 18
    bn_axis: str | None = None   # SyncBN axis (see UniFuse)

    @nn.compact
    def __call__(self, equi: Array, train: bool = False) -> dict:
        feats = _make_encoder(self.num_layers)(
            wrap=self.wrap, bn_axis=self.bn_axis,
            name="equi_encoder")(equi, train)
        outputs = {}
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[4], self.wrap)(feats[4]))
        x = jnp.concatenate([x, feats[3]], axis=-1)
        x = ConvELU(NUM_CH_DEC[4], self.wrap)(x)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[3], self.wrap)(x))  # 1/8
        x = jnp.concatenate([x, feats[2]], axis=-1)
        x = ConvELU(NUM_CH_DEC[3], self.wrap)(x)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[2], self.wrap)(x))  # 1/4
        x = jnp.concatenate([x, feats[1]], axis=-1)
        x = ConvELU(NUM_CH_DEC[2], self.wrap)(x)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[1], self.wrap)(x))  # 1/2
        x = jnp.concatenate([x, feats[0]], axis=-1)
        x = ConvELU(NUM_CH_DEC[1], self.wrap)(x)
        outputs["mono_feat"] = x          # deconv_1 tap, like UniFuse
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[0], self.wrap)(x))  # 1/1
        x = ConvELU(NUM_CH_DEC[0], self.wrap)(x)
        equi_out = Conv3x3Head(1, self.wrap)(x)
        outputs["pred_depth"] = self.max_depth * nn.sigmoid(equi_out)
        if self.uncertainty:
            pred = Conv3x3Head(2, self.wrap, name="uncert_head")(x)
            mu = self.max_depth * nn.sigmoid(pred[..., :1])
            sigma = nn.softplus(pred[..., 1:]) + 1e-3
            outputs["pred"] = jnp.concatenate([mu, sigma], axis=-1)
        return outputs


class ERPTPDepth(nn.Module):
    """ERP + tangent-patch mono-depth net (the ERP_TP_Fuse ablation,
    reference ``models/my_erp_tp.py:66-272``).

    Like :class:`UniFuse` but the second branch encodes N gnomonic
    tangent patches instead of 6 cube faces; per-level patch features are
    resampled to ERP (``core.tangent``, replacing the reference's
    ``pers2equi`` grid_sample) and fused into the ERP decoder.  The
    reference folds the patch axis into a Conv3d depth dim
    (``convert_conv``, ``my_erp_tp.py:20-42``) purely to share weights
    across patches — here patches fold into the batch axis (one reshape,
    same sharing).  The reference variant stops at 1/4-res features (its
    depth head is commented out); as a *mono* net this restores the full
    UniFuse ladder + ``max_depth * sigmoid`` head so it trains under
    ``tools/train_mono.py``.
    """
    max_depth: float = 10.0
    fusion_type: str = "cee"
    se_in_fusion: bool = True
    wrap: bool = True
    uncertainty: bool = False
    num_layers: int = 18
    nrows: int = 4
    patch_size: int = 64
    fov: float = 80.0
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, equi: Array, train: bool = False) -> dict:
        from panogrf_tpu.core import tangent
        b, h, w, c = equi.shape
        npatch = tangent.NPATCHES[self.nrows]
        ps = (self.patch_size, self.patch_size)
        fov = (self.fov, self.fov)

        enc = _make_encoder(self.num_layers)
        equi_feats = enc(wrap=self.wrap, bn_axis=self.bn_axis,
                         name="equi_encoder")(equi, train)
        patches = jax.vmap(lambda img: tangent.equi_to_tangent(
            img, self.nrows, ps, fov))(equi)
        tp_flat = patches.reshape(b * npatch, *ps, c)
        tp_feats = enc(wrap=False, bn_axis=self.bn_axis,
                       name="tp_encoder")(tp_flat, train)

        def t2e(feat_flat: Array, level: int) -> Array:
            """(B*N, fh, fw, C) -> (B, eh, ew, C)."""
            fh = feat_flat.shape[1]
            eh, ew = h >> level, w >> level
            grouped = feat_flat.reshape(b, npatch, fh, fh, -1)
            return jax.vmap(lambda p: tangent.tangent_to_equi(
                p, (eh, ew), self.nrows, fov))(grouped)

        def fusion(equi_f: Array, tp_f: Array, level: int) -> Array:
            return make_fusion(self.fusion_type, equi_f.shape[-1],
                               self.se_in_fusion, bn_axis=self.bn_axis)(
                equi_f, t2e(tp_f, level), train)

        outputs = {}
        x = fusion(equi_feats[4], tp_feats[4], 5)
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[4], self.wrap)(x))  # 1/16
        for lvl, dec_ch in ((4, NUM_CH_DEC[4]), (3, NUM_CH_DEC[3]),
                            (2, NUM_CH_DEC[2])):
            f = fusion(equi_feats[lvl - 1], tp_feats[lvl - 1], lvl)
            x = jnp.concatenate([x, f], axis=-1)
            x = ConvELU(dec_ch, self.wrap)(x)
            x = upsample2x_nearest(
                ConvELU(NUM_CH_DEC[lvl - 2], self.wrap)(x))
        f0 = fusion(equi_feats[0], tp_feats[0], 1)
        x = jnp.concatenate([x, f0], axis=-1)
        x = ConvELU(NUM_CH_DEC[1], self.wrap)(x)
        outputs["mono_feat"] = x                         # deconv_1 tap
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[0], self.wrap)(x))
        x = ConvELU(NUM_CH_DEC[0], self.wrap)(x)
        equi_out = Conv3x3Head(1, self.wrap)(x)
        outputs["pred_depth"] = self.max_depth * nn.sigmoid(equi_out)
        if self.uncertainty:
            pred = Conv3x3Head(2, self.wrap, name="uncert_head")(x)
            mu = self.max_depth * nn.sigmoid(pred[..., :1])
            sigma = nn.softplus(pred[..., 1:]) + 1e-3
            outputs["pred"] = jnp.concatenate([mu, sigma], axis=-1)
        return outputs


class CubeDepth(nn.Module):
    """Cubemap-only mono-depth net (the Cube ablation, reference
    ``models/my_cube_only.py:107-185``): ONLY the cube encoder runs — the
    decoder consumes cube->ERP-resampled features directly, no ERP branch
    and no fusion layers (the reference comments both out).  Restores the
    full decoder + depth head for ``tools/train_mono.py`` (the reference
    variant returns 1/4-res features for the MVS feature-net knob).
    """
    max_depth: float = 10.0
    wrap: bool = True
    uncertainty: bool = False
    num_layers: int = 18
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, equi: Array, cube: Array,
                 train: bool = False) -> dict:
        b, h, w, _ = equi.shape
        assert cube.shape[1] == 6 and cube.shape[2] == h // 2
        cube_flat = cube.reshape(b * 6, *cube.shape[2:])
        cube_feats = _make_encoder(self.num_layers)(
            wrap=False, bn_axis=self.bn_axis,
            name="cube_encoder")(cube_flat, train)

        def c2e(feat_flat: Array, level: int) -> Array:
            fw = feat_flat.shape[1]
            eh, ew = h >> level, w >> level
            stacked = feat_flat.reshape(b, 6, fw, fw, -1)
            return jax.vmap(lambda cb: cubemap.cube_to_equi(cb, eh, ew))(
                stacked)

        outputs = {}
        x = upsample2x_nearest(
            ConvELU(NUM_CH_DEC[4], self.wrap)(c2e(cube_feats[4], 5)))
        for lvl, dec_ch in ((4, NUM_CH_DEC[4]), (3, NUM_CH_DEC[3]),
                            (2, NUM_CH_DEC[2])):
            x = jnp.concatenate([x, c2e(cube_feats[lvl - 1], lvl)], axis=-1)
            x = ConvELU(dec_ch, self.wrap)(x)
            x = upsample2x_nearest(
                ConvELU(NUM_CH_DEC[lvl - 2], self.wrap)(x))
        x = jnp.concatenate([x, c2e(cube_feats[0], 1)], axis=-1)
        x = ConvELU(NUM_CH_DEC[1], self.wrap)(x)
        outputs["mono_feat"] = x
        x = upsample2x_nearest(ConvELU(NUM_CH_DEC[0], self.wrap)(x))
        x = ConvELU(NUM_CH_DEC[0], self.wrap)(x)
        equi_out = Conv3x3Head(1, self.wrap)(x)
        outputs["pred_depth"] = self.max_depth * nn.sigmoid(equi_out)
        if self.uncertainty:
            pred = Conv3x3Head(2, self.wrap, name="uncert_head")(x)
            mu = self.max_depth * nn.sigmoid(pred[..., :1])
            sigma = nn.softplus(pred[..., 1:]) + 1e-3
            outputs["pred"] = jnp.concatenate([mu, sigma], axis=-1)
        return outputs


# ---------------------------------------------------------------------------
# mono-net factory (reference select_mononet.py:4-138)
# ---------------------------------------------------------------------------

MONO_NETS = ("UniFuse", "Equi", "ERP+TP", "Cube")


def select_mono(cfg, mvsnet: bool = False):
    """Config-driven mono-depth network factory.

    Reference ``select_mononet.py:4-138``: picks the net by ``mono_net``
    (only UniFuse/Equi exist in-tree; the PanoFormer/FreDSNet/ACDNet
    branches import external repos and are not part of the reference
    checkout), applies the uncertainty head knob, and — via
    :func:`load_mono_params` — the pretrained checkpoint.

    :param cfg: object or mapping with mono_net / max_depth /
        mono_uncertainty (+ mono_fusion, se_in_fusion for UniFuse).
    :param mvsnet: True when building the frozen D-Net inside the MVS
        pipeline (reference picks the ``mono_*`` knob family then).
    :return: an uninitialized Flax module.
    """
    get = (cfg.get if hasattr(cfg, "get")
           else lambda k, d=None: getattr(cfg, k, d))
    name = get("mono_net", "UniFuse")
    uncert = bool(get("mono_uncertainty", False))
    max_depth = float(get("max_depth", 10.0))
    wrap = bool(get("use_wrap_padding", True))
    # knob family per reference select_mononet.py:17-25: the D-Net inside
    # the MVS pipeline (mvsnet=True) reads the mono_* knobs; the
    # standalone mono trainer reads the plain ones.
    if mvsnet:
        layers = int(get("mono_num_layers", 18))
        fusion = str(get("mono_fusion", "cee"))
    else:
        layers = int(get("num_layers", get("mono_num_layers", 18)))
        fusion = str(get("fusion", get("mono_fusion", "cee")))
    # SyncBN axis for data-parallel training (reference sync_batchnorm/;
    # here nn.BatchNorm axis_name over the mesh's 'data' axis)
    bn_axis = get("bn_axis", None)
    if name == "UniFuse":
        return UniFuse(max_depth=max_depth, uncertainty=uncert, wrap=wrap,
                       num_layers=layers, fusion_type=fusion,
                       se_in_fusion=bool(get("se_in_fusion", True)),
                       bn_axis=bn_axis)
    if name == "Equi":
        return EquiDepth(max_depth=max_depth, uncertainty=uncert, wrap=wrap,
                         num_layers=layers, bn_axis=bn_axis)
    if name == "ERP+TP":
        return ERPTPDepth(max_depth=max_depth, uncertainty=uncert, wrap=wrap,
                          num_layers=layers, fusion_type=fusion,
                          se_in_fusion=bool(get("se_in_fusion", True)),
                          nrows=int(get("nrows", 4)),
                          patch_size=int(get("patchsize", 64)),
                          fov=float(get("fov", 80.0)), bn_axis=bn_axis)
    if name == "Cube":
        return CubeDepth(max_depth=max_depth, uncertainty=uncert, wrap=wrap,
                         num_layers=layers, bn_axis=bn_axis)
    raise ValueError(
        f"unknown mono_net {name!r}; available: {MONO_NETS} "
        "(PanoFormer/FreDSNet/ACDNet require external repos even in the "
        "reference)")


def load_mono_params(cfg, torch_state_dict):
    """Convert a pretrained torch checkpoint for the selected mono net."""
    from panogrf_tpu.utils import torch_convert as tc
    get = (cfg.get if hasattr(cfg, "get")
           else lambda k, d=None: getattr(cfg, k, d))
    name = get("mono_net", "UniFuse")
    if name == "UniFuse":
        return tc.convert_unifuse(torch_state_dict)
    if name == "Equi":
        return tc.convert_equi_depth(torch_state_dict)
    raise ValueError(name)
