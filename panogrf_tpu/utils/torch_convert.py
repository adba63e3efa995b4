"""PyTorch -> Flax checkpoint conversion.

Maps the reference's released checkpoints into this framework's parameter
trees.  Key layouts were derived by reading the reference module
definitions (NOT by importing them):

* UniFuse mono (``habitat_monodepth/checkpoint_100000.pt``):
  ``model_state_dict`` with torchvision-resnet18 keys under
  ``equi_encoder.* / cube_encoder.*`` and the decoder as a flat ModuleList
  ``equi_decoder.{i}.*`` in the OrderedDict insertion order of
  ``UniFuse…/networks/unifuse.py:66-95`` (erp_convert swaps conv classes
  but keeps parameter names, ``networks/convert_module.py:29-58``).

The converter consumes a plain ``{key: np.ndarray}`` dict (load the torch
file with ``torch.load(..., map_location='cpu')`` and call
``{k: v.numpy() for k, v in sd.items()}``) so torch itself is only needed
at the call site.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

Array = np.ndarray


def t2f_conv(w: Array) -> Array:
    """Torch conv weight (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def t2f_dense(w: Array) -> Array:
    """Torch linear weight (O, I) -> flax (I, O)."""
    return np.transpose(w)


def strip_module_prefix(sd: Dict[str, Array]) -> Dict[str, Array]:
    """Remove DataParallel 'module.' prefixes (reference
    ``network/init_net.py:20-36`` load_checkpoint)."""
    return {k[7:] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _bn(sd: Dict[str, Array], tkey: str):
    params = {"scale": sd[f"{tkey}.weight"], "bias": sd[f"{tkey}.bias"]}
    stats = {"mean": sd[f"{tkey}.running_mean"],
             "var": sd[f"{tkey}.running_var"]}
    return params, stats


def convert_resnet_encoder(sd: Dict[str, Array], prefix: str,
                           block_counts=(2, 2, 2, 2)) -> tuple:
    """torchvision ResNet -> :class:`panogrf_tpu.nn.resnet.ResNetEncoder`.

    :return: (params, batch_stats) dicts matching the flax module tree.
    """
    params: dict = {}
    stats: dict = {}

    def put(path, p, s=None):
        params[path] = p
        if s is not None:
            stats[path] = s

    put("_ConvPad_0", {"Conv_0": {"kernel": t2f_conv(
        sd[f"{prefix}.conv1.weight"])}})
    bn_p, bn_s = _bn(sd, f"{prefix}.bn1")
    put("_BN_0", {"BatchNorm_0": bn_p}, {"BatchNorm_0": bn_s})

    blk = 0
    for li, nblocks in enumerate(block_counts, start=1):
        for bi in range(nblocks):
            t = f"{prefix}.layer{li}.{bi}"
            name = f"ResNetBasicBlock_{blk}"
            blk += 1
            bp: dict = {}
            bs: dict = {}
            bp["_ConvPad_0"] = {"Conv_0": {
                "kernel": t2f_conv(sd[f"{t}.conv1.weight"])}}
            p1, s1 = _bn(sd, f"{t}.bn1")
            bp["_BN_0"] = {"BatchNorm_0": p1}
            bs["_BN_0"] = {"BatchNorm_0": s1}
            bp["_ConvPad_1"] = {"Conv_0": {
                "kernel": t2f_conv(sd[f"{t}.conv2.weight"])}}
            p2, s2 = _bn(sd, f"{t}.bn2")
            bp["_BN_1"] = {"BatchNorm_0": p2}
            bs["_BN_1"] = {"BatchNorm_0": s2}
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": t2f_conv(
                    sd[f"{t}.downsample.0.weight"])}
                pd, sdn = _bn(sd, f"{t}.downsample.1")
                bp["downsample_bn"] = {"BatchNorm_0": pd}
                bs["downsample_bn"] = {"BatchNorm_0": sdn}
            put(name, bp, bs)
    return params, stats


# Decoder ModuleList order, reference ``networks/unifuse.py:66-95``.
_UNIFUSE_DECODER_ORDER = [
    "fusion_5", "upconv_5", "fusion_4", "deconv_4", "upconv_4",
    "fusion_3", "deconv_3", "upconv_3", "fusion_2", "deconv_2", "upconv_2",
    "fusion_1", "deconv_1", "upconv_1", "deconv_0", "depthconv_0",
]
# My UniFuse call order of anonymous ConvELU modules (models/unifuse.py):
_CONVELU_ORDER = ["upconv_5", "deconv_4", "upconv_4", "deconv_3",
                  "upconv_3", "deconv_2", "upconv_2", "deconv_1",
                  "upconv_1", "deconv_0"]
_FUSION_ORDER = ["fusion_5", "fusion_4", "fusion_3", "fusion_2", "fusion_1"]


def _convert_cee(sd: Dict[str, Array], t: str) -> tuple:
    """CEELayer torch keys -> flax CEELayer params (+ batch stats)."""
    p: dict = {
        "res_conv1": {"kernel": t2f_conv(sd[f"{t}.res_conv1.weight"])},
        "res_conv2": {"kernel": t2f_conv(sd[f"{t}.res_conv2.weight"])},
        "conv": {"kernel": t2f_conv(sd[f"{t}.conv.weight"])},
    }
    s: dict = {}
    for bn in ["res_bn1", "res_bn2"]:
        bp, bsx = _bn(sd, f"{t}.{bn}")
        p[bn] = bp
        s[bn] = bsx
    if f"{t}.selayer.fc.0.weight" in sd:
        p["SELayer_0"] = {
            "Dense_0": {"kernel": t2f_dense(sd[f"{t}.selayer.fc.0.weight"])},
            "Dense_1": {"kernel": t2f_dense(sd[f"{t}.selayer.fc.2.weight"])},
        }
    return p, s


def convert_unifuse(torch_sd: Dict[str, Array],
                    fusion_type: str = "cee") -> dict:
    """UniFuse checkpoint -> flax variables for
    :class:`panogrf_tpu.models.unifuse.UniFuse`.

    :param torch_sd: numpy state dict (``model_state_dict``).
    :return: {"params": ..., "batch_stats": ...}
    """
    sd = strip_module_prefix(torch_sd)
    params: dict = {}
    stats: dict = {}

    for enc in ["equi_encoder", "cube_encoder"]:
        p, s = convert_resnet_encoder(sd, enc)
        params[enc] = p
        stats[enc] = s

    dec_index = {n: i for i, n in enumerate(_UNIFUSE_DECODER_ORDER)}

    # ConvELU_{i}: torch ConvBlock = .conv (Conv3x3) -> .conv (Conv2d)
    for i, name in enumerate(_CONVELU_ORDER):
        t = f"equi_decoder.{dec_index[name]}.conv.conv"
        params[f"ConvELU_{i}"] = {"Conv_0": {
            "kernel": t2f_conv(sd[f"{t}.weight"]),
            "bias": sd[f"{t}.bias"]}}

    # depth head: Conv3x3 (or Conv3x3_wrap) -> .conv
    t = f"equi_decoder.{dec_index['depthconv_0']}.conv"
    params["Conv3x3Head_0"] = {"Conv_0": {
        "kernel": t2f_conv(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}}

    # fusion layers
    for i, name in enumerate(_FUSION_ORDER):
        t = f"equi_decoder.{dec_index[name]}"
        if fusion_type == "cee":
            p, s = _convert_cee(sd, t)
            params[f"CEELayer_{i}"] = p
            if s:
                stats[f"CEELayer_{i}"] = s
        elif fusion_type == "cat":
            params[f"Concat_{i}"] = {"Conv_0": {
                "kernel": t2f_conv(sd[f"{t}.conv.weight"])}}
        else:  # biproj
            params[f"BiProj_{i}"] = {
                "conv_e2c": {
                    "kernel": t2f_conv(sd[f"{t}.conv_e2c.0.weight"]),
                    "bias": sd[f"{t}.conv_e2c.0.bias"]},
                "conv_c2e": {
                    "kernel": t2f_conv(sd[f"{t}.conv_c2e.0.weight"]),
                    "bias": sd[f"{t}.conv_c2e.0.bias"]},
                "conv_mask": {
                    "kernel": t2f_conv(sd[f"{t}.conv_mask.0.weight"]),
                    "bias": sd[f"{t}.conv_mask.0.bias"]},
            }
    return {"params": params, "batch_stats": stats}


def t2f_conv3d(w: Array) -> Array:
    """Torch conv3d (O, I, kD, kH, kW) -> flax (kD, kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


# Equi decoder ModuleList order (reference ``models/my_equi.py:74-91``) ==
# the call order of my ConvELU_{i} modules in models/unifuse.Equi.
_EQUI_DECODER_ORDER = ["upconv_5", "deconv_4", "upconv_4", "deconv_3",
                       "upconv_3", "deconv_2", "upconv_2"]


def convert_equi(sd: Dict[str, Array], prefix: str = "unet") -> tuple:
    """Equi feature net -> flax ``models.unifuse.Equi`` subtree.

    :return: (params, batch_stats) for the Equi module scope.
    """
    params: dict = {}
    stats: dict = {}
    p, s = convert_resnet_encoder(sd, f"{prefix}.equi_encoder")
    params["equi_encoder"] = p
    stats["equi_encoder"] = s
    for i in range(len(_EQUI_DECODER_ORDER)):
        t = f"{prefix}.equi_decoder.{i}.conv.conv"
        params[f"ConvELU_{i}"] = {"Conv_0": {
            "kernel": t2f_conv(sd[f"{t}.weight"]),
            "bias": sd[f"{t}.bias"]}}
    return params, stats


def convert_cost_reg(sd: Dict[str, Array],
                     prefix: str = "unet3d") -> tuple:
    """MVSNet-style CostRegNet (``use_new_reg3dnet``) -> flax
    :class:`panogrf_tpu.nn.blocks.CostRegNet` subtree.

    Reference key layout (``models/cost_reg.py:99-174``): convN.conv.weight
    + convN.bn.* for conv0..conv6 (encoder) and conv7/conv9/conv11
    (up decoder), prob.conv.weight.
    :return: (params, batch_stats) for the CostRegNet module scope.
    """
    params: dict = {}
    stats: dict = {}
    for name in ["conv0", "conv1", "conv2", "conv3", "conv4", "conv5",
                 "conv6", "conv7", "conv9", "conv11"]:
        t = f"{prefix}.{name}"
        bn_p, bn_s = _bn(sd, f"{t}.bn")
        params[name] = {
            "WrapConv3D_0": {"Conv_0": {
                "kernel": t2f_conv3d(sd[f"{t}.conv.weight"])}},
            "BatchNorm_0": bn_p,
        }
        stats[name] = {"BatchNorm_0": bn_s}
    params["prob"] = {"Conv_0": {
        "kernel": t2f_conv3d(sd[f"{prefix}.prob.conv.weight"])}}
    return params, stats


# Full Equi mono-depth decoder order (reference
# ``UniFuse…/networks/equi.py:45-63``): ModuleList index == call order of
# the ConvELU_{i} modules in models.unifuse.EquiDepth; depthconv_0 last.
_EQUI_DEPTH_DECODER_ORDER = ["upconv_5", "deconv_4", "upconv_4", "deconv_3",
                             "upconv_3", "deconv_2", "upconv_2", "deconv_1",
                             "upconv_1", "deconv_0"]


def convert_equi_depth(torch_sd: Dict[str, Array]) -> dict:
    """Equi mono-depth checkpoint -> flax variables for
    :class:`panogrf_tpu.models.unifuse.EquiDepth`."""
    sd = strip_module_prefix(torch_sd)
    params: dict = {}
    stats: dict = {}
    p, s = convert_resnet_encoder(sd, "equi_encoder")
    params["equi_encoder"] = p
    stats["equi_encoder"] = s
    for i in range(len(_EQUI_DEPTH_DECODER_ORDER)):
        t = f"equi_decoder.{i}.conv.conv"
        params[f"ConvELU_{i}"] = {"Conv_0": {
            "kernel": t2f_conv(sd[f"{t}.weight"]),
            "bias": sd[f"{t}.bias"]}}
    t = f"equi_decoder.{len(_EQUI_DEPTH_DECODER_ORDER)}.conv"
    params["Conv3x3Head_0"] = {"Conv_0": {
        "kernel": t2f_conv(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}}
    return {"params": params, "batch_stats": stats}


def convert_mvs(torch_sd: Dict[str, Array],
                cnn3d_num_layer: int = 3) -> dict:
    """FullPipeline (MVS) checkpoint -> flax variables for
    :class:`panogrf_tpu.models.mvs.MVSDepthModel`.

    Covers the shipped ``net: "Equi"`` + 3-layer Conv3D UNet configuration
    (reference ``models/test_models.py:61-205``).  The frozen ``d_net.*``
    keys are the mono network — extract with :func:`extract_dnet` and feed
    :func:`convert_unifuse`.
    """
    sd = strip_module_prefix(torch_sd)
    params: dict = {}
    stats: dict = {}

    fp, fs = convert_equi(sd, "unet")
    params["feature_net"] = fp
    stats["feature_net"] = fs

    # unet3d: torch forward order = encoders 0..n, then decoders[-1],
    # decoders[n-2] .. decoders[0]; my Conv3DBlock_{i} follow call order.
    def conv3d_block(tkey):
        return {
            "WrapConv3D_0": {"Conv_0": {
                "kernel": t2f_conv3d(sd[f"{tkey}.conv1.weight"]),
                "bias": sd[f"{tkey}.conv1.bias"]}},
            "WrapConv3D_1": {"Conv_0": {
                "kernel": t2f_conv3d(sd[f"{tkey}.conv2.weight"]),
                "bias": sd[f"{tkey}.conv2.bias"]}},
        }

    u3 = {}
    n = cnn3d_num_layer
    for i in range(n + 1):                      # encoders incl. bottleneck
        u3[f"Conv3DBlock_{i}"] = conv3d_block(f"unet3d.encoders.{i}")
    # decoders: flax index n+1.. maps to torch decoders [n-1, n-2, ..., 0]
    for j, tdec in enumerate(range(n - 1, -1, -1)):
        u3[f"Conv3DBlock_{n + 1 + j}"] = conv3d_block(
            f"unet3d.decoders.{tdec}")
    params["unet3d"] = u3

    params["decoders1"] = {
        "kernel": t2f_conv(sd["decoders1.conv.weight"]),
        "bias": sd["decoders1.conv.bias"]}
    for i in range(3):
        params[f"decoders2_{i}"] = {
            "WrapConv_0": {"Conv_0": {
                "kernel": t2f_conv(sd[f"decoders2.{i}.conv1.weight"]),
                "bias": sd[f"decoders2.{i}.conv1.bias"]}},
            "WrapConv_1": {"Conv_0": {
                "kernel": t2f_conv(sd[f"decoders2.{i}.conv2.weight"]),
                "bias": sd[f"decoders2.{i}.conv2.bias"]}},
        }
    return {"params": params, "batch_stats": stats}


def extract_dnet(torch_sd: Dict[str, Array]) -> Dict[str, Array]:
    """Pull the frozen mono sub-checkpoint (``d_net.*``) out of an MVS
    checkpoint for :func:`convert_unifuse`."""
    sd = strip_module_prefix(torch_sd)
    return {k[len("d_net."):]: v for k, v in sd.items()
            if k.startswith("d_net.")}


# ---------------------------------------------------------------------------
# renderer checkpoint (reference ``data/model/{name}/model.pth``)
# ---------------------------------------------------------------------------

def _conv3x3_key(sd: Dict[str, Array], base: str) -> str:
    """conv3x3 may be Sequential(WrapPadding, Conv2d) ('.1.weight') or a bare
    Conv2d ('.weight') depending on use_wrap_padding (reference
    ``network/ops.py:6-17``)."""
    if f"{base}.1.weight" in sd:
        return f"{base}.1"
    return base


def _inorm(sd: Dict[str, Array], key: str) -> dict:
    """InstanceNorm2d(affine=True) -> flax InstanceNorm/GroupNorm params."""
    return {"GroupNorm_0": {"scale": sd[f"{key}.weight"],
                            "bias": sd[f"{key}.bias"]}}


def _wconv(sd: Dict[str, Array], base: str, bias: bool = False) -> dict:
    """conv3x3/stem conv -> flax WrapConv {Conv_0: {...}} subtree."""
    k = _conv3x3_key(sd, base)
    p = {"kernel": t2f_conv(sd[f"{k}.weight"])}
    if bias or f"{k}.bias" in sd:
        p["bias"] = sd[f"{k}.bias"]
    return {"Conv_0": p}


def _residual_block(sd: Dict[str, Array], prefix: str) -> dict:
    """Reference ResidualBlock (``network/ops.py:61-117``, use_norm=True) ->
    flax :class:`panogrf_tpu.nn.blocks.ResidualBlock` params.

    Torch Sequential indices: wrap [IN0, ReLU, Pad, Conv3, IN4, ReLU, Pad,
    Conv7]; no-wrap [IN0, ReLU, Conv2, IN3, ReLU, Conv5].
    """
    wrap = f"{prefix}.conv.3.weight" in sd
    i_conv1, i_in2, i_conv2 = (3, 4, 7) if wrap else (2, 3, 5)
    p = {
        "InstanceNorm_0": _inorm(sd, f"{prefix}.conv.0"),
        "WrapConv_0": {"Conv_0": {
            "kernel": t2f_conv(sd[f"{prefix}.conv.{i_conv1}.weight"])}},
        "InstanceNorm_1": _inorm(sd, f"{prefix}.conv.{i_in2}"),
        "WrapConv_1": {"Conv_0": {
            "kernel": t2f_conv(sd[f"{prefix}.conv.{i_conv2}.weight"])}},
    }
    if f"{prefix}.short_cut.weight" in sd:
        p["Conv_0"] = {"kernel": t2f_conv(sd[f"{prefix}.short_cut.weight"]),
                       "bias": sd[f"{prefix}.short_cut.bias"]}
    return p


def _basic_block(sd: Dict[str, Array], prefix: str) -> dict:
    """Reference renderer BasicBlock (``network/ops.py:127-197``, instance
    norm) -> flax :class:`panogrf_tpu.nn.blocks.BasicBlock` params."""
    p = {
        "WrapConv_0": _wconv(sd, f"{prefix}.conv1"),
        "InstanceNorm_0": _inorm(sd, f"{prefix}.bn1"),
        "WrapConv_1": _wconv(sd, f"{prefix}.conv2"),
        "InstanceNorm_1": _inorm(sd, f"{prefix}.bn2"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["Conv_0"] = {
            "kernel": t2f_conv(sd[f"{prefix}.downsample.0.weight"])}
        p["InstanceNorm_2"] = _inorm(sd, f"{prefix}.downsample.1")
    return p


def _conv_in_elu(sd: Dict[str, Array], base: str) -> dict:
    """Reference ``conv`` module (``network/ops.py:199-223``) -> flax
    ConvINELU params.  ``base`` is e.g. 'iconv3' (keys base.conv[.1].weight,
    base.bn.weight)."""
    return {"WrapConv_0": _wconv(sd, f"{base}.conv", bias=True),
            "InstanceNorm_0": _inorm(sd, f"{base}.bn")}


def convert_resunet_light(sd: Dict[str, Array], prefix: str,
                          layers=(2, 3, 6)) -> dict:
    """Reference renderer ResUNetLight (``network/ops.py:235-455``) -> flax
    :class:`panogrf_tpu.nn.blocks.ResUNetLight` params.

    :param layers: BasicBlock counts of the three stride-2 stages (the
        torch module ignores a 4th entry).
    """
    p: dict = {}
    stem = _conv3x3_key(sd, f"{prefix}.conv1")
    p["Conv_0"] = {"kernel": t2f_conv(sd[f"{stem}.weight"])}
    p["InstanceNorm_0"] = _inorm(sd, f"{prefix}.bn1")
    blk = 0
    for li, nblocks in enumerate(layers, start=1):
        for bi in range(nblocks):
            p[f"BasicBlock_{blk}"] = _basic_block(sd,
                                                  f"{prefix}.layer{li}.{bi}")
            blk += 1
    p["UpconvINELU_0"] = {"ConvINELU_0": _conv_in_elu(
        sd, f"{prefix}.upconv3.conv")}
    p["ConvINELU_0"] = _conv_in_elu(sd, f"{prefix}.iconv3")
    p["UpconvINELU_1"] = {"ConvINELU_0": _conv_in_elu(
        sd, f"{prefix}.upconv2.conv")}
    p["ConvINELU_1"] = _conv_in_elu(sd, f"{prefix}.iconv2")
    p["Conv_1"] = {"kernel": t2f_conv(sd[f"{prefix}.out_conv.weight"]),
                   "bias": sd[f"{prefix}.out_conv.bias"]}
    return p


def _conv_res_conv(sd: Dict[str, Array], prefix: str,
                   num_res: int = 1) -> dict:
    """conv3x3 -> ResidualBlock(s) -> conv1x1 stacks (reference
    ``init_net.py:539-574``, ``vis_encoder.py:17-22``) -> flax params for
    ``_ConvResConv`` / the inline vis-encoder scope."""
    p = {"WrapConv_0": _wconv(sd, f"{prefix}.0")}
    for i in range(num_res):
        p[f"ResidualBlock_{i}"] = _residual_block(sd, f"{prefix}.{1 + i}")
    p["Conv_0"] = {
        "kernel": t2f_conv(sd[f"{prefix}.{1 + num_res}.weight"])}
    return p


def _linear(sd: Dict[str, Array], key: str) -> tuple:
    return t2f_dense(sd[f"{key}.weight"]), sd[f"{key}.bias"]


def convert_dist_decoder(sd: Dict[str, Array], prefix: str) -> dict:
    """MixtureLogisticsDistDecoder (``network/dist_decoder.py:53-108``) ->
    flax :class:`MixtureLogisticsDistDecoder` params.  Each torch head is a
    Sequential of Linears at indices 0/2/4."""
    p: dict = {}
    heads = ["mean_decoder", "var_decoder", "aw_decoder"]
    if f"{prefix}.vis_decoder.0.weight" in sd:
        heads.append("vis_decoder")
    for head in heads:
        hp: dict = {}
        for i, idx in enumerate([0, 2, 4]):
            w, b = _linear(sd, f"{prefix}.{head}.{idx}")
            hp[f"w{i}"] = w
            hp[f"b{i}"] = b
        p[head] = hp
    return p


def convert_agg_net(sd: Dict[str, Array], prefix: str) -> dict:
    """DefaultAggregationNet + IBRNetWithNeuRay (``aggregate_net.py:16-89``,
    ``ibrnet.py:239-373``) -> flax :class:`DefaultAggregationNet` params."""
    p: dict = {}
    for i, idx in enumerate([0, 2]):
        w, b = _linear(sd, f"{prefix}.prob_embed.{idx}")
        p[f"prob_embed_{i}"] = {"kernel": w, "bias": b}

    impl: dict = {}
    seqs = {"ray_dir_fc": [0, 2], "base_fc": [0, 2], "vis_fc": [0, 2],
            "vis_fc2": [0, 2], "geometry_fc": [0, 2], "neuray_fc": [0, 2],
            "rgb_fc": [0, 2, 4]}
    for name, idxs in seqs.items():
        for i, idx in enumerate(idxs):
            w, b = _linear(sd, f"{prefix}.agg_impl.{name}.{idx}")
            impl[f"{name}_w{i}"] = w
            impl[f"{name}_b{i}"] = b
    out_geo: dict = {}
    for i, idx in enumerate([0, 2]):
        w, b = _linear(sd, f"{prefix}.agg_impl.out_geometry_fc.{idx}")
        out_geo[f"w{i}"] = w
        out_geo[f"b{i}"] = b
    impl["out_geometry_fc"] = out_geo

    attn = f"{prefix}.agg_impl.ray_attention"
    impl["ray_attention"] = {
        "w_qs": {"kernel": t2f_dense(sd[f"{attn}.w_qs.weight"])},
        "w_ks": {"kernel": t2f_dense(sd[f"{attn}.w_ks.weight"])},
        "w_vs": {"kernel": t2f_dense(sd[f"{attn}.w_vs.weight"])},
        "fc": {"kernel": t2f_dense(sd[f"{attn}.fc.weight"])},
        "LayerNorm_0": {"scale": sd[f"{attn}.layer_norm.weight"],
                        "bias": sd[f"{attn}.layer_norm.bias"]},
    }
    p["agg_impl"] = impl
    return p


def convert_renderer(torch_sd: Dict[str, Array]) -> dict:
    """Reference renderer ``network_state_dict`` -> flax variables for
    :class:`panogrf_tpu.renderer.renderer.NeuralRayGenRenderer`.

    Parameter surface (reference): image_encoder ResUNetLight [1,2,6]
    inplanes 16 (``renderer.py:106``); init_net res_net/depth_conv/out_conv
    (``init_net.py:539-574``); vis_encoder out_conv (``vis_encoder.py:17``);
    dist decoders (``dist_decoder.py:53-108``); agg nets incl. ray attention
    (``ibrnet.py:239-373``).  The ``sph_fitter.regs`` buffer (constant
    regularizer weights, ``sph_solver.py:5-12``) and the frozen
    ``init_net.depth_net.*`` sub-checkpoint are NOT part of the flax tree:
    the depth stack runs outside the renderer (see init_net docstring) —
    extract it with :func:`extract_renderer_depth_net` and convert with
    :func:`convert_mvs` / :func:`convert_unifuse`.

    :return: {"params": ...} for the gen renderer.
    """
    sd = strip_module_prefix(torch_sd)
    params: dict = {
        "image_encoder": convert_resunet_light(sd, "image_encoder",
                                               layers=(1, 2, 6)),
        "init_net": {
            "res_net": convert_resunet_light(sd, "init_net.res_net",
                                             layers=(2, 3, 6)),
            "depth_conv": _conv_res_conv(sd, "init_net.depth_conv", 1),
            "out_conv": _conv_res_conv(sd, "init_net.out_conv", 1),
        },
        # vis_encoder params live inline in its scope (no _ConvResConv)
        "vis_encoder": _conv_res_conv(sd, "vis_encoder.out_conv", 2),
        "dist_decoder": convert_dist_decoder(sd, "dist_decoder"),
        "agg_net": convert_agg_net(sd, "agg_net"),
    }
    if "fine_dist_decoder.mean_decoder.0.weight" in sd:
        params["fine_dist_decoder"] = convert_dist_decoder(
            sd, "fine_dist_decoder")
        params["fine_agg_net"] = convert_agg_net(sd, "fine_agg_net")
    return {"params": params}


def extract_renderer_depth_net(torch_sd: Dict[str, Array]) -> Dict[str, Array]:
    """Pull the frozen MVS/mono sub-checkpoint (``init_net.depth_net.*``)
    out of a renderer checkpoint (feed to :func:`convert_mvs`, or — for
    ``wo_stereo`` checkpoints — :func:`convert_unifuse`)."""
    sd = strip_module_prefix(torch_sd)
    return {k[len("init_net.depth_net."):]: v for k, v in sd.items()
            if k.startswith("init_net.depth_net.")}


def extract_ray_feats(torch_sd: Dict[str, Array]) -> list:
    """Pull per-view trainable ``ray_feats.{i}`` out of a ft-renderer
    checkpoint (torch (1, dim, fh, fw), reference ``render.py:345-348``) as
    channel-last (fh, fw, dim) arrays in view order."""
    sd = strip_module_prefix(torch_sd)
    n = 0
    while f"ray_feats.{n}" in sd:
        n += 1
    return [np.transpose(sd[f"ray_feats.{i}"][0], (1, 2, 0))
            for i in range(n)]


def verify_tree_shapes(converted: dict, reference_tree: dict,
                       path: str = "") -> list:
    """Compare converted arrays against an initialized flax tree.

    :return: list of mismatch strings (empty = fully compatible).
    """
    problems = []
    keys_c = set(converted)
    keys_r = set(reference_tree)
    for k in sorted(keys_r - keys_c):
        problems.append(f"missing {path}/{k}")
    for k in sorted(keys_c - keys_r):
        problems.append(f"unexpected {path}/{k}")
    for k in sorted(keys_c & keys_r):
        c, r = converted[k], reference_tree[k]
        if isinstance(r, dict):
            if not isinstance(c, dict):
                problems.append(f"type mismatch at {path}/{k}")
            else:
                problems += verify_tree_shapes(c, r, f"{path}/{k}")
        else:
            if tuple(np.shape(c)) != tuple(np.shape(r)):
                problems.append(
                    f"shape {path}/{k}: {np.shape(c)} vs {np.shape(r)}")
    return problems
