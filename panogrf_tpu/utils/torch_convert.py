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
