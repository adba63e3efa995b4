"""Checkpoint converter tests.

Builds a synthetic torch-style state dict with the reference's exact key
layout (torchvision resnet18 + UniFuse decoder ModuleList) using real torch
modules where that layout is torchvision-defined, then checks the converter
produces a tree that is shape-identical to a freshly initialized flax
UniFuse AND that the converted network runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panogrf_tpu.models.unifuse import UniFuse
from panogrf_tpu.utils import torch_convert as tc


def _fake_resnet18_sd(prefix, rng):
    """torchvision-resnet18 state dict keys with correct shapes."""
    sd = {}

    def conv(k, o, i, s=3):
        sd[k] = rng.normal(size=(o, i, s, s)).astype(np.float32)

    def bn(k, c):
        sd[f"{k}.weight"] = np.ones(c, np.float32)
        sd[f"{k}.bias"] = np.zeros(c, np.float32)
        sd[f"{k}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{k}.running_var"] = np.ones(c, np.float32)

    conv(f"{prefix}.conv1.weight", 64, 3, 7)
    bn(f"{prefix}.bn1", 64)
    chans = [64, 128, 256, 512]
    inc = 64
    for li, c in enumerate(chans, start=1):
        for bi in range(2):
            t = f"{prefix}.layer{li}.{bi}"
            cin = inc if bi == 0 else c
            conv(f"{t}.conv1.weight", c, cin)
            bn(f"{t}.bn1", c)
            conv(f"{t}.conv2.weight", c, c)
            bn(f"{t}.bn2", c)
            if bi == 0 and li > 1:
                conv(f"{t}.downsample.0.weight", c, cin, 1)
                bn(f"{t}.downsample.1", c)
        inc = c
    return sd


def _fake_unifuse_sd(rng, fusion="cee"):
    sd = {}
    sd.update(_fake_resnet18_sd("equi_encoder", rng))
    sd.update(_fake_resnet18_sd("cube_encoder", rng))
    enc = [64, 64, 128, 256, 512]
    dec = [16, 32, 64, 128, 256]

    def conv(k, o, i, s=3, bias=True):
        sd[f"{k}.weight"] = rng.normal(size=(o, i, s, s)).astype(np.float32)
        if bias:
            sd[f"{k}.bias"] = np.zeros(o, np.float32)

    def bn(k, c):
        sd[f"{k}.weight"] = np.ones(c, np.float32)
        sd[f"{k}.bias"] = np.zeros(c, np.float32)
        sd[f"{k}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{k}.running_var"] = np.ones(c, np.float32)

    def cee(idx, c):
        t = f"equi_decoder.{idx}"
        conv(f"{t}.res_conv1", c, 2 * c, 1, bias=False)
        bn(f"{t}.res_bn1", c)
        conv(f"{t}.res_conv2", c, c, 3, bias=False)
        bn(f"{t}.res_bn2", c)
        sd[f"{t}.selayer.fc.0.weight"] = rng.normal(
            size=(2 * c // 16, 2 * c)).astype(np.float32)
        sd[f"{t}.selayer.fc.2.weight"] = rng.normal(
            size=(2 * c, 2 * c // 16)).astype(np.float32)
        conv(f"{t}.conv", c, 2 * c, 1, bias=False)

    order = tc._UNIFUSE_DECODER_ORDER
    # fusion layers at enc channels [512, 256, 128, 64, 64]
    for name, c in zip(["fusion_5", "fusion_4", "fusion_3", "fusion_2",
                        "fusion_1"], [512, 256, 128, 64, 64]):
        cee(order.index(name), c)
    # ConvBlocks: (in, out) channel pairs per decoder stage
    convs = {
        "upconv_5": (512, 256), "deconv_4": (256 + 256, 256),
        "upconv_4": (256, 128), "deconv_3": (128 + 128, 128),
        "upconv_3": (128, 64), "deconv_2": (64 + 64, 64),
        "upconv_2": (64, 32), "deconv_1": (32 + 64, 32),
        "upconv_1": (32, 16), "deconv_0": (16, 16),
    }
    for name, (i, o) in convs.items():
        conv(f"equi_decoder.{order.index(name)}.conv.conv", o, i)
    conv(f"equi_decoder.{order.index('depthconv_0')}.conv", 1, 16)
    return sd


def test_convert_unifuse_shapes_and_forward():
    rng = np.random.default_rng(0)
    sd = _fake_unifuse_sd(rng)
    converted = tc.convert_unifuse(sd, fusion_type="cee")

    model = UniFuse(fusion_type="cee", se_in_fusion=True)
    h, w = 64, 128
    equi = jnp.zeros((1, h, w, 3))
    cube = jnp.zeros((1, 6, h // 2, h // 2, 3))
    init_vars = jax.jit(model.init)(jax.random.PRNGKey(0), equi, cube)

    problems = tc.verify_tree_shapes(converted["params"],
                                     init_vars["params"])
    assert not problems, problems[:10]
    problems = tc.verify_tree_shapes(converted["batch_stats"],
                                     init_vars["batch_stats"])
    assert not problems, problems[:10]

    # converted tree must actually run
    converted = jax.tree.map(jnp.asarray, converted)
    out = jax.jit(model.apply)(converted, equi, cube)
    assert np.isfinite(np.asarray(out["pred_depth"])).all()


def test_strip_module_prefix():
    sd = {"module.a.weight": np.zeros(1), "b.bias": np.ones(1)}
    out = tc.strip_module_prefix(sd)
    assert set(out) == {"a.weight", "b.bias"}


def _fake_mvs_sd(rng, base=8, feat_ch=32):
    """Synthetic FullPipeline state dict (Equi + 3-layer Conv3D UNet)."""
    sd = _fake_resnet18_sd("unet.equi_encoder", rng)

    def conv(k, o, i, s=3):
        sd[f"{k}.weight"] = rng.normal(size=(o, i, s, s)).astype(np.float32)
        sd[f"{k}.bias"] = np.zeros(o, np.float32)

    def conv3(k, o, i):
        sd[f"{k}.weight"] = rng.normal(size=(o, i, 3, 3, 3)).astype(
            np.float32)
        sd[f"{k}.bias"] = np.zeros(o, np.float32)

    # Equi decoder ConvBlocks (upconv_5 .. upconv_2)
    dims = [(512, 256), (256 + 256, 256), (256, 128), (128 + 128, 128),
            (128, 64), (64 + 64, 64), (64, 32)]
    for i, (cin, cout) in enumerate(dims):
        conv(f"unet.equi_decoder.{i}.conv.conv", cout, cin)

    # unet3d encoders (in 32 -> 2b,4b,8b,16b with base b) + decoders
    b = base
    chans = [(feat_ch, 2 * b), (2 * b, 4 * b), (4 * b, 8 * b),
             (8 * b, 16 * b)]
    for i, (ci, co) in enumerate(chans):
        conv3(f"unet3d.encoders.{i}.conv1", co, ci)
        conv3(f"unet3d.encoders.{i}.conv2", co, co)
    decs = [(4 * b, 1), (8 * b, 2 * b), (16 * b, 4 * b)]
    for i, (ci, co) in enumerate(decs):
        conv3(f"unet3d.decoders.{i}.conv1", co, ci)
        conv3(f"unet3d.decoders.{i}.conv2", co, co)

    conv("decoders1.conv", 1, 8, 1)
    # decoders2: (64hyp... use 8 hyps + 32 mono feat) -> 32 -> 16 -> 1
    conv("decoders2.0.conv1", 32, 8 + 32)
    conv("decoders2.0.conv2", 32, 32)
    conv("decoders2.1.conv1", 16, 32)
    conv("decoders2.1.conv2", 16, 16)
    conv("decoders2.2.conv1", 1, 16)
    conv("decoders2.2.conv2", 1, 1)
    # frozen mono keys that extract_dnet should pull out
    sd["d_net.equi_encoder.conv1.weight"] = np.zeros((64, 3, 7, 7),
                                                     np.float32)
    return sd


def test_convert_mvs_shapes_and_forward():
    import jax
    import jax.numpy as jnp
    from panogrf_tpu.models.mvs import MVSDepthModel
    rng = np.random.default_rng(1)
    sd = _fake_mvs_sd(rng)
    converted = tc.convert_mvs(sd)
    assert "d_net" not in str(list(converted["params"]))

    model = MVSDepthModel(num_hypotheses=8, cnn3d_base=8)
    args = (jnp.zeros((1, 2, 32, 64, 3)),
            jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)),
            jnp.zeros((1, 2, 3)), jnp.full((1, 32, 64, 1), 3.0),
            jnp.zeros((1, 16, 32, 32)))
    init_vars = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    problems = tc.verify_tree_shapes(converted["params"],
                                     init_vars["params"])
    assert not problems, problems[:10]
    converted["batch_stats"] = init_vars["batch_stats"] if not converted[
        "batch_stats"] else converted["batch_stats"]
    problems = tc.verify_tree_shapes(converted["batch_stats"],
                                     init_vars["batch_stats"])
    # Equi encoder uses BN: stats must match too
    assert not problems, problems[:10]
    out = jax.jit(model.apply)(jax.tree.map(jnp.asarray, converted), *args)
    assert np.isfinite(np.asarray(out["depth"])).all()

    dnet = tc.extract_dnet(sd)
    assert "equi_encoder.conv1.weight" in dnet


# ---------------------------------------------------------------------------
# renderer checkpoint
# ---------------------------------------------------------------------------

def _fake_renderer_resunet_sd(rng, prefix, layers, inplanes):
    """Renderer-style ResUNetLight keys (instance norm, wrap padding —
    reference ``network/ops.py:235-455`` with use_wrap_padding=True)."""
    sd = {}

    def conv(k, o, i, s=3, bias=False):
        sd[f"{k}.weight"] = rng.normal(size=(o, i, s, s)).astype(np.float32)
        if bias:
            sd[f"{k}.bias"] = np.zeros(o, np.float32)

    def inorm(k, c):
        sd[f"{k}.weight"] = np.ones(c, np.float32)
        sd[f"{k}.bias"] = np.zeros(c, np.float32)

    conv(f"{prefix}.conv1.1", inplanes, 3, 7)
    inorm(f"{prefix}.bn1", inplanes)
    inc = inplanes
    for li, (nblocks, planes) in enumerate(zip(layers, [32, 64, 128]),
                                           start=1):
        for bi in range(nblocks):
            t = f"{prefix}.layer{li}.{bi}"
            cin = inc if bi == 0 else planes
            conv(f"{t}.conv1.1", planes, cin)
            inorm(f"{t}.bn1", planes)
            conv(f"{t}.conv2.1", planes, planes)
            inorm(f"{t}.bn2", planes)
            if bi == 0:  # stride-2 first block always has downsample
                conv(f"{t}.downsample.0", planes, cin, 1)
                inorm(f"{t}.downsample.1", planes)
        inc = planes

    def upconv_conv(base, o, i):
        conv(f"{base}.conv.1", o, i, 3, bias=True)
        inorm(f"{base}.bn", o)

    upconv_conv(f"{prefix}.upconv3.conv", 64, 128)
    upconv_conv(f"{prefix}.iconv3", 64, 128)
    upconv_conv(f"{prefix}.upconv2.conv", 32, 64)
    upconv_conv(f"{prefix}.iconv2", 32, 64)
    conv(f"{prefix}.out_conv", 32, 32, 1, bias=True)
    return sd


def _fake_conv_res_conv_sd(rng, prefix, cin, c, num_res=1):
    """Sequential(conv3x3, ResidualBlock x num_res, conv1x1) keys
    (reference ``init_net.py:539-574``, wrap padding)."""
    sd = {}

    def conv(k, o, i, s=3):
        sd[f"{k}.weight"] = rng.normal(size=(o, i, s, s)).astype(np.float32)

    def inorm(k, ch):
        sd[f"{k}.weight"] = np.ones(ch, np.float32)
        sd[f"{k}.bias"] = np.zeros(ch, np.float32)

    conv(f"{prefix}.0.1", c, cin)
    for r in range(num_res):
        t = f"{prefix}.{1 + r}"
        inorm(f"{t}.conv.0", c)
        conv(f"{t}.conv.3", c, c)
        inorm(f"{t}.conv.4", c)
        conv(f"{t}.conv.7", c, c)
    conv(f"{prefix}.{1 + num_res}", c, c, 1)
    return sd


def _fake_linears(rng, prefix, dims, idxs):
    sd = {}
    for idx, (i, o) in zip(idxs, dims):
        sd[f"{prefix}.{idx}.weight"] = rng.normal(size=(o, i)).astype(
            np.float32) * 0.05
        sd[f"{prefix}.{idx}.bias"] = np.zeros(o, np.float32)
    return sd


def _fake_dist_decoder_sd(rng, prefix):
    sd = {}
    for head, out in [("mean_decoder", 2), ("var_decoder", 2),
                      ("aw_decoder", 1)]:
        sd.update(_fake_linears(rng, f"{prefix}.{head}",
                                [(32, 32), (32, 32), (32, out)], [0, 2, 4]))
    return sd


def _fake_agg_net_sd(rng, prefix):
    sd = {}
    sd.update(_fake_linears(rng, f"{prefix}.prob_embed",
                            [(34, 32), (32, 32)], [0, 2]))
    a = f"{prefix}.agg_impl"
    seqs = {
        "ray_dir_fc": [(4, 16), (16, 35)],
        "base_fc": [(207, 64), (64, 32)],
        "vis_fc": [(32, 32), (32, 33)],
        "vis_fc2": [(32, 32), (32, 1)],
        "geometry_fc": [(65, 64), (64, 16)],
        "neuray_fc": [(32, 8), (8, 1)],
        "out_geometry_fc": [(16, 16), (16, 1)],
        "rgb_fc": [(37, 16), (16, 8), (8, 1)],
    }
    for name, dims in seqs.items():
        sd.update(_fake_linears(rng, f"{a}.{name}", dims,
                                [0, 2, 4][:len(dims)]))
    for lin in ["w_qs", "w_ks", "w_vs", "fc"]:
        sd[f"{a}.ray_attention.{lin}.weight"] = rng.normal(
            size=(16, 16)).astype(np.float32) * 0.1
    sd[f"{a}.ray_attention.layer_norm.weight"] = np.ones(16, np.float32)
    sd[f"{a}.ray_attention.layer_norm.bias"] = np.zeros(16, np.float32)
    return sd


def _fake_renderer_sd(rng):
    """Full NeuralRayGenRenderer network_state_dict with reference keys."""
    sd = {}
    sd.update(_fake_renderer_resunet_sd(rng, "image_encoder", (1, 2, 6), 16))
    sd.update(_fake_renderer_resunet_sd(rng, "init_net.res_net",
                                        (2, 3, 6), 32))
    sd.update(_fake_conv_res_conv_sd(rng, "init_net.depth_conv", 1, 32, 1))
    sd.update(_fake_conv_res_conv_sd(rng, "init_net.out_conv", 64, 32, 1))
    sd.update(_fake_conv_res_conv_sd(rng, "vis_encoder.out_conv", 64, 32, 2))
    for dd in ["dist_decoder", "fine_dist_decoder"]:
        sd.update(_fake_dist_decoder_sd(rng, dd))
    for agg in ["agg_net", "fine_agg_net"]:
        sd.update(_fake_agg_net_sd(rng, agg))
    # buffers / frozen depth net (not part of the flax tree)
    sd["sph_fitter.regs"] = np.zeros(16, np.float32)
    sd["init_net.depth_net.unet.equi_encoder.conv1.weight"] = np.zeros(
        (64, 3, 7, 7), np.float32)
    return sd


def test_convert_renderer_shapes_and_forward():
    import __graft_entry__ as ge
    rng = np.random.default_rng(3)
    sd = _fake_renderer_sd(rng)
    converted = tc.convert_renderer(sd)

    model = ge._build()
    data = ge._tiny_data(32, 64, 16, 32, rn=8)
    init_vars = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    problems = tc.verify_tree_shapes(converted["params"],
                                     init_vars["params"])
    assert not problems, problems[:20]

    out = jax.jit(model.apply)(jax.tree.map(jnp.asarray, converted), data)
    assert np.isfinite(np.asarray(out["pixel_colors_nr_fine"])).all()

    dnet = tc.extract_renderer_depth_net(sd)
    assert "unet.equi_encoder.conv1.weight" in dnet


def test_extract_ray_feats():
    sd = {"ray_feats.0": np.zeros((1, 32, 64, 128), np.float32),
          "ray_feats.1": np.ones((1, 32, 64, 128), np.float32)}
    feats = tc.extract_ray_feats(sd)
    assert len(feats) == 2 and feats[0].shape == (64, 128, 32)
    assert feats[1][0, 0, 0] == 1.0


def _fake_equi_depth_sd(rng):
    """Reference UniFuse…/networks/equi.py state dict (full decoder)."""
    sd = _fake_resnet18_sd("equi_encoder", rng)

    def conv(k, o, i, s=3):
        sd[f"{k}.weight"] = rng.normal(size=(o, i, s, s)).astype(np.float32)
        sd[f"{k}.bias"] = np.zeros(o, np.float32)

    dims = [(512, 256), (256 + 256, 256), (256, 128), (128 + 128, 128),
            (128, 64), (64 + 64, 64), (64, 32), (32 + 64, 32), (32, 16),
            (16, 16)]
    for i, (cin, cout) in enumerate(dims):
        conv(f"equi_decoder.{i}.conv.conv", cout, cin)
    conv(f"equi_decoder.{len(dims)}.conv", 1, 16)
    return sd


def test_convert_equi_depth_shapes_and_forward():
    from panogrf_tpu.models.unifuse import EquiDepth
    rng = np.random.default_rng(4)
    sd = _fake_equi_depth_sd(rng)
    converted = tc.convert_equi_depth(sd)

    model = EquiDepth()
    equi = jnp.zeros((1, 64, 128, 3))
    init_vars = jax.jit(model.init)(jax.random.PRNGKey(0), equi)
    problems = tc.verify_tree_shapes(converted["params"],
                                     init_vars["params"])
    assert not problems, problems[:10]
    converted = jax.tree.map(jnp.asarray, converted)
    out = jax.jit(model.apply)(converted, equi)
    assert np.isfinite(np.asarray(out["pred_depth"])).all()
    assert out["pred_depth"].shape == (1, 64, 128, 1)
    assert out["mono_feat"].shape == (1, 32, 64, 32)


def test_select_mono_factory():
    from panogrf_tpu.models.unifuse import (EquiDepth, UniFuse as UF,
                                            select_mono)
    m = select_mono({"mono_net": "Equi", "max_depth": 8.0,
                     "mono_uncertainty": True})
    assert isinstance(m, EquiDepth) and m.max_depth == 8.0 and m.uncertainty
    m = select_mono({"mono_net": "UniFuse", "mono_fusion": "cat"})
    assert isinstance(m, UF) and m.fusion_type == "cat"
    with pytest.raises(ValueError):
        select_mono({"mono_net": "PanoFormer"})


def test_convert_cost_reg_shapes_and_forward():
    from panogrf_tpu.nn.blocks import CostRegNet
    rng = np.random.default_rng(7)
    sd = {}

    def conv3(k, o, i):
        sd[f"{k}.conv.weight"] = rng.normal(size=(o, i, 3, 3, 3)).astype(
            np.float32)

    def bn(k, c):
        sd[f"{k}.bn.weight"] = np.ones(c, np.float32)
        sd[f"{k}.bn.bias"] = np.zeros(c, np.float32)
        sd[f"{k}.bn.running_mean"] = np.zeros(c, np.float32)
        sd[f"{k}.bn.running_var"] = np.ones(c, np.float32)

    dims = {"conv0": (8, 4), "conv1": (16, 8), "conv2": (16, 16),
            "conv3": (32, 16), "conv4": (32, 32), "conv5": (64, 32),
            "conv6": (64, 64), "conv7": (32, 64), "conv9": (16, 32),
            "conv11": (8, 16)}
    for name, (o, i) in dims.items():
        conv3(f"unet3d.{name}", o, i)
        bn(f"unet3d.{name}", o)
    conv3("unet3d.prob", 1, 8)

    p, s = tc.convert_cost_reg(sd)
    model = CostRegNet()
    x = jnp.zeros((1, 8, 16, 32, 4))
    init_vars = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    assert not tc.verify_tree_shapes(p, init_vars["params"])
    assert not tc.verify_tree_shapes(s, init_vars["batch_stats"])
    out = jax.jit(model.apply)(
        {"params": jax.tree.map(jnp.asarray, p),
         "batch_stats": jax.tree.map(jnp.asarray, s)}, x)
    assert out.shape == (1, 8, 16, 32, 1)
    assert np.isfinite(np.asarray(out)).all()
