"""Converter hardening: state dicts come from REAL torch modules rebuilt
from the reference constructors (tests/torch_skeletons.py), and — where
the forward is cheap to mirror — torch and converted-flax outputs are
compared numerically.  Catches the two bug classes hand-typed key lists
cannot: registration-ORDER errors (ModuleList indices) and weight
TRANSPOSITION errors (VERDICT r2 Weak #4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from panogrf_tpu.utils import torch_convert as tc  # noqa: E402
import torch_skeletons as sk  # noqa: E402


def _np_sd(module, prefix=""):
    return {f"{prefix}{k}": v.detach().numpy().copy()
            for k, v in module.state_dict().items()}


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)


def test_resnet18_encoder_numeric_parity():
    """Converted torchvision-layout weights reproduce the torch forward
    (all 5 pyramid taps) bit-for-bit-ish in float32."""
    from panogrf_tpu.nn.resnet import ResNetEncoder
    tm = sk.TorchResNet18()
    _randomize(tm, 0)
    tm.eval()
    sd = _np_sd(tm, "enc.")
    p, s = tc.convert_resnet_encoder(sd, "enc")

    x = np.random.default_rng(1).normal(
        size=(1, 32, 64, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    model = ResNetEncoder(wrap=False)
    feats_f = model.apply({"params": jax.tree.map(jnp.asarray, p),
                           "batch_stats": jax.tree.map(jnp.asarray, s)},
                          jnp.asarray(x))
    assert len(feats_f) == 5
    for ft, ff in zip(feats_t, feats_f):
        np.testing.assert_allclose(np.asarray(ff),
                                   ft.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-4, rtol=2e-4)


def test_dist_decoder_numeric_parity():
    """Torch MixtureLogisticsDistDecoder heads == converted flax heads."""
    from panogrf_tpu.renderer.dist_decoder import \
        MixtureLogisticsDistDecoder
    tm = sk.TorchMixtureLogisticsDistDecoder()
    _randomize(tm, 2)
    tm.eval()
    sd = _np_sd(tm, "dist_decoder.")
    p = tc.convert_dist_decoder(sd, "dist_decoder")

    x = np.random.default_rng(3).normal(size=(64, 32)).astype(np.float32)
    with torch.no_grad():
        mean_t, var_t, aw_t = tm(torch.from_numpy(x))

    model = MixtureLogisticsDistDecoder(use_vis=False)
    mean, var, vis, aw = model.apply(
        {"params": jax.tree.map(jnp.asarray, p)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mean), mean_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), var_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(aw), aw_t.numpy(), atol=1e-5)
    assert vis is None


def test_unifuse_decoder_order_from_real_modulelist():
    """Full UniFuse conversion from GENUINE module state_dicts; each
    decoder stage's first conv carries a marker so an index-order bug in
    ``_UNIFUSE_DECODER_ORDER`` mis-assigns a marker and fails loudly
    (shape checks alone can't catch swaps between same-shaped stages,
    e.g. fusion_2/fusion_1 at 64 channels)."""
    from panogrf_tpu.models.unifuse import UniFuse

    class TorchUniFuseSkeleton(torch.nn.Module):
        # constructor mirrors reference networks/unifuse.py:30-95
        def __init__(self):
            super().__init__()
            self.equi_encoder = sk.TorchResNet18()
            self.cube_encoder = sk.TorchResNet18()
            self.equi_decoder, self.order = sk.build_unifuse_decoder()

    tm = TorchUniFuseSkeleton()
    _randomize(tm, 4)
    # markers: stage i's first conv weight := i + 1
    with torch.no_grad():
        for i, mod in enumerate(tm.equi_decoder):
            first = next(mod.parameters())
            first.fill_(float(i + 1))
    sd = _np_sd(tm)
    converted = tc.convert_unifuse(sd, fusion_type="cee")

    model = UniFuse(fusion_type="cee", se_in_fusion=True)
    h, w = 64, 128
    equi = jnp.zeros((1, h, w, 3))
    cube = jnp.zeros((1, 6, h // 2, h // 2, 3))
    init_vars = jax.jit(model.init)(jax.random.PRNGKey(0), equi, cube)
    for col in ("params", "batch_stats"):
        problems = tc.verify_tree_shapes(converted[col], init_vars[col])
        assert not problems, problems[:10]

    order = {n: i for i, n in enumerate(tm.order)}
    assert tm.order == tc._UNIFUSE_DECODER_ORDER
    # ConvELU_{i} carries the marker of its named stage
    for i, name in enumerate(tc._CONVELU_ORDER):
        k = converted["params"][f"ConvELU_{i}"]["Conv_0"]["kernel"]
        assert float(np.unique(k)[0]) == order[name] + 1, (i, name)
    # fusion layers: res_conv1 is CEELayer's first registered parameter
    for i, name in enumerate(tc._FUSION_ORDER):
        k = converted["params"][f"CEELayer_{i}"]["res_conv1"]["kernel"]
        assert float(np.unique(k)[0]) == order[name] + 1, (i, name)
    # depth head
    k = converted["params"]["Conv3x3Head_0"]["Conv_0"]["kernel"]
    assert float(np.unique(k)[0]) == order["depthconv_0"] + 1

    # and the converted tree runs
    out = jax.jit(model.apply)(jax.tree.map(jnp.asarray, converted),
                               equi, cube)
    assert np.isfinite(np.asarray(out["pred_depth"])).all()


def test_agg_net_sequentials_real_state_dict():
    """Agg-net conversion from genuine nn.Sequential state_dicts (real
    Linear index naming + (out, in) weight orientation)."""
    from panogrf_tpu.renderer.agg_net import DefaultAggregationNet
    mods = sk.build_agg_sequentials()
    attn = torch.nn.ModuleDict({
        "w_qs": torch.nn.Linear(16, 16, bias=False),
        "w_ks": torch.nn.Linear(16, 16, bias=False),
        "w_vs": torch.nn.Linear(16, 16, bias=False),
        "fc": torch.nn.Linear(16, 16, bias=False),
        "layer_norm": torch.nn.LayerNorm(16, eps=1e-6),
    })
    sd = {}
    sd.update(_np_sd(mods.pop("prob_embed"), "agg_net.prob_embed."))
    for name, m in mods.items():
        sd.update(_np_sd(m, f"agg_net.agg_impl.{name}."))
    sd.update(_np_sd(attn, "agg_net.agg_impl.ray_attention."))
    p = tc.convert_agg_net(sd, "agg_net")

    qn, rn, dn, rfn = 1, 4, 8, 2
    rng = np.random.default_rng(5)
    prj = {
        "hit_prob": jnp.asarray(rng.uniform(size=(qn, rn, dn, rfn, 1)),
                                jnp.float32),
        "vis": jnp.asarray(rng.uniform(size=(qn, rn, dn, rfn, 1)),
                           jnp.float32),
        "rgb": jnp.asarray(rng.uniform(size=(qn, rn, dn, rfn, 3)),
                           jnp.float32),
        "dir": jnp.asarray(rng.normal(size=(qn, rn, dn, rfn, 3)),
                           jnp.float32),
        "ray_feats": jnp.asarray(rng.normal(size=(qn, rn, dn, rfn, 32)),
                                 jnp.float32),
        "img_feats": jnp.asarray(rng.normal(size=(qn, rn, dn, rfn, 32)),
                                 jnp.float32),
    }
    que_dir = jnp.asarray(rng.normal(size=(qn, rn, dn, 3)), jnp.float32)
    model = DefaultAggregationNet(n_samples=dn)
    init_vars = jax.jit(model.init)(jax.random.PRNGKey(0), prj, que_dir)
    problems = tc.verify_tree_shapes(p, init_vars["params"])
    assert not problems, problems[:10]
    density, colors = model.apply({"params": jax.tree.map(jnp.asarray, p)},
                                  prj, que_dir)
    assert np.isfinite(np.asarray(density)).all()
    assert np.isfinite(np.asarray(colors)).all()
