"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panogrf_tpu.ops.pallas.fused_mlp import mlp2, mlp2_batched, _mlp2_ref

ON_TPU = jax.devices()[0].platform == "tpu"


def _data(n=300, din=207, dh=64, dout=32, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(n, din)) * 0.3, jnp.float32),
            jnp.asarray(rng.normal(size=(din, dh)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(dh,)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(dh, dout)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(dout,)) * 0.1, jnp.float32))


def test_mlp2_matches_reference_interpret():
    x, w1, b1, w2, b2 = _data()
    ref = _mlp2_ref(x, w1, b1, w2, b2, "elu", "elu")
    out = mlp2(x, w1, b1, w2, b2, "elu", "elu", 1024, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="compiled pallas path needs TPU")
def test_mlp2_compiled_matches_reference():
    x, w1, b1, w2, b2 = _data(5000)
    ref = _mlp2_ref(x, w1, b1, w2, b2, "elu", "elu")
    out = jax.jit(lambda *a: mlp2(*a))(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_mlp2_grad_matches_reference():
    x, w1, b1, w2, b2 = _data(64, 35, 16, 8)

    def loss_pallas(args):
        return jnp.sum(mlp2(*args, "elu", "none", 1024, True) ** 2)

    def loss_ref(args):
        return jnp.sum(_mlp2_ref(*args, "elu", "none") ** 2)

    g1 = jax.grad(loss_pallas)((x, w1, b1, w2, b2))
    g2 = jax.grad(loss_ref)((x, w1, b1, w2, b2))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_mlp2_batched_shape():
    x, w1, b1, w2, b2 = _data(0)
    xb = jnp.ones((2, 3, 5, 207))
    out = mlp2_batched(xb, w1, b1, w2, b2, interpret=True)
    assert out.shape == (2, 3, 5, 32)


def _pool_nvc(rgb_feat, neuray_feat, ray_diff, mask, params):
    """Independently-written (N, v, c)-layout pooled stage, kept as the
    numeric twin for agg_net.pool_reference
    (reference ``ibrnet.py:315-373``)."""
    import jax
    import jax.numpy as jnp
    p = params
    eps = 1e-8
    _elu = lambda x: jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.)) - 1.)
    _sig = jax.nn.sigmoid

    def seq2(name, x, act_last=True):
        h = _elu(x @ p[name]["w0"] + p[name]["b0"])
        h = h @ p[name]["w1"] + p[name]["b1"]
        return _elu(h) if act_last else h

    weight = mask / (jnp.sum(mask, axis=1, keepdims=True) + eps)
    dirf = seq2("ray_dir_fc", ray_diff)
    rgb_in = rgb_feat[..., :3]
    rgbf = rgb_feat + dirf
    w0 = _sig(seq2("neuray_fc", neuray_feat, act_last=False)) * weight

    def mean_var(x, w):
        m = jnp.sum(x * w, axis=1, keepdims=True)
        vv = jnp.sum(w * (x - m) ** 2, axis=1, keepdims=True)
        return m, vv

    mean0, var0 = mean_var(rgbf, w0)
    mean1, var1 = mean_var(rgbf, weight)
    gf = jnp.concatenate([mean0, var0, mean1, var1], -1)
    x = jnp.concatenate(
        [jnp.broadcast_to(gf, (*rgbf.shape[:2], gf.shape[-1])),
         rgbf, neuray_feat], -1)
    x = seq2("base_fc", x)
    hv = seq2("vis_fc", x * weight)
    x_res, vis = hv[..., :-1], hv[..., -1:]
    vis = _sig(vis) * mask
    x = x + x_res
    h2 = _elu((x * vis) @ p["vis_fc2"]["w0"] + p["vis_fc2"]["b0"])
    vis = _sig(h2 @ p["vis_fc2"]["w1"] + p["vis_fc2"]["b1"]) * mask
    wgt = vis / (jnp.sum(vis, axis=1, keepdims=True) + eps)
    mean, var = mean_var(x, wgt)
    g_in = jnp.concatenate([mean[:, 0], var[:, 0],
                            jnp.mean(wgt, axis=1)], -1)
    geo = seq2("geometry_fc", g_in)
    r_in = jnp.concatenate([x, vis, ray_diff], -1)
    h = _elu(r_in @ p["rgb_fc"]["w0"] + p["rgb_fc"]["b0"])
    h = _elu(h @ p["rgb_fc"]["w1"] + p["rgb_fc"]["b1"])
    logit = h @ p["rgb_fc"]["w2"] + p["rgb_fc"]["b2"]
    logit = jnp.where(mask == 0, -1e9, logit)
    blend = jax.nn.softmax(logit, axis=1)
    rgb = jnp.sum(rgb_in * blend, axis=1)
    nvalid = jnp.sum(mask[..., 0], axis=1, keepdims=True)
    return geo, rgb, nvalid


@pytest.mark.parametrize("v", [2, 3])
def test_pool_flat_matches_nvc_layout(v):
    """pool_reference is numerically identical to the independent (N, v, c)
    twin above, including fully-masked rows."""
    import numpy as np
    import jax.numpy as jnp
    from panogrf_tpu.renderer.agg_net import pool_reference
    rng = np.random.default_rng(0)
    n, f, nd = 64, 35, 32
    params = {}
    shapes = {"ray_dir_fc": [(4, 16), (16, f)],
              "neuray_fc": [(nd, 8), (8, 1)],
              "base_fc": [(4 * f + f + nd, 64), (64, 32)],
              "vis_fc": [(32, 32), (32, 33)],
              "vis_fc2": [(32, 32), (32, 1)],
              "geometry_fc": [(65, 64), (64, 16)],
              "rgb_fc": [(32 + 1 + 4, 16), (16, 8), (8, 1)]}
    for name, dims in shapes.items():
        params[name] = {}
        for i, (a, b) in enumerate(dims):
            params[name][f"w{i}"] = jnp.asarray(
                rng.normal(0, 0.2, (a, b)), jnp.float32)
            params[name][f"b{i}"] = jnp.asarray(
                rng.normal(0, 0.1, (b,)), jnp.float32)
    rgbf = jnp.asarray(rng.normal(size=(n, v, f)), jnp.float32)
    nray = jnp.asarray(rng.normal(size=(n, v, nd)), jnp.float32)
    rdiff = jnp.asarray(rng.normal(size=(n, v, 4)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (n, v, 1)), jnp.float32)
    mask = mask.at[:4].set(0.0)  # some fully-masked rows
    a = _pool_nvc(rgbf, nray, rdiff, mask, params)
    b = pool_reference(rgbf, nray, rdiff, mask, params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-5)


def test_pool_reference_differentiable():
    """pool_reference carries nonzero gradients to every parameter group
    (the Pallas pool kernels were culled after the whole-frame TPU
    measurement — see agg_net.pool_reference docstring — so plain jax.grad
    through the XLA chain is the one backward path)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from panogrf_tpu.renderer.agg_net import pool_reference
    rng = np.random.default_rng(7)
    n, v, f, nd = 32, 2, 35, 32
    shapes = {"ray_dir_fc": [(4, 16), (16, f)],
              "neuray_fc": [(nd, 8), (8, 1)],
              "base_fc": [(4 * f + f + nd, 64), (64, 32)],
              "vis_fc": [(32, 32), (32, 33)],
              "vis_fc2": [(32, 32), (32, 1)],
              "geometry_fc": [(65, 64), (64, 16)],
              "rgb_fc": [(37, 16), (16, 8), (8, 1)]}
    params = {}
    for name, dims in shapes.items():
        params[name] = {}
        for i, (a_, b_) in enumerate(dims):
            params[name][f"w{i}"] = jnp.asarray(
                rng.normal(0, 0.2, (a_, b_)), jnp.float32)
            params[name][f"b{i}"] = jnp.asarray(
                rng.normal(0, 0.1, (b_,)), jnp.float32)
    rgbf = jnp.asarray(rng.normal(size=(n, v, f)), jnp.float32)
    nray = jnp.asarray(rng.normal(size=(n, v, nd)), jnp.float32)
    rdiff = jnp.asarray(rng.normal(size=(n, v, 4)), jnp.float32)
    mask = jnp.ones((n, v, 1), jnp.float32)

    g = jax.grad(lambda p: sum(jnp.sum(t) for t in pool_reference(
        rgbf, nray, rdiff, mask, p)[:2]))(params)
    for name in shapes:
        total = sum(float(jnp.abs(x).sum()) for x in g[name].values())
        assert total > 0.0, name
