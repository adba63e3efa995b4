"""Fused IBRNet/NeuRay per-sample pooling kernel.

The aggregation network (reference ``network/ibrnet.py:315-373``) chains
~40 small element-wise/matmul ops over (rays*samples, views, 35) tensors.
Under XLA each unfused step round-trips HBM with the 35-wide feature axis
padded to 128 lanes — measured 73 ms per 8192x64 chunk for ~30 GFLOP of
real math (<1% efficiency).  This kernel runs the whole chain up to (and
including) geometry_fc plus the view-blended RGB head inside VMEM for a
block of rows; only the dn-attention + sigma head remain outside (they
need per-ray context).

Layout: inputs are (v, N, 128) with true features zero-padded to 128
lanes; weight matrices are zero-padded to (128, 128) so padded input lanes
multiply into zeros — results are exact.  Wide inputs (base_fc's 207, the
65-wide geometry_fc, rgb_fc's 37) are decomposed into per-segment matmuls
against row-blocks of the original weight matrix.

Output: (N, 128) packed as [0:16 geometry features, 16:19 blended rgb,
19 num_valid_views, rest zero].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128


def _pad_mat(w, rows=LANES, cols=LANES):
    rows = max(rows, w.shape[0])
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, cols - w.shape[1])))


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _kernel(num_views,
            rgbf_ref, nray_ref, rdiff_ref, mask_ref,
            dir_w1, dir_b1, dir_w2, dir_b2,
            nr_w1, nr_b1, nr_w2, nr_b2,
            base_wg0, base_wg1, base_wg2, base_wg3, base_wr, base_wn,
            base_b1, base_w2, base_b2,
            vis_w1, vis_b1, vis_w2, vis_b2,
            vis2_w1, vis2_b1, vis2_w2, vis2_b2,
            geo_wm, geo_wv, geo_ws, geo_b1, geo_w2, geo_b2,
            rgb_wx, rgb_wv, rgb_wd, rgb_b1, rgb_w2, rgb_b2, rgb_w3, rgb_b3,
            out_ref):
    v = num_views
    eps = 1e-8

    def ext(x):
        b, f = x.shape
        if f == LANES:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((b, LANES - f), x.dtype)], axis=1)

    masks = [mask_ref[i][:, 0:1] for i in range(v)]           # (B, 1)
    msum = sum(masks) + eps
    weight = [m / msum for m in masks]

    rgb_feat = []
    rgb_in = []
    w0 = []
    for i in range(v):
        x = ext(rgbf_ref[i])                                   # (B, 128)
        rgb_in.append(x)                                       # lanes 0:3
        d = ext(rdiff_ref[i])
        h = _elu(_dot(d, dir_w1[:]) + dir_b1[:])
        h = _elu(_dot(h, dir_w2[:]) + dir_b2[:])
        rgb_feat.append(x + h)
        nh = _elu(_dot(ext(nray_ref[i]), nr_w1[:]) + nr_b1[:])
        nh = _dot(nh, nr_w2[:]) + nr_b2[:]
        w0.append(_sigmoid(nh[:, 0:1]) * weight[i])

    mean0 = sum(rgb_feat[i] * w0[i] for i in range(v))
    var0 = sum(((rgb_feat[i] - mean0) ** 2) * w0[i] for i in range(v))
    mean1 = sum(rgb_feat[i] * weight[i] for i in range(v))
    var1 = sum(((rgb_feat[i] - mean1) ** 2) * weight[i] for i in range(v))

    # base_fc over [mean0|var0|mean1|var1|rgb_feat_i|neuray_i] via segments
    gf_part = (_dot(mean0, base_wg0[:]) + _dot(var0, base_wg1[:])
               + _dot(mean1, base_wg2[:]) + _dot(var1, base_wg3[:]))
    xs = []
    vis = []
    for i in range(v):
        h = gf_part + _dot(rgb_feat[i], base_wr[:]) \
            + _dot(ext(nray_ref[i]), base_wn[:]) + base_b1[:]
        h = _elu(h)
        x = _elu(_dot(h, base_w2[:]) + base_b2[:])              # (B, 32pad)

        hv = _elu(_dot(x * weight[i], vis_w1[:]) + vis_b1[:])
        hv = _elu(_dot(hv, vis_w2[:]) + vis_b2[:])              # (B, 33pad)
        x_res = hv  # lanes 0:32 are x_res, lane 32 is vis logit
        vis_i = _sigmoid(hv[:, 32:33]) * masks[i]
        x = x + x_res * (jax.lax.broadcasted_iota(
            jnp.int32, (1, LANES), 1) < 32).astype(x.dtype)
        h2 = _elu(_dot(x * vis_i, vis2_w1[:]) + vis2_b1[:])
        vis_i = _sigmoid((_dot(h2, vis2_w2[:]) + vis2_b2[:])[:, 0:1]) \
            * masks[i]
        xs.append(x)
        vis.append(vis_i)

    vsum = sum(vis) + eps
    wgt = [vi / vsum for vi in vis]
    mean = sum(xs[i] * wgt[i] for i in range(v))
    var = sum(((xs[i] - mean) ** 2) * wgt[i] for i in range(v))
    wmean = sum(wgt) / v                                       # (B, 1)

    # wmean is (B, 1): its contribution is just row 0 of geo_ws broadcast
    g = _dot(mean, geo_wm[:]) + _dot(var, geo_wv[:]) \
        + wmean * geo_ws[0:1, :] + geo_b1[:]
    g = _elu(g)
    geo = _elu(_dot(g, geo_w2[:]) + geo_b2[:])                 # (B, 16pad)

    # rgb blend head (independent of attention)
    logits = []
    for i in range(v):
        h = _dot(xs[i], rgb_wx[:]) + vis[i] * rgb_wv[:] \
            + _dot(ext(rdiff_ref[i]), rgb_wd[:]) + rgb_b1[:]
        h = _elu(h)
        h = _elu(_dot(h, rgb_w2[:]) + rgb_b2[:])
        l = (_dot(h, rgb_w3[:]) + rgb_b3[:])[:, 0:1]
        # compare in f32: Mosaic rejects cmpf on bf16 vectors
        l = jnp.where(masks[i].astype(jnp.float32) == 0.0, -1e9, l)
        logits.append(l)
    mx = jnp.maximum(*logits) if v == 2 else functools.reduce(
        jnp.maximum, logits)
    exps = [jnp.exp(l - mx) for l in logits]
    esum = sum(exps) + 1e-20
    rgb = sum(rgb_in[i] * (exps[i] / esum) for i in range(v))  # lanes 0:3

    nvalid = sum(masks)
    lane = jax.lax.broadcasted_iota(jnp.int32, geo.shape, 1)
    out = jnp.where(lane < 16, geo, 0.0)
    rgb_shift = jnp.roll(rgb, 16, axis=1)  # rgb lanes 0:3 -> 16:19
    out = jnp.where((lane >= 16) & (lane < 19), rgb_shift, out)
    out = jnp.where(lane == 19, nvalid, out)
    out_ref[:] = out.astype(out_ref.dtype)


def _pad_like(x):
    """(B, 1) -> (B, 128) with value in lane 0."""
    return jnp.pad(x, ((0, 0), (0, LANES - x.shape[-1])))


def pool_reference(rgb_feat: Array, neuray_feat: Array, ray_diff: Array,
                   mask: Array, params: dict,
                   geometry_only: bool = False) -> tuple:
    """Plain-jnp twin of the kernel (CPU path + custom-VJP backward).

    Shapes as :func:`ibr_pool`; returns (geo (N,16), rgb (N,3),
    nvalid (N,1)).  Mirrors reference ``ibrnet.py:315-373`` up to (and
    excluding) the ray attention.

    LAYOUT NOTE (measured 2026-08-17): a view-major flat rewrite —
    every intermediate (v*N, c) instead of (N, v, c), cross-view
    reductions via row-block slices — was MEASURED SLOWER end to end
    (2203 vs 1900 ms/frame default; 1905 vs 1606 with decode_on_map):
    the input transposes + per-view concats cost more than the
    (N, v=2, c) sublane padding they remove, because XLA keeps most of
    this chain fused.  Keep the (N, v, c) formulation; the flat twin
    survives as the regression test `test_pool_flat_matches_nvc_layout`.
    """
    p = params
    eps = 1e-8

    def seq2(name, x, act_last=True):
        h = _elu(x @ p[name]["w0"] + p[name]["b0"])
        h = h @ p[name]["w1"] + p[name]["b1"]
        return _elu(h) if act_last else h

    if "prob_embed" in p:
        # embed-in-kernel twin: neuray_feat is raw [ray_feats | hit | vis]
        # and the two prob-embedding Dense layers run here (reference
        # ``aggregate_net.py:35-39``)
        pe = p["prob_embed"]
        e = jax.nn.relu(neuray_feat @ pe["k0"] + pe["b0"])
        neuray_feat = e @ pe["k1"] + pe["b1"]

    weight = mask / (jnp.sum(mask, axis=1, keepdims=True) + eps)  # (N,v,1)
    dirf = seq2("ray_dir_fc", ray_diff)
    rgb_in = rgb_feat[..., :3]
    rgbf = rgb_feat + dirf

    w0 = _sigmoid(seq2("neuray_fc", neuray_feat, act_last=False)) * weight

    def mean_var(x, w):
        m = jnp.sum(x * w, axis=1, keepdims=True)
        vv = jnp.sum(w * (x - m) ** 2, axis=1, keepdims=True)
        return m, vv

    mean0, var0 = mean_var(rgbf, w0)
    mean1, var1 = mean_var(rgbf, weight)
    gf = jnp.concatenate([mean0, var0, mean1, var1], -1)
    x = jnp.concatenate([jnp.broadcast_to(gf, (*rgbf.shape[:2],
                                               gf.shape[-1])),
                         rgbf, neuray_feat], -1)
    x = seq2("base_fc", x)

    hv = seq2("vis_fc", x * weight)
    x_res, vis = hv[..., :-1], hv[..., -1:]
    vis = _sigmoid(vis) * mask
    x = x + x_res
    h2 = _elu((x * vis) @ p["vis_fc2"]["w0"] + p["vis_fc2"]["b0"])
    vis = _sigmoid(h2 @ p["vis_fc2"]["w1"] + p["vis_fc2"]["b1"]) * mask
    wgt = vis / (jnp.sum(vis, axis=1, keepdims=True) + eps)

    mean, var = mean_var(x, wgt)
    g_in = jnp.concatenate([mean[:, 0], var[:, 0],
                            jnp.mean(wgt, axis=1)], -1)
    geo = seq2("geometry_fc", g_in)
    nvalid = jnp.sum(mask[..., 0], axis=1, keepdims=True)

    if geometry_only:
        # serving coarse pass: its blended RGB is discarded (only the
        # density/hit-prob importance feeds the fine pass), so skip the
        # rgb_fc head entirely — bit-exact for the fine image
        return geo, jnp.zeros((geo.shape[0], 3), geo.dtype), nvalid

    r_in = jnp.concatenate([x, vis, ray_diff], -1)
    h = _elu(r_in @ p["rgb_fc"]["w0"] + p["rgb_fc"]["b0"])
    h = _elu(h @ p["rgb_fc"]["w1"] + p["rgb_fc"]["b1"])
    logit = h @ p["rgb_fc"]["w2"] + p["rgb_fc"]["b2"]
    logit = jnp.where(mask == 0, -1e9, logit)
    blend = jax.nn.softmax(logit, axis=1)
    rgb = jnp.sum(rgb_in * blend, axis=1)
    return geo, rgb, nvalid


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ibr_pool_op(rgb_feat, neuray_feat, ray_diff, mask, params,
                use_pallas: bool = True, geometry_only: bool = False):
    """Differentiable pooled stage; Pallas forward on TPU, jnp elsewhere.

    ``geometry_only`` skips the view-blended RGB head (returns zeros) —
    valid only where the caller discards the coarse colors (serving).
    With ``params['prob_embed']`` set, ``neuray_feat`` is the raw 34-ch
    [ray_feats | hit | vis] block and the prob embedding runs inside the
    pooled stage (kernel or reference twin).
    """
    embed = "prob_embed" in params
    nd = neuray_feat.shape[-1] - (2 if embed else 0)
    if use_pallas and jax.default_backend() == "tpu":
        v, f = rgb_feat.shape[1], rgb_feat.shape[2]
        if v == 2 and f == 35 and nd == 32:
            from panogrf_tpu.ops.pallas.ibr_pool2 import ibr_pool2
            return ibr_pool2(rgb_feat, neuray_feat, ray_diff, mask, params,
                             geometry_only=geometry_only)
        if embed:  # v1 kernel has no embed mode: embed in jnp, then pool
            pe = params["prob_embed"]
            e = jax.nn.relu(neuray_feat @ pe["k0"] + pe["b0"])
            neuray_feat = e @ pe["k1"] + pe["b1"]
            params = {k: v for k, v in params.items() if k != "prob_embed"}
        return ibr_pool(rgb_feat, neuray_feat, ray_diff, mask, params)
    return pool_reference(rgb_feat, neuray_feat, ray_diff, mask, params,
                          geometry_only)


def _pool_fwd(rgb_feat, neuray_feat, ray_diff, mask, params, use_pallas,
              geometry_only):
    out = ibr_pool_op(rgb_feat, neuray_feat, ray_diff, mask, params,
                      use_pallas, geometry_only)
    return out, (rgb_feat, neuray_feat, ray_diff, mask, params)


def _pool_bwd(use_pallas, geometry_only, res, g):
    rgb_feat, neuray_feat, ray_diff, mask, params = res
    _, vjp = jax.vjp(lambda a, b, c, d, p:
                     pool_reference(a, b, c, d, p, geometry_only),
                     rgb_feat, neuray_feat, ray_diff, mask, params)
    return vjp(g)


ibr_pool_op.defvjp(_pool_fwd, _pool_bwd)


def ibr_pool(rgb_feat: Array, neuray_feat: Array, ray_diff: Array,
             mask: Array, params: dict, block_rows: int = 512,
             interpret: bool = False) -> tuple:
    """Run the fused pooling chain.

    :param rgb_feat: (N, v, F) with F = in_feat_ch + 3 (e.g. 35).
    :param neuray_feat: (N, v, 32); ray_diff (N, v, 4); mask (N, v, 1).
    :param params: dict of the agg-net parameter tree (see
        ``agg_net.IBRNetWithNeuRay`` with _Seq raw params).
    :return: (geo (N, 16), rgb (N, 3), num_valid (N, 1)).
    """
    n, v, f = rgb_feat.shape
    n_p = (n + block_rows - 1) // block_rows * block_rows

    def prep(x):
        # Pre-pad BOTH rows and lanes here: in-kernel lane extension
        # (concat to 128) lowered badly in Mosaic; zero-padding in the
        # wrapper makes the kernel's ext() a no-op that XLA folds into the
        # HBM->VMEM pipeline copy.
        x = jnp.swapaxes(x, 0, 1)                   # (v, N, F)
        return jnp.pad(x, ((0, 0), (0, n_p - n),
                           (0, LANES - x.shape[-1])))

    rgbf = prep(rgb_feat)
    nray = prep(neuray_feat)
    rdiff = prep(ray_diff)
    maskp = prep(mask)

    p = params

    def seq(name, i):
        return p[name][f"w{i}"], p[name][f"b{i}"]

    dw1, db1 = seq("ray_dir_fc", 0)
    dw2, db2 = seq("ray_dir_fc", 1)
    nw1, nb1 = seq("neuray_fc", 0)
    nw2, nb2 = seq("neuray_fc", 1)
    bw1, bb1 = seq("base_fc", 0)
    bw2, bb2 = seq("base_fc", 1)
    vw1, vb1 = seq("vis_fc", 0)
    vw2, vb2 = seq("vis_fc", 1)
    v2w1, v2b1 = seq("vis_fc2", 0)
    v2w2, v2b2 = seq("vis_fc2", 1)
    gw1, gb1 = seq("geometry_fc", 0)
    gw2, gb2 = seq("geometry_fc", 1)
    rw1, rb1 = seq("rgb_fc", 0)
    rw2, rb2 = seq("rgb_fc", 1)
    rw3, rb3 = seq("rgb_fc", 2)

    nd = neuray_feat.shape[-1]
    # base_fc w1 rows: 4 globalfeat segments of f, then rgb_feat f, then nd
    segs = [bw1[i * f:(i + 1) * f] for i in range(4)]
    base_wr = bw1[4 * f:5 * f]
    base_wn = bw1[5 * f:5 * f + nd]
    # geometry_fc w1 rows: mean 32 | var 32 | wmean 1
    xdim = bw2.shape[1]
    geo_wm = gw1[:xdim]
    geo_wv = gw1[xdim:2 * xdim]
    geo_ws = gw1[2 * xdim:2 * xdim + 1]
    # rgb_fc w1 rows: x 32 | vis 1 | ray_diff 4
    rgb_wx = rw1[:xdim]
    rgb_wv_row = rw1[xdim:xdim + 1]          # (1, 16)
    rgb_wd = rw1[xdim + 1:xdim + 5]

    weights = [
        _pad_mat(dw1), _pad_like(db1[None]), _pad_mat(dw2),
        _pad_like(db2[None]),
        _pad_mat(nw1), _pad_like(nb1[None]), _pad_mat(nw2),
        _pad_like(nb2[None]),
        *[_pad_mat(s) for s in segs], _pad_mat(base_wr), _pad_mat(base_wn),
        _pad_like(bb1[None]), _pad_mat(bw2), _pad_like(bb2[None]),
        _pad_mat(vw1), _pad_like(vb1[None]), _pad_mat(vw2),
        _pad_like(vb2[None]),
        _pad_mat(v2w1), _pad_like(v2b1[None]), _pad_mat(v2w2),
        _pad_like(v2b2[None]),
        _pad_mat(geo_wm), _pad_mat(geo_wv), _pad_mat(geo_ws),
        _pad_like(gb1[None]), _pad_mat(gw2), _pad_like(gb2[None]),
        _pad_mat(rgb_wx), _pad_like(rgb_wv_row), _pad_mat(rgb_wd),
        _pad_like(rb1[None]), _pad_mat(rw2), _pad_like(rb2[None]),
        _pad_mat(rw3), _pad_like(rb3[None]),
    ]

    kern = functools.partial(_kernel, v)

    def big(arr):
        return pl.BlockSpec((v, block_rows, arr.shape[-1]),
                            lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    wspec = [pl.BlockSpec(w.shape, lambda i: tuple(0 for _ in w.shape),
                          memory_space=pltpu.VMEM) for w in weights]

    if interpret:
        # run the kernel logic with plain jnp via pallas interpret mode
        out = pl.pallas_call(
            kern,
            grid=(n_p // block_rows,),
            in_specs=[big(rgbf), big(nray), big(rdiff), big(maskp),
                      *wspec],
            out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_p, LANES), jnp.float32),
            interpret=True,
        )(rgbf, nray, rdiff, maskp, *weights)
    else:
        out = pl.pallas_call(
            kern,
            grid=(n_p // block_rows,),
            in_specs=[big(rgbf), big(nray), big(rdiff), big(maskp),
                      *wspec],
            out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_p, LANES), jnp.float32),
        )(rgbf, nray, rdiff, maskp, *weights)
    out = out[:n]
    return out[:, :16], out[:, 16:19], out[:, 19:20]
