"""IBRNet-with-NeuRay aggregation network (Flax).

Reference ``network/ibrnet.py:239-373`` (IBRNetWithNeuRay) wrapped by
``network/aggregate_net.py:16-89`` (DefaultAggregationNet).  Per (ray,
sample) the network pools appearance features across reference views with
NeuRay- and visibility-derived weights, runs a tiny 4-head attention along
the 64 samples of each ray, and emits density + view-blended RGB.

Everything is batched matmuls on (rays*samples, views, feat) tensors — pure
MXU work, no kernel needed; the attention is over dn<=128 tokens of width 16
so XLA handles it comfortably (SURVEY §2.8: ring attention unnecessary).

The reference hardcodes its sinusoidal positional table on "cuda:0"
(``ibrnet.py:312``); here it is just a traced constant.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


def sinusoid_pos_encoding(n_samples: int, d_hid: int) -> np.ndarray:
    """Classic transformer table (reference ``ibrnet.py:305-313``)."""
    pos = np.arange(n_samples)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_samples, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class _Kernel(nn.Module):
    """Bias-free Dense param holder (tree path identical to
    ``nn.Dense(use_bias=False)``: ``<name>/kernel``) whose weight is used
    in a fused matmul instead of a standalone layer call."""
    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_features, self.features))


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head attention (reference ``ibrnet.py:52-102``).

    Self-attention fast path: when q is k is v (the only way the renderer
    calls it), the three head projections run as ONE fused matmul against
    the lane-concatenated [Wq | Wk | Wv] — same math, one lane-padded
    (N, 3*d_model) intermediate instead of three (N, d_model) ones.
    Param tree is identical to the separate-Dense formulation.
    """
    n_head: int = 4
    d_model: int = 16
    d_k: int = 4
    d_v: int = 4
    # NOTE: a "folded" self-attention rewrite (precompose the tiny head
    # matrices into per-head (16,16) composites A_h = Wq_h Wk_h^T/sqrt(dk),
    # B_h = Wv_h Wfc_h, so the whole block is 4 batched matmuls with
    # contraction dims 16/256 instead of 5 with d_k=4) measured SLOWER on
    # the real chip: 1362 vs 1237 ms/frame at the r4 serving point — the
    # (b, h, q, 16) intermediates cost more HBM traffic than the skinny
    # d_k=4 contractions save on the MXU.  Culled (r4); don't re-add
    # without a whole-frame measurement.

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 mask: Array | None = None) -> Array:
        b, lq, _ = q.shape
        residual = q
        dm = self.d_model
        wq = _Kernel(dm, self.n_head * self.d_k, name="w_qs")()
        wk = _Kernel(dm, self.n_head * self.d_k, name="w_ks")()
        wv = _Kernel(dm, self.n_head * self.d_v, name="w_vs")()
        wq, wk, wv = (w.astype(q.dtype) for w in (wq, wk, wv))
        if q is k and q is v:
            y = q @ jnp.concatenate([wq, wk, wv], axis=1)
            nk = self.n_head * self.d_k
            qh = y[..., :nk].reshape(b, lq, self.n_head, self.d_k)
            kh = y[..., nk:2 * nk].reshape(b, lq, self.n_head, self.d_k)
            vh = y[..., 2 * nk:].reshape(b, lq, self.n_head, self.d_v)
        else:
            qh = (q @ wq).reshape(b, lq, self.n_head, self.d_k)
            kh = (k @ wk).reshape(b, -1, self.n_head, self.d_k)
            vh = (v @ wv).reshape(b, -1, self.n_head, self.d_v)
        qh, kh, vh = (jnp.swapaxes(t, 1, 2) for t in (qh, kh, vh))
        # NOTE: a VPU outer-product-sum reformulation of these scores
        # (avoiding the d_k=4 MXU contraction) measured SLOWER end to end
        # (5.45 vs 4.53 s/frame) — XLA already handles this einsum well
        # once the pass runs in bf16.  Keep the einsum.
        qh = qh / (self.d_k ** 0.5)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
        if mask is not None:
            attn = jnp.where(mask[:, None] == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        # out contraction is over k (= dn samples): fine on the MXU
        out = jnp.einsum("bhqk,bhkd->bhqd", attn,
                         vh.astype(attn.dtype)).astype(q.dtype)
        out = jnp.swapaxes(out, 1, 2).reshape(b, lq, -1)
        out = nn.Dense(self.d_model, use_bias=False, name="fc",
                       dtype=q.dtype)(out)
        out = out + residual
        return nn.LayerNorm(epsilon=1e-6, dtype=out.dtype)(out)


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def pool_reference(rgb_feat: Array, neuray_feat: Array, ray_diff: Array,
                   mask: Array, params: dict,
                   geometry_only: bool = False) -> tuple:
    """The per-sample cross-view pooling chain (reference
    ``ibrnet.py:315-373`` up to, and excluding, the ray attention).

    :param rgb_feat: (N, v, F) with F = in_feat_ch + 3 (e.g. 35);
        neuray_feat (N, v, 32); ray_diff (N, v, 4); mask (N, v, 1).
    :return: (geo (N, 16), rgb (N, 3), num_valid (N, 1)).

    Pure XLA by design — this chain is where the per-frame time goes, and
    the measured TPU result (2026-08-19) is that XLA's fusion of the whole
    per-chunk pipeline at small chunk sizes beats hand-written Pallas
    pool kernels end to end: a bf16 sample-row kernel won the ISOLATED
    stage (3.99 vs 4.93 ms at chunk 2048) but lost the FRAME 2605 vs
    1410 ms, because the pallas_call boundary (its operand layout/padding)
    broke XLA's fusion of the surrounding gather/decode/composite chain
    and forced HBM round-trips.  Two kernel generations were built,
    measured and culled; do not reintroduce a kernel here without a
    whole-frame measurement.

    LAYOUT NOTE (measured 2026-08-17): a view-major flat rewrite —
    every intermediate (v*N, c) instead of (N, v, c), cross-view
    reductions via row-block slices — was MEASURED SLOWER end to end
    (2203 vs 1900 ms/frame default; 1905 vs 1606 with decode_on_map):
    the input transposes + per-view concats cost more than the
    (N, v=2, c) sublane padding they remove, because XLA keeps most of
    this chain fused.  Keep the (N, v, c) formulation; the pre-flat twin
    survives as the regression test `test_pool_flat_matches_nvc_layout`.
    """
    p = params
    eps = 1e-8
    _sigmoid = jax.nn.sigmoid

    def seq2(name, x, act_last=True):
        h = _elu(x @ p[name]["w0"] + p[name]["b0"])
        h = h @ p[name]["w1"] + p[name]["b1"]
        return _elu(h) if act_last else h

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
    # base_fc layer 0 over [mean0|var0|mean1|var1 | rgbf | neuray]: the
    # first 4 segments are PER-POINT (broadcast to every view in the
    # reference concat, ``ibrnet.py:334-338``) — run them as one
    # per-point matmul against the top row-block of w0 and add the
    # per-view part, instead of materializing the (N, v, 207) concat.
    # Same math (row-block decomposition of one matmul); for v=2 it cuts
    # the dominant matmul's row count 414 -> 274 per point.
    f = rgbf.shape[-1]
    bw0, bb0 = p["base_fc"]["w0"], p["base_fc"]["b0"]
    gf = jnp.concatenate([mean0[:, 0], var0[:, 0], mean1[:, 0],
                          var1[:, 0]], -1)                  # (N, 4f)
    xv = jnp.concatenate([rgbf, neuray_feat], -1)           # (N, v, f+nd)
    h = _elu((gf @ bw0[:4 * f])[:, None] + xv @ bw0[4 * f:] + bb0)
    x = _elu(h @ p["base_fc"]["w1"] + p["base_fc"]["b1"])

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


class _DenseParams(nn.Module):
    """Parameter-compatible stand-in for ``nn.Dense`` whose weights can be
    either applied in place (XLA path) or handed to the fused Pallas pool
    kernel.  Declares ``kernel``/``bias`` under its own name, so the tree
    path (``.../prob_embed_0/kernel``) is identical to the ``nn.Dense`` it
    replaces — checkpoints and the torch converter are unaffected.
    """
    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> tuple:
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _Seq(nn.Module):
    """Dense stack with ELU activations between layers.

    Parameters are declared directly (``w{i}``/``b{i}``) so the same tree
    serves two execution paths: plain XLA matmuls, and — for 2-layer
    stacks on TPU — the fused Pallas MLP kernel
    (``panogrf_tpu/ops/pallas/fused_mlp.py``) which keeps the hidden
    activation in VMEM instead of round-tripping HBM.
    """
    dims: tuple
    final_act: str = "elu"  # 'elu' | 'none' | 'sigmoid' | 'relu'

    @nn.compact
    def __call__(self, x: Array) -> Array:
        layers = []
        din = x.shape[-1]
        for i, d in enumerate(self.dims):
            k = self.param(f"w{i}", nn.initializers.lecun_normal(),
                           (din, d))
            b = self.param(f"b{i}", nn.initializers.zeros, (d,))
            layers.append((k, b))
            din = d

        # match compute dtype of the input (bf16 inference path)
        layers = [(k.astype(x.dtype), b.astype(x.dtype)) for k, b in layers]

        if len(self.dims) == 2 and jax.default_backend() == "tpu":
            from panogrf_tpu.ops.pallas.fused_mlp import mlp2_batched
            (w1, b1), (w2, b2) = layers
            return mlp2_batched(x, w1, b1, w2, b2, act1="elu",
                                act2=self.final_act)

        for i, (k, b) in enumerate(layers):
            x = x @ k + b
            if i < len(layers) - 1:
                x = nn.elu(x)
        if self.final_act == "elu":
            x = nn.elu(x)
        elif self.final_act == "sigmoid":
            x = nn.sigmoid(x)
        elif self.final_act == "relu":
            x = nn.relu(x)
        return x


class IBRNetWithNeuRay(nn.Module):
    """(rgb_feat, neuray_feat, ray_diff, mask) -> (..., 4) rgb+sigma.

    Shapes: rgb_feat (nr, dn, v, f+3); neuray_feat (nr, dn, v, nd);
    ray_diff (nr, dn, v, 4); mask (nr, dn, v, 1).
    """
    neuray_in_dim: int = 32
    in_feat_ch: int = 32
    n_samples: int = 64

    # Skip the view-blended RGB head (serving coarse pass: only the density
    # importance is consumed, so this is bit-exact for the fine image).
    geometry_only: bool = False
    # MEASUREMENT-ONLY (bench --ablate attn): bypass the ray attention
    # (globalfeat passes through) to attribute its in-context frame cost.
    ablate_attention: bool = False
    # Depth-major ('dnr') input layout: inputs arrive (qn*dn, rn, v, c)
    # straight from the depth-major gather (render_ops, layout='dnr') and
    # dnr_dims = (qn, dn, rn).  The per-point pool is layout-blind; only
    # the POOLED 16/3/1-ch outputs get transposed to ray-major for the
    # ray attention — instead of ~90 channels of rows upstream.  Values
    # identical to the ray-major path (pure reordering).
    dnr_dims: tuple | None = None

    def _pool_params(self, in_dim: int, nd: int) -> dict:
        """Declare the pooled-stage parameter tree (shared by the Pallas
        kernel and the jnp reference path)."""
        f = in_dim  # in_feat_ch + 3
        shapes = {
            "ray_dir_fc": [(4, 16), (16, f)],
            "neuray_fc": [(nd, 8), (8, 1)],
            "base_fc": [(4 * f + f + nd, 64), (64, 32)],
            "vis_fc": [(32, 32), (32, 33)],
            "vis_fc2": [(32, 32), (32, 1)],
            "geometry_fc": [(65, 64), (64, 16)],
            "rgb_fc": [(32 + 1 + 4, 16), (16, 8), (8, 1)],
        }
        params = {}
        for name, dims in shapes.items():
            sub = {}
            for i, (a, b) in enumerate(dims):
                sub[f"w{i}"] = self.param(f"{name}_w{i}",
                                          nn.initializers.lecun_normal(),
                                          (a, b))
                sub[f"b{i}"] = self.param(f"{name}_b{i}",
                                          nn.initializers.zeros, (b,))
            params[name] = sub
        return params

    @nn.compact
    def __call__(self, rgb_feat: Array, neuray_feat: Array, ray_diff: Array,
                 mask: Array) -> Array:
        """``neuray_feat`` is the 32-ch prob embedding."""
        a0, a1, v, f = rgb_feat.shape
        if self.dnr_dims is not None:
            qn, dn, rn = self.dnr_dims
            assert (a0, a1) == (qn * dn, rn), (a0, a1, self.dnr_dims)
            nr = qn * rn
        else:
            nr, dn = a0, a1
        nd = self.neuray_in_dim
        params = self._pool_params(f, nd)
        dt = rgb_feat.dtype
        params = jax.tree.map(lambda x: x.astype(dt), params)

        def flat(t):
            return t.reshape(a0 * a1, v, t.shape[-1])

        geo, rgb_out, nvalid = pool_reference(
            flat(rgb_feat), flat(neuray_feat), flat(ray_diff), flat(mask),
            params, self.geometry_only)
        # keep the ray attention in the compute dtype (bf16 inference) —
        # forcing f32 here doubled the attention pass's HBM traffic
        if self.dnr_dims is not None:
            def to_ray_major(t):
                c = t.shape[-1]
                return jnp.swapaxes(t.reshape(qn, dn, rn, c), 1, 2) \
                    .reshape(nr, dn, c)
            geo = to_ray_major(geo).astype(dt)
            rgb_out = to_ray_major(rgb_out)
            num_valid_obs = to_ray_major(nvalid).astype(jnp.float32)
        else:
            geo = geo.reshape(nr, dn, 16).astype(dt)
            rgb_out = rgb_out.reshape(nr, dn, 3)
            num_valid_obs = nvalid.reshape(nr, dn, 1).astype(jnp.float32)

        pos = jnp.asarray(sinusoid_pos_encoding(dn, 16)).astype(dt)
        globalfeat = geo + pos[None]
        attn_mask = (num_valid_obs[..., 0] > 1).astype(dt)
        if not self.ablate_attention:
            globalfeat = MultiHeadAttention(
                name="ray_attention")(
                globalfeat, globalfeat, globalfeat,
                mask=attn_mask[..., None])
        sigma = _Seq((16, 1), final_act="relu",
                     name="out_geometry_fc")(globalfeat).astype(jnp.float32)
        sigma = jnp.where(num_valid_obs < 1, 0.0, sigma)
        return jnp.concatenate([rgb_out.astype(jnp.float32), sigma], axis=-1)


class DefaultAggregationNet(nn.Module):
    """prob-embed + dir-diff + IBRNetWithNeuRay (reference
    ``aggregate_net.py:16-89``)."""
    neuray_dim: int = 32
    in_feat_ch: int = 32
    n_samples: int = 64
    wo_geometry: bool = False
    wo_appearance: bool = False
    geometry_only: bool = False
    ablate_attention: bool = False   # measurement-only (see IBRNet field)

    @nn.compact
    def __call__(self, prj_dict: dict, que_dir: Array) -> tuple:
        """
        :param prj_dict: per-view projections, each (qn, rn, dn, rfn, .)
            — POINT-MAJOR: ``hit_prob``, ``vis``, ``rgb``, ``dir``,
            ``ray_feats``, ``img_feats``, optional ``mask``.  With
            ``prj_dict['layout'] == 'dnr'`` the tensors are depth-major
            (qn, dn, rn, rfn, .) and ``dir_diff`` must be present (the
            raw ``dir``/``que_dir`` fallback is ray-major only).
        :param que_dir: (qn, rn, dn, 3) query ray directions.
        :return: (density (qn, rn, dn), colors (qn, rn, dn, 3)).
        """
        hit_prob = (prj_dict["hit_prob"] - 0.5) * 2.0
        vis = (prj_dict["vis"] - 0.5) * 2.0
        dnr = prj_dict.get("layout") == "dnr"
        if dnr:
            assert "dir_diff" in prj_dict, \
                "'dnr' layout requires the precomputed dir_diff"
            qn, dn, rn, rfn, _ = hit_prob.shape
        else:
            qn, rn, dn, rfn, _ = hit_prob.shape

        nd_raw = prj_dict["ray_feats"].shape[-1]
        dt_ = hit_prob.dtype
        k0, b0 = _DenseParams(nd_raw + 2, self.neuray_dim,
                              name="prob_embed_0")()
        k1, b1 = _DenseParams(self.neuray_dim, self.neuray_dim,
                              name="prob_embed_1")()
        raw = jnp.concatenate([prj_dict["ray_feats"], hit_prob, vis],
                              axis=-1)
        e = nn.relu(raw @ k0.astype(dt_) + b0.astype(dt_))
        prob_embedding = e @ k1.astype(dt_) + b1.astype(dt_)
        if self.wo_geometry:
            prob_embedding = jnp.zeros_like(prob_embedding)

        # dir-diff feature (reference ``aggregate_net.py:8-14``) —
        # precomputed in the flat projection layout when available
        # (render_ops.project_points_dict with que_dir): the 5-dim
        # formulation here cost ~2.4 ms/chunk in minor-dim lane padding.
        if "dir_diff" in prj_dict:
            dir_diff = prj_dict["dir_diff"]
        else:
            dir_diff = prj_dict["dir"] - que_dir[..., None, :]
            dir_dot = jnp.sum(prj_dict["dir"] * que_dir[..., None, :],
                              axis=-1, keepdims=True)
            dir_diff = jnp.concatenate([dir_diff, dir_dot], axis=-1)

        if dnr:
            def to_rays(t):  # (qn, dn, rn, rfn, c) -> (qn*dn, rn, rfn, c)
                return t.reshape(qn * dn, rn, rfn, t.shape[-1])
        else:
            def to_rays(t):  # (qn, rn, dn, rfn, c) -> (qn*rn, dn, rfn, c)
                return t.reshape(qn * rn, dn, rfn, t.shape[-1])

        img_feats = jnp.concatenate([prj_dict["rgb"], prj_dict["img_feats"]],
                                    axis=-1)
        if self.wo_appearance:
            img_feats = jnp.zeros_like(img_feats)
        mask = prj_dict.get("mask")
        if mask is None:
            mask = jnp.ones((*hit_prob.shape[:-1], 1), img_feats.dtype)

        out = IBRNetWithNeuRay(self.neuray_dim, self.in_feat_ch, dn,
                               geometry_only=self.geometry_only,
                               ablate_attention=self.ablate_attention,
                               dnr_dims=(qn, dn, rn) if dnr else None,
                               name="agg_impl")(
            to_rays(img_feats), to_rays(prob_embedding), to_rays(dir_diff),
            to_rays(mask))
        colors = out[..., :3].reshape(qn, rn, dn, 3)
        density = out[..., 3].reshape(qn, rn, dn)
        return density, colors
