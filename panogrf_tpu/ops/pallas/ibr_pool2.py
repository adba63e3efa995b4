"""Fused IBR pooled stage, v2: one row per SAMPLE, views in lane halves.

Why v1 (ibr_pool.py) ties/loses to XLA: it streams four 128-lane-padded
tensors per (sample, view) row and runs ~36 weight-padded (128, 128)
matmuls per block at ~5% MXU utilization — compute-bound on padding.

v2 exploits rfn = 2 (the shipped protocol, reference
``configs/train/gen_hr_1.0``): each kernel row is one SAMPLE with the
two views packed into 64-lane half-blocks, and every per-view matmul
becomes ONE matmul against a 2-view block-diagonal (128, 128) weight —
half the rows, ~2x the lane utilization, and independent heads share
matmuls (dir_fc + neuray_fc fused, etc.).  Cross-view reductions are
half-row arithmetic (no transposes).  16 matmuls per block vs v1's 36
on twice the rows.

Inputs (built by :func:`pack_inputs` from the (N, v, c) layout):
  XA (N, 128): [0:35 rgb_feat v0][64:99 rgb_feat v1]
  XB (N, 128): [0:32 neuray v0][33:37 ray_diff v0][37:38 mask v0]
               [64:96 neuray v1][97:101 ray_diff v1][101:102 mask v1]
  (ray_diff sits at lane 33 so the rgb-head input row
   [x 0:32 | vis 32 | ray_diff 33:37] needs no in-kernel lane shift.)
Output (N, 128): [0:16 geo][16:19 rgb][19 num_valid].

Embed-in-kernel mode (``embed=True``): lanes 0:32 carry the RAW gathered
ray features instead of the prob embedding, with the per-sample scaled
hit-prob at lane 38 and visibility at lane 39 per half; the two
prob-embedding Dense layers (reference ``aggregate_net.py:35-39``) run
INSIDE the kernel (2 extra block-diagonal matmuls), eliminating two
(N, v, 32) HBM round-trips per pass — the dominant agg cost is exactly
such 16x-lane-padded fusion-boundary tensors.

Numerics mirror :func:`ibr_pool.pool_reference` exactly (same math,
f32 accumulation); parity is tested in interpret mode and on TPU by
``tests/test_pallas.py::test_pool2_matches_reference``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128
HALF = 64
F = 35       # rgb(3) + img_feats(32)
ND = 32      # neuray/prob-embedding width


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _sig(x):
    return jax.nn.sigmoid(x)


def _dot(a, b):
    # Matmul operands stay in the WEIGHT dtype (= the caller's compute
    # dtype): on the serving bf16 path this keeps the MXU in its native
    # bf16 mode (~4x the f32 rate) while `preferred_element_type` keeps
    # f32 accumulation; with f32 weights (the parity tests) the cast is
    # a no-op and results are bit-identical to the f32 formulation.
    return jnp.dot(a.astype(b.dtype), b,
                   preferred_element_type=jnp.float32)


def _lane_mask(shape, lo, hi):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (lane >= lo) & (lane < hi)


def _kernel(geometry_only, embed, xa_ref, xb_ref,
            we0_k, we0_b, we1_k, we1_b,
            w1, b1, w2, b2, wg1, wg2, wd, wdn, bd, wbw2, bbw2,
            we1_, be1_, we2, be2, wf1, bf1, wf2, bf2,
            wgeo, bgeo, wgw2, bgw2, gs_row,
            wh1, bh1, wh2, bh2, wh3, bh3,
            out_ref):
    eps = 1e-8
    xa = xa_ref[:].astype(jnp.float32)              # (B, 128)
    xb = xb_ref[:].astype(jnp.float32)

    if embed:
        # prob-embedding in-kernel: raw ray feats at 0:32, hit at 38,
        # vis at 39 per half (weight rows placed accordingly by
        # build_weights) -> embedding at 0:32; other lanes pass through.
        e = _dot(xb, we0_k[:]) + we0_b[:]
        e = jnp.maximum(e, 0.0)
        e = _dot(e, we1_k[:]) + we1_b[:]
        emb_mask = _lane_mask(xb.shape, 0, 32) \
            | _lane_mask(xb.shape, HALF, HALF + 32)
        xb = jnp.where(emb_mask, e, xb)

    def halves(t):
        return t[:, :HALF], t[:, HALF:]

    m0 = xb[:, 37:38]                                # (B, 1)
    m1 = xb[:, 101:102]
    msum = m0 + m1 + eps
    wt0, wt1 = m0 / msum, m1 / msum

    # step 1+2: dir_fc (rdiff->16->35) and neuray_fc (nray->8->1) fused
    y1 = _elu(_dot(xb, w1[:]) + b1[:])               # [0:16 dirh|16:24 nh]/half
    y2 = _dot(y1, w2[:]) + b2[:]                     # [0:35 dirh2|35 w0logit]
    dirh2 = jnp.where(_lane_mask(y2.shape, 0, F)
                      | _lane_mask(y2.shape, HALF, HALF + F), _elu(y2), 0.0)
    rgbf = xa + dirh2                                # rgb_feat + dir features
    w0_0 = _sig(y2[:, F:F + 1]) * wt0                # (B, 1)
    w0_1 = _sig(y2[:, HALF + F:HALF + F + 1]) * wt1

    rf0, rf1 = halves(rgbf)
    mean0 = rf0 * w0_0 + rf1 * w0_1                  # (B, 64)
    var0 = (rf0 - mean0) ** 2 * w0_0 + (rf1 - mean0) ** 2 * w0_1
    mean1 = rf0 * wt0 + rf1 * wt1
    var1 = (rf0 - mean1) ** 2 * wt0 + (rf1 - mean1) ** 2 * wt1

    # step 4: globalfeat part of base_fc — both col-halves carry the same
    # values so the per-view step adds it in place
    gf = (_dot(jnp.concatenate([mean0, var0], 1), wg1[:])
          + _dot(jnp.concatenate([mean1, var1], 1), wg2[:]))

    # step 5/6: base_fc per view
    h = _elu(gf + _dot(rgbf, wd[:]) + _dot(xb, wdn[:]) + bd[:])
    x = _elu(_dot(h, wbw2[:]) + bbw2[:])             # [0:32 x]/half

    # step 7: vis_fc (+ residual)
    wt_b = jnp.concatenate([jnp.broadcast_to(wt0, (wt0.shape[0], HALF)),
                            jnp.broadcast_to(wt1, (wt1.shape[0], HALF))], 1)
    hv = _elu(_dot(x * wt_b, we1_[:]) + be1_[:])
    hv2 = _elu(_dot(hv, we2[:]) + be2[:])            # [0:32 x_res|32 vis]
    vis0 = _sig(hv2[:, 32:33]) * m0
    vis1 = _sig(hv2[:, HALF + 32:HALF + 33]) * m1
    x_res = jnp.where(_lane_mask(hv2.shape, 0, 32)
                      | _lane_mask(hv2.shape, HALF, HALF + 32), hv2, 0.0)
    x = x + x_res

    # step 8: vis_fc2
    vis_b = jnp.concatenate([jnp.broadcast_to(vis0, (vis0.shape[0], HALF)),
                             jnp.broadcast_to(vis1, (vis1.shape[0], HALF))],
                            1)
    h2 = _elu(_dot(x * vis_b, wf1[:]) + bf1[:])
    vl = _dot(h2, wf2[:]) + bf2[:]                   # [0 logit]/half
    vis0 = _sig(vl[:, 0:1]) * m0
    vis1 = _sig(vl[:, HALF:HALF + 1]) * m1

    # step 9: vis-weighted pooled stats
    vsum = vis0 + vis1 + eps
    wg0, wg1v = vis0 / vsum, vis1 / vsum
    x0, x1 = halves(x)
    mean = x0 * wg0 + x1 * wg1v                      # (B, 64), 0:32 real
    var = (x0 - mean) ** 2 * wg0 + (x1 - mean) ** 2 * wg1v
    wmean = (wg0 + wg1v) * 0.5

    # step 10: geometry_fc (per point)
    g = _elu(_dot(jnp.concatenate([mean, var], 1), wgeo[:])
             + wmean * gs_row[:] + bgeo[:])          # (B, 128), 0:64 real
    geo = _elu(_dot(g, wgw2[:]) + bgw2[:])           # 0:16 real

    nvalid = m0 + m1
    lane = jax.lax.broadcasted_iota(jnp.int32, geo.shape, 1)
    if geometry_only:
        # serving coarse pass discards blended RGB (only density feeds the
        # fine pass) — skip the rgb_fc head; bit-exact for the fine image
        out = jnp.where(lane < 16, geo, 0.0)
        out = out + jnp.pad(nvalid, ((0, 0), (19, LANES - 20)))
        out_ref[:] = out.astype(out_ref.dtype)
        return

    # step 11: rgb blend head — rin = [x 0:32 | vis 32 | rdiff 33:37]/half
    rdm = _lane_mask(xb.shape, 33, 37) | _lane_mask(xb.shape, 97, 101)
    rin = jnp.where(_lane_mask(x.shape, 0, 32)
                    | _lane_mask(x.shape, HALF, HALF + 32), x, 0.0)
    visf_b = jnp.concatenate(
        [jnp.broadcast_to(vis0, (vis0.shape[0], HALF)),
         jnp.broadcast_to(vis1, (vis1.shape[0], HALF))], 1)
    rin = rin + visf_b * _lane_mask(x.shape, 32, 33).astype(jnp.float32) \
        + visf_b * _lane_mask(x.shape, HALF + 32, HALF + 33).astype(
            jnp.float32)
    rin = rin + jnp.where(rdm, xb, 0.0)      # rdiff already at 33:37
    hh = _elu(_dot(rin, wh1[:]) + bh1[:])
    hh = _elu(_dot(hh, wh2[:]) + bh2[:])
    hl = _dot(hh, wh3[:]) + bh3[:]                   # [0 logit]/half
    l0 = jnp.where(m0 == 0, -1e9, hl[:, 0:1])
    l1 = jnp.where(m1 == 0, -1e9, hl[:, HALF:HALF + 1])
    mx = jnp.maximum(l0, l1)
    e0 = jnp.exp(l0 - mx)
    e1 = jnp.exp(l1 - mx)
    esum = e0 + e1 + 1e-20
    rgb = xa[:, 0:3] * (e0 / esum) + xa[:, HALF:HALF + 3] * (e1 / esum)

    out = jnp.where(lane < 16, geo, 0.0)
    out = out + jnp.pad(rgb, ((0, 0), (16, LANES - 19)))
    out = out + jnp.pad(nvalid, ((0, 0), (19, LANES - 20)))
    out_ref[:] = out.astype(out_ref.dtype)


def _block2(w, r0, c0):
    """Place w at [r0, c0] and [64+r0, 64+c0] of a (128, 128) matrix."""
    r, c = w.shape
    out = jnp.zeros((LANES, LANES), w.dtype)
    out = out.at[r0:r0 + r, c0:c0 + c].set(w)
    out = out.at[HALF + r0:HALF + r0 + r, HALF + c0:HALF + c0 + c].set(w)
    return out


def _brow2(b, c0):
    """Bias row with b at lanes [c0:] of both halves."""
    out = jnp.zeros((1, LANES), b.dtype)
    out = out.at[0, c0:c0 + b.shape[0]].set(b)
    out = out.at[0, HALF + c0:HALF + c0 + b.shape[0]].set(b)
    return out


def _dup_cols(w, r0):
    """Per-point weight (rows at r0 in BOTH halves' input lanes, columns
    duplicated into both halves so per-view consumers read in place)."""
    r, c = w.shape
    out = jnp.zeros((LANES, LANES), w.dtype)
    out = out.at[r0:r0 + r, 0:c].set(w)
    out = out.at[r0:r0 + r, HALF:HALF + c].set(w)
    return out


def pack_inputs(rgb_feat: Array, neuray_feat: Array, ray_diff: Array,
                mask: Array) -> tuple:
    """(N, 2, c) tensors -> (XA, XB) packed rows (see module docstring).

    ``neuray_feat`` is either the 32-ch prob embedding, or — in
    embed-in-kernel mode — the raw 34-ch [ray_feats | hit | vis] block,
    whose hit/vis land at lanes 38/39 per half.
    """
    n = rgb_feat.shape[0]
    dt = rgb_feat.dtype

    def half(i):
        zero = jnp.zeros((n, 1), dt)                 # lane 32 spacer so
        nf = neuray_feat[:, i]
        parts = [nf[:, :32], zero,                   # rdiff lands at 33:37
                 ray_diff[:, i].astype(dt), mask[:, i].astype(dt)]
        if nf.shape[-1] == ND + 2:                   # raw [rf | hit | vis]
            parts.append(nf[:, 32:34])               # hit 38, vis 39
        row = jnp.concatenate(parts, axis=-1)        # (N, 38 or 40)
        return jnp.pad(row, ((0, 0), (0, HALF - row.shape[-1])))

    xb = jnp.concatenate([half(0), half(1)], axis=-1)
    pad_a = HALF - rgb_feat.shape[-1]
    xa = jnp.concatenate(
        [jnp.pad(rgb_feat[:, 0], ((0, 0), (0, pad_a))),
         jnp.pad(rgb_feat[:, 1], ((0, 0), (0, pad_a)))], axis=-1)
    return xa, xb


def build_weights(params: dict, dtype=jnp.float32) -> list:
    """Assemble the packed (128, 128) weight set from the agg-net
    parameter tree (same tree as ibr_pool / pool_reference).

    When ``params['prob_embed']`` is present (embed-in-kernel mode, keys
    k0/b0/k1/b1 of the two prob-embedding Dense layers), its weights are
    packed first — input rows rf 0:32 + hit 38 + vis 39 per half; zero
    placeholders otherwise so the kernel signature is fixed."""
    p = {k: {kk: vv.astype(dtype) for kk, vv in v.items()}
         for k, v in params.items() if k != "prob_embed"}
    f, nd = F, ND

    if "prob_embed" in params:
        pe = {k: v.astype(dtype) for k, v in params["prob_embed"].items()}
        we0_k = (_block2(pe["k0"][:ND], 0, 0)
                 + _block2(pe["k0"][ND:ND + 1], 38, 0)
                 + _block2(pe["k0"][ND + 1:ND + 2], 39, 0))
        we0_b = _brow2(pe["b0"], 0)
        we1_k = _block2(pe["k1"], 0, 0)
        we1_b = _brow2(pe["b1"], 0)
    else:
        we0_k = we1_k = jnp.zeros((LANES, LANES), dtype)
        we0_b = we1_b = jnp.zeros((1, LANES), dtype)
    embed_ws = [we0_k, we0_b, we1_k, we1_b]

    def g(name, i):
        return p[name][f"w{i}"], p[name][f"b{i}"]

    dw1, db1 = g("ray_dir_fc", 0)
    dw2, db2 = g("ray_dir_fc", 1)
    nw1, nb1 = g("neuray_fc", 0)
    nw2, nb2 = g("neuray_fc", 1)
    bw1, bb1 = g("base_fc", 0)
    bw2, bb2 = g("base_fc", 1)
    vw1, vb1 = g("vis_fc", 0)
    vw2, vb2 = g("vis_fc", 1)
    v2w1, v2b1 = g("vis_fc2", 0)
    v2w2, v2b2 = g("vis_fc2", 1)
    gw1, gb1 = g("geometry_fc", 0)
    gw2, gb2 = g("geometry_fc", 1)
    rw1, rb1 = g("rgb_fc", 0)
    rw2, rb2 = g("rgb_fc", 1)
    rw3, rb3 = g("rgb_fc", 2)

    # W1: XB -> [dirh1 0:16 | nh 16:24] per half (rdiff rows at 33:37)
    w1 = (_block2(dw1, 33, 0) + _block2(nw1, 0, 16))
    b1 = _brow2(jnp.concatenate([db1, nb1]), 0)
    # W2: y1 -> [dirh2 0:35 | w0logit 35] per half
    w2 = (_block2(dw2, 0, 0) + _block2(nw2, 16, F))
    b2 = _brow2(jnp.concatenate([db2, nb2]), 0)
    # base_fc w1 rows: 4 segments of f (globalfeat), then rgb f, then nd
    segs = [bw1[i * f:(i + 1) * f] for i in range(4)]
    base_wr = bw1[4 * f:5 * f]
    base_wn = bw1[5 * f:5 * f + nd]
    # gf via two per-point matmuls: [mean0|var0] and [mean1|var1]
    wg1 = (jnp.zeros((LANES, LANES), dtype)
           .at[0:f, 0:64].set(segs[0]).at[HALF:HALF + f, 0:64].set(segs[1])
           .at[0:f, HALF:HALF + 64].set(segs[0])
           .at[HALF:HALF + f, HALF:HALF + 64].set(segs[1]))
    wg2 = (jnp.zeros((LANES, LANES), dtype)
           .at[0:f, 0:64].set(segs[2]).at[HALF:HALF + f, 0:64].set(segs[3])
           .at[0:f, HALF:HALF + 64].set(segs[2])
           .at[HALF:HALF + f, HALF:HALF + 64].set(segs[3]))
    wd = _block2(base_wr, 0, 0)
    wdn = _block2(base_wn, 0, 0)
    bd = _brow2(bb1, 0)
    wbw2 = _block2(bw2, 0, 0)
    bbw2 = _brow2(bb2, 0)
    we1 = _block2(vw1, 0, 0)
    be1 = _brow2(vb1, 0)
    we2 = _block2(vw2, 0, 0)
    be2 = _brow2(vb2, 0)
    wf1 = _block2(v2w1, 0, 0)
    bf1 = _brow2(v2b1, 0)
    wf2 = _block2(v2w2, 0, 0)
    bf2 = _brow2(v2b2, 0)
    # geometry_fc rows: mean 32 | var 32 | wmean 1; mean at lanes 0:32,
    # var at 64:96 of the concat row; per-point -> plain (no half dup of
    # columns needed, outputs 0:64)
    xd = bw2.shape[1]
    wgeo = (jnp.zeros((LANES, LANES), dtype)
            .at[0:xd, 0:64].set(gw1[:xd])
            .at[HALF:HALF + xd, 0:64].set(gw1[xd:2 * xd]))
    gs_row = jnp.zeros((1, LANES), dtype).at[0, 0:64].set(
        gw1[2 * xd])
    bgeo = jnp.zeros((1, LANES), dtype).at[0, 0:64].set(gb1)
    wgw2 = jnp.zeros((LANES, LANES), dtype).at[0:64, 0:16].set(gw2)
    bgw2 = jnp.zeros((1, LANES), dtype).at[0, 0:16].set(gb2)
    # rgb_fc w1 rows: x 32 | vis 1 | ray_diff 4 -> rin lanes 0:37/half
    wh1 = _block2(rw1, 0, 0)
    bh1 = _brow2(rb1, 0)
    wh2 = _block2(rw2, 0, 0)
    bh2 = _brow2(rb2, 0)
    wh3 = _block2(rw3, 0, 0)
    bh3 = _brow2(rb3, 0)
    return [*embed_ws,
            w1, b1, w2, b2, wg1, wg2, wd, wdn, bd, wbw2, bbw2,
            we1, be1, we2, be2, wf1, bf1, wf2, bf2,
            wgeo, bgeo, wgw2, bgw2, gs_row,
            wh1, bh1, wh2, bh2, wh3, bh3]


def ibr_pool2(rgb_feat: Array, neuray_feat: Array, ray_diff: Array,
              mask: Array, params: dict, block_rows: int = 1024,
              interpret: bool = False, geometry_only: bool = False) -> tuple:
    """v2 fused pooled stage (rfn = 2 only).

    Same contract as :func:`ibr_pool.pool_reference`: inputs (N, 2, c),
    returns (geo (N, 16), rgb (N, 3), nvalid (N, 1)) in float32.
    ``geometry_only`` skips the rgb head (rgb returned as zeros).
    """
    n, v, f = rgb_feat.shape
    embed = "prob_embed" in params
    nd_in = ND + 2 if embed else ND
    assert v == 2 and f == F and neuray_feat.shape[-1] == nd_in, (
        v, f, neuray_feat.shape, embed)
    xa, xb = pack_inputs(rgb_feat, neuray_feat, ray_diff, mask)
    n_p = (n + block_rows - 1) // block_rows * block_rows
    xa = jnp.pad(xa, ((0, n_p - n), (0, 0)))
    xb = jnp.pad(xb, ((0, n_p - n), (0, 0)))
    # weights in the caller's compute dtype — bf16 weights put the
    # kernel's matmuls in the MXU's fast bf16 mode (see _dot)
    weights = build_weights(params, dtype=rgb_feat.dtype)

    def big(arr):
        return pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    wspec = [pl.BlockSpec(w.shape, lambda i, s=w.shape: (0,) * len(s),
                          memory_space=pltpu.VMEM) for w in weights]
    # coarse (geometry_only) output feeds the bf16 ray attention, so emit
    # it in the compute dtype — halves this pass's dominant output
    # traffic.  The fine pass keeps f32 (its rgb is the final image).
    out_dt = rgb_feat.dtype if geometry_only else jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel, geometry_only, embed),
        grid=(n_p // block_rows,),
        in_specs=[big(xa), big(xb), *wspec],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, LANES), out_dt),
        interpret=interpret,
    )(xa, xb, *weights)
    out = out[:n]
    return out[:, :16], out[:, 16:19], out[:, 19:20]
