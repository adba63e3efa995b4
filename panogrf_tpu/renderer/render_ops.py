"""Ray sampling, projection and compositing ops for the renderer.

Reference ``network/render_ops.py`` re-designed for TPU: everything is a
batched, statically-shaped expression (no per-ray Python loops); the
projection/gather tensor layout (rfn, qn, rn, dn, .) matches the reference
so the aggregation net is drop-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from panogrf_tpu.core.sphere import SphereConvention
from panogrf_tpu.ops.resample import interpolate_feats

Array = jax.Array


# ---------------------------------------------------------------------------
# depth sampling (reference render_ops.py:292-339)
# ---------------------------------------------------------------------------

def sample_depth(qn: int, rn: int, dn: int, near: float, far: float,
                 use_disp: bool, rng: jax.Array | None = None) -> tuple:
    """Stratified uniform (in depth or disparity) sample depths.

    :return: (que_depth (qn, rn, dn), que_dists (qn, rn, dn)).
    """
    assert dn > 2
    if use_disp:
        lo, hi = 1.0 / near, 1.0 / far
    else:
        lo, hi = near, far
    interval = (hi - lo) / (dn - 1)
    val = jnp.arange(1, dn - 1, dtype=jnp.float32)[None, None]
    if rng is not None:
        val = val + (jax.random.uniform(rng, (qn, rn, dn - 2)) - 0.5) * 0.999
    else:
        val = jnp.broadcast_to(val, (qn, rn, dn - 2))
    ticks = jnp.concatenate(
        [jnp.zeros((qn, rn, 1)), interval * val,
         jnp.full((qn, rn, 1), hi - lo)], axis=-1)
    if use_disp:
        depth = 1.0 / (1.0 / near + ticks)
    else:
        depth = near + ticks
    dists = jnp.concatenate(
        [depth[..., 1:], jnp.full((qn, rn, 1), 1e6)], axis=-1) - depth
    return depth, dists


def depth2inv_dists(depth: Array, depth_range: Array) -> Array:
    """Sample intervals in normalized inverse-depth space (reference
    ``render_ops.py:110-122``)."""
    near = -1.0 / depth_range[:, 0][:, None, None]
    far = -1.0 / depth_range[:, 1][:, None, None]
    d = (-1.0 / depth - near) / (far - near)
    dists = jnp.concatenate(
        [d[..., 1:] - d[..., :-1],
         jnp.full((*d.shape[:-1], 1), 1e6, d.dtype)], axis=-1)
    return dists


def sample_fine_depth(depth: Array, hit_prob: Array, depth_range: Array,
                      fdn: int, rng: jax.Array | None,
                      inv_mode: bool = True) -> Array:
    """Hierarchical CDF inverse sampling (reference render_ops.py:413-473).

    :param depth: (qn, rn, dn) coarse sample depths (sorted).
    :param hit_prob: (qn, rn, dn) coarse hit probabilities.
    :return: (qn, rn, fdn) fine depths.
    """
    if inv_mode:
        near = -1.0 / depth_range[0, 0]
        far = -1.0 / depth_range[0, 1]
        depth = (-1.0 / depth - near) / (far - near)

    center = (depth[..., 1:] + depth[..., :-1]) / 2.0
    bins = jnp.concatenate([depth[..., :1], center, depth[..., -1:]], axis=-1)

    pdf = hit_prob + 1e-5
    pdf = pdf / jnp.sum(pdf, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if rng is None:
        u = (jnp.arange(fdn, dtype=jnp.float32) + 0.5) / fdn
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], fdn))
    else:
        u = jax.random.uniform(rng, (*cdf.shape[:-1], fdn))

    # Inverse-CDF by summation instead of searchsorted+take_along_axis:
    # F^-1(u) = bins[0] + sum_j (bins[j+1]-bins[j]) * clip((u-cdf[j]) /
    # (cdf[j+1]-cdf[j]), 0, 1).  Mathematically identical for a sorted CDF
    # (each fully-passed bin contributes its full width, the straddled bin
    # its linear fraction) but lowers to one fused elementwise+reduce on
    # TPU — measured 5.98 ms -> ~0.3 ms per 2048x64 chunk versus the
    # gather-based formulation (take_along_axis lowers to 4 small gathers).
    bin_w = bins[..., 1:] - bins[..., :-1]               # (.., dn)
    cdf0 = cdf[..., :-1]
    dcdf = jnp.maximum(cdf[..., 1:] - cdf[..., :-1], 1e-10)
    t = (u[..., :, None] - cdf0[..., None, :]) / dcdf[..., None, :]
    fine = bins[..., :1] + jnp.sum(bin_w[..., None, :]
                                   * jnp.clip(t, 0.0, 1.0), axis=-1)

    if inv_mode:
        fine = fine * (far - near) + near
        fine = -1.0 / fine
    return fine


# ---------------------------------------------------------------------------
# points / projection
# ---------------------------------------------------------------------------

def gather_at_coords(grid: Array, coords: Array) -> Array:
    """Index an (H, W, C) grid at integer pixel coords (qn, rn, 2)."""
    ix = coords[..., 0].astype(jnp.int32)
    iy = coords[..., 1].astype(jnp.int32)
    return grid[iy, ix]


def coords2rays_perspective(coords: Array, w2c: Array, K: Array) -> tuple:
    """Pixel coords -> perspective camera rays in world frame.

    Reference ``render_ops.py:37-60`` (coords2rays): centers = -R^T t,
    directions = R^T K^-1 [u, v, 1] - center... expressed directly here.
    :param coords: (qn, rn, 2); w2c (qn, 3, 4); K (qn, 3, 3).
    :return: (centers (qn, rn, 3), directions (qn, rn, 3) unnormalized).
    """
    rot = w2c[:, :, :3]
    trans = w2c[:, :, 3]
    centers = -jnp.einsum("qji,qj->qi", rot, trans)      # (qn, 3)
    ones = jnp.ones((*coords.shape[:-1], 1), coords.dtype)
    hom = jnp.concatenate([coords, ones], axis=-1)       # (qn, rn, 3)
    k_inv = jnp.linalg.inv(K)
    cam = jnp.einsum("qij,qrj->qri", k_inv, hom)
    dirs = jnp.einsum("qji,qrj->qri", rot, cam)
    centers = jnp.broadcast_to(centers[:, None], dirs.shape)
    return centers, dirs


def depth2points_perspective(coords: Array, que_depth: Array, w2c: Array,
                             K: Array) -> tuple:
    """Perspective analogue of depth2points_spherical (reference
    ``render_ops.py:62-74``): points at ray-parameter ``que_depth``.

    :return: (que_pts (qn, rn, dn, 3), que_dir (qn, rn, dn, 3) negated
        unit directions).
    """
    centers, dirs = coords2rays_perspective(coords, w2c, K)
    pts = centers[:, :, None] + dirs[:, :, None] * que_depth[..., None]
    que_dir = -dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    que_dir = jnp.broadcast_to(que_dir[:, :, None], pts.shape)
    return pts, que_dir


def gather_at_coords_batched(grids: Array, coords: Array) -> Array:
    """Index (B, H, W, C) grids at integer coords (B, N, 2) -> (B, N, C)."""
    return jax.vmap(gather_at_coords)(grids, coords)


def depth2points_spherical(coords: Array, que_depth: Array, c2w: Array,
                           directions: Array) -> tuple:
    """Sample points along spherical rays (reference render_ops.py:76-106).

    :param coords: (qn, rn, 2) integer pixel coords in the query image.
    :param que_depth: (qn, rn, dn).
    :param c2w: (3, 4) query camera-to-world.
    :param directions: (H, W, 3) precomputed unit directions.
    :return: (que_pts (qn, rn, dn, 3) world, que_dir (qn, rn, dn, 3) —
        NEGATED unit ray directions like the reference).
    """
    dirs_cam = gather_at_coords(directions, coords)          # (qn, rn, 3)
    rot, trans = c2w[:3, :3], c2w[:3, 3]
    dirs_w = jnp.einsum("ij,qrj->qri", rot, dirs_cam)
    pts = trans + dirs_w[:, :, None] * que_depth[..., None]
    que_dir = -dirs_w / jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)
    que_dir = jnp.broadcast_to(que_dir[:, :, None], pts.shape)
    return pts, que_dir


def project_points_dict(ref_data: dict, que_pts: Array,
                        convention: SphereConvention,
                        que_dir: Array | None = None,
                        depth_major: bool = False,
                        gather_stride: int = 1,
                        gather_nearest: bool = False) -> dict:
    """Project query points into every reference ERP view and gather.

    Reference ``render_ops.py:234-257`` — but in POINT-MAJOR layout:
    everything comes out (qn, rn, dn, rfn, c).  The reference's
    (rfn, qn, rn, dn, .) layout forces the aggregation net to transpose
    ~1M-row tensors per pass, which dominated the TPU cost; here the
    multiview gather (``interpolate_feats_pointmajor``) emits point-major
    natively and only the small index/geometry arrays get transposed.

    ``depth_major`` reorders the gather ROWS to (dn, rn): consecutive rows
    are then adjacent ERP rays at the SAME depth index, whose projections
    sit ~1 px apart — near-sequential HBM access — instead of consecutive
    samples of one ray, which walk the whole epipolar curve.  TPU gathers
    are DRAM-locality-bound, so row order is a first-class lever.
    Outputs then STAY in the (qn, dn, rn, rfn, c) layout, marked by
    ``out["layout"] == "dnr"`` — the per-point decode/prob/pool math is
    layout-blind, so only the 16-ch pooled features get transposed to
    ray-major for the ray attention (inside the agg net) instead of ~90
    channels of rows here.  Numerics identical either way (measured: the
    r4 stage ablations put these output transposes inside the 678 ms
    non-agg non-gather frame cost).

    Dead outputs are not materialized: ``pts`` has no consumers, and
    ``dir`` is only emitted when ``que_dir`` is None (otherwise the
    fused ``dir_diff`` is what the aggregation consumes).

    ``ref_data`` keys (channel-last): ``imgs`` (rfn, H, W, 3), ``w2c``
    (rfn, 3, 4), ``ray_feats`` (rfn, fh, fw, F), ``img_feats``.
    """
    from panogrf_tpu.ops.resample import interpolate_feats_pointmajor
    qn, rn, dn, _ = que_pts.shape
    rfn, h, w, _ = ref_data["imgs"].shape
    if depth_major:
        que_pts = jnp.swapaxes(que_pts, 1, 2)                 # (qn, dn, rn, 3)
        if que_dir is not None:
            que_dir = jnp.swapaxes(que_dir, 1, 2)
    pts = que_pts.reshape(-1, 3)                              # (pn, 3)

    w2c = ref_data["w2c"]                                     # (rfn, 3, 4)
    cam = (jnp.einsum("vij,pj->pvi", w2c[:, :, :3], pts)
           + w2c[None, :, :, 3])                              # (pn, rfn, 3)
    # At gather stride s only every s-th sample's PIXEL coords are
    # consumed (the rows in between are lerped) — so run the
    # transcendental part of the projection (atan2/acos/mod) on the
    # strided subset only, inside the stride branch below.  The spherical
    # "depth" is needed for ALL samples but is just the camera-frame
    # norm (bit-identical to project_to_pixels' radius channel).
    stride_geom = "merged_full" in ref_data and gather_stride > 1
    if stride_geom:
        prj_xy = None
        prj_depth = jnp.linalg.norm(cam, axis=-1)             # (pn, rfn)
    else:
        prj_xy, prj_depth = convention.project_to_pixels(cam, h, w)

    # view directions: from point towards the ref camera (negated unit),
    # reference ``render_ops.py:195-209``.
    cam_pos = -jnp.einsum("vji,vj->vi", w2c[:, :, :3], w2c[:, :, 3])
    d = pts[:, None] - cam_pos[None]                          # (pn, rfn, 3)
    prj_dir = -d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                               1e-5)
    prj_dir_diff = None
    if que_dir is not None:
        # dir-diff feature (reference ``aggregate_net.py:8-14``) computed
        # HERE in the flat (pn, rfn, 3) layout: doing it later on the
        # (qn, rn, dn, rfn, 3) tensors cost ~2.4 ms/chunk in minor-dim
        # lane padding (measured); here it fuses with the prj_dir math.
        cdt = que_dir.dtype
        qd = que_dir.reshape(-1, 1, 3).astype(cdt)
        pd = prj_dir.astype(cdt)
        dot = jnp.sum(pd * qd, axis=-1, keepdims=True)
        prj_dir_diff = jnp.concatenate([pd - qd, dot], axis=-1)

    xy_vm = None if stride_geom else jnp.swapaxes(prj_xy, 0, 1)
    if "merged_full" in ref_data:
        # fast_gather: ONE row fetch per (sample, view) from the full-res
        # [rgb | ray_feats | img_feats] map (renderer.prepare_ref).
        nd = ref_data["ray_feats"].shape[-1]
        if gather_stride > 1:
            # Epipolar feature interpolation: consecutive depth samples of
            # a ray project ~2-3 px apart along a smooth epipolar curve, so
            # fetch map rows only at every S-th sample and linearly
            # interpolate the fetched rows for the samples in between.
            # Geometry (depth / dir / dir_diff) stays EXACT for all dn
            # samples — only the gathered appearance/feature rows are
            # approximated.  Gather rows (the measured per-frame floor,
            # ~17 ns/row regardless of slice) drop by ~S×.
            # Implemented with static slices + one fused lerp ONLY — a
            # take/gather formulation here would re-materialise pn rows
            # and give the row reduction straight back.
            s = gather_stride
            ax = 1 if depth_major else 2
            kk = -(-dn // s)                         # ceil(dn / s)
            shp = ((qn, dn, rn) if depth_major else (qn, rn, dn))
            cam5 = cam.reshape(*shp, rfn, 3)
            sl = [slice(None)] * 5
            sl[ax] = slice(0, dn, s)
            # project ONLY the fetched samples (same values as slicing a
            # full-resolution projection — elementwise op)
            xy_sub, _ = convention.project_to_pixels(cam5[tuple(sl)], h, w)
            xy_sub_vm = jnp.moveaxis(xy_sub.reshape(-1, rfn, 2), 1, 0)
            g = interpolate_feats_pointmajor(
                ref_data["merged_full"], xy_sub_vm, h, w,
                nearest=gather_nearest)
            c = g.shape[-1]
            gshp = ((qn, kk, rn) if depth_major else (qn, rn, kk))
            g = g.reshape(*gshp, rfn, c)
            one = [slice(None)] * 5
            one[ax] = slice(1, None)
            last = [slice(None)] * 5
            last[ax] = slice(-1, None)
            g_r = jnp.concatenate([g[tuple(one)], g[tuple(last)]], axis=ax)
            # lerp g -> g_r at offsets o/s, o = 0..s-1 (the trailing
            # partial group extrapolates its left row — farthest samples)
            wshape = [1] * 6
            wshape[ax + 1] = s
            wts = (jnp.arange(s, dtype=jnp.float32) / s).reshape(wshape) \
                .astype(g.dtype)
            ge = jnp.expand_dims(g, ax + 1)
            gre = jnp.expand_dims(g_r, ax + 1)
            full = ge * (1 - wts) + gre * wts        # (.., kk, s, ..)
            fshp = list(gshp)
            fshp[ax] = kk * s
            full = full.reshape(*fshp, rfn, c)
            crop = [slice(None)] * 5
            crop[ax] = slice(0, dn)
            allf = full[tuple(crop)].reshape(-1, rfn, c)
        else:
            allf = interpolate_feats_pointmajor(ref_data["merged_full"],
                                                xy_vm, h, w,
                                                nearest=gather_nearest)
        ni = ref_data["img_feats"].shape[-1]
        prj_rgb = allf[..., :3]
        prj_ray_feats = allf[..., 3:3 + nd]
        prj_img_feats = allf[..., 3 + nd:3 + nd + ni]

        def rs(t):
            if depth_major:
                return t.reshape(qn, dn, rn, rfn, -1)   # 'dnr' layout
            return t.reshape(qn, rn, dn, rfn, -1)

        out = {
            "depth": rs(prj_depth[..., None]),
            "ray_feats": rs(prj_ray_feats),
            "rgb": rs(prj_rgb),
            "img_feats": rs(prj_img_feats),
        }
        if depth_major:
            out["layout"] = "dnr"
        if allf.shape[-1] > 3 + nd + ni:
            # decode-on-map stats channels riding the same gather row
            # (renderer.prepare_ref appends them; the renderer splits
            # coarse/fine halves)
            out["stats"] = rs(allf[..., 3 + nd + ni:])
        if prj_dir_diff is not None:
            out["dir_diff"] = rs(prj_dir_diff)
        else:
            out["dir"] = rs(prj_dir)
        return out
    prj_rgb = interpolate_feats_pointmajor(ref_data["imgs"], xy_vm, h, w)
    if "merged_feats" in ref_data:
        nd = ref_data["ray_feats"].shape[-1]
        merged = interpolate_feats_pointmajor(
            ref_data["merged_feats"], xy_vm, h, w)
        prj_ray_feats = merged[..., :nd]
        prj_img_feats = merged[..., nd:]
    else:
        prj_ray_feats = interpolate_feats_pointmajor(
            ref_data["ray_feats"], xy_vm, h, w)
        prj_img_feats = interpolate_feats_pointmajor(
            ref_data["img_feats"], xy_vm, h, w)

    def rs(t):
        if depth_major:
            return t.reshape(qn, dn, rn, rfn, -1)       # 'dnr' layout
        return t.reshape(qn, rn, dn, rfn, -1)

    out = {
        "depth": rs(prj_depth[..., None]),
        "ray_feats": rs(prj_ray_feats),
        "rgb": rs(prj_rgb),
        "img_feats": rs(prj_img_feats),
    }
    if depth_major:
        out["layout"] = "dnr"
    if prj_dir_diff is not None:
        out["dir_diff"] = rs(prj_dir_diff)
    else:
        out["dir"] = rs(prj_dir)
    return out


def project_stats(ref_data: dict, que_pts: Array,
                  convention: SphereConvention) -> dict:
    """Light projection for the coarse proxy pass: geometry plus ONE small
    gather of the precomputed dist-decoder statistics map.

    ``ref_data['stats_coarse']`` is the coarse decoder's (mean2, var2, aw
    [, vis]) evaluated once per scene on the ray-feature MAP
    (``renderer.prepare_ref``), so the per-sample work collapses to a
    5/6-channel gather + the logistic CDF — no MLPs, no image/feature
    fetch.  Shapes mirror :func:`project_points_dict` (point-major).
    """
    from panogrf_tpu.ops.resample import interpolate_feats_pointmajor
    qn, rn, dn, _ = que_pts.shape
    rfn, h, w, _ = ref_data["imgs"].shape
    pts = que_pts.reshape(-1, 3)
    w2c = ref_data["w2c"]
    cam = (jnp.einsum("vij,pj->pvi", w2c[:, :, :3], pts)
           + w2c[None, :, :, 3])
    prj_xy, prj_depth = convention.project_to_pixels(cam, h, w)
    xy_vm = jnp.swapaxes(prj_xy, 0, 1)
    stats = interpolate_feats_pointmajor(ref_data["stats_coarse"], xy_vm,
                                         h, w)

    def rs(t):
        return t.reshape(qn, rn, dn, rfn, -1)

    return {"depth": rs(prj_depth[..., None]), "stats": rs(stats)}


# ---------------------------------------------------------------------------
# compositing
# ---------------------------------------------------------------------------

def alpha_values2hit_prob(alpha: Array) -> Array:
    """alpha (qn, rn, dn) -> hit prob via transmittance cumprod
    (reference ``render_ops.py:145-153``)."""
    no_hit = jnp.concatenate(
        [jnp.ones((*alpha.shape[:-1], 1), alpha.dtype),
         1.0 - alpha + 1e-10], axis=-1)
    return alpha * jnp.cumprod(no_hit, axis=-1)[..., :-1]


def density2outputs(density: Array, colors: Array, que_depth: Array) -> dict:
    """density (qn,rn,dn), colors (qn,rn,dn,3) -> composited outputs."""
    alpha = 1.0 - jnp.exp(-jax.nn.relu(density))
    hit_prob = alpha_values2hit_prob(alpha)
    pixel_colors = jnp.sum(hit_prob[..., None] * colors, axis=2)
    render_depth = jnp.sum(hit_prob * que_depth, axis=-1)
    return {"hit_prob": hit_prob, "pixel_colors": pixel_colors,
            "render_depth": render_depth}


def merge_composites(depth_a: Array, colors_a: Array, density_a: Array,
                     depth_b: Array, colors_b: Array,
                     density_b: Array) -> tuple:
    """Merge two independently-rendered sample sets along one ray and
    re-composite (reference ``merge_uniform_diner``,
    ``network/renderer.py:526-565``): the union of the per-sample
    (depth, color, density) triples is sorted by depth and alpha-composited
    as one ray.  Valid only when both passes ran the SAME decoder/agg
    (the reference's ``one_mlp`` condition), so densities are comparable.

    :param depth_*: (qn, rn, dn); colors_*: (qn, rn, dn, 3).
    :return: (que_depth, colors, density, composited-outputs dict) for the
        sorted union (dn = dn_a + dn_b).
    """
    z = jnp.concatenate([depth_a, depth_b], axis=-1)
    colors = jnp.concatenate([colors_a, colors_b], axis=-2)
    density = jnp.concatenate([density_a, density_b], axis=-1)
    order = jnp.argsort(z, axis=-1)
    z = jnp.take_along_axis(z, order, axis=-1)
    density = jnp.take_along_axis(density, order, axis=-1)
    colors = jnp.take_along_axis(colors, order[..., None], axis=-2)
    return z, colors, density, density2outputs(density, colors, z)
