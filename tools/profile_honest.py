"""Honest per-op timing on the tunnel TPU (chained iters + scalar fetch).

Breaks the per-chunk render pass into stages with realistic shapes
(point-major layout, matching ``renderer.render_by_depth``) and times each
via a data-dependent chain so the tunnel's no-op ``block_until_ready``
cannot lie.  Run with ``--chunk N`` to match a bench chunk size.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit_chain(make_step, init, iters=8, name=None):
    """Time f applied iters times sequentially (data-dependent chain)."""
    if name:
        print(f"[stage] {name} ...", flush=True)
    step = jax.jit(make_step)
    out = step(init)
    s = jax.jit(lambda o: sum(jnp.sum(x.astype(jnp.float32))
                              for x in jax.tree.leaves(o)))
    _ = float(s(out))  # warm
    t0 = time.perf_counter()
    o = init
    for _ in range(iters):
        o = step(o)
    _ = float(s(o))
    dt = time.perf_counter() - t0
    # subtract RTT
    t0 = time.perf_counter()
    _ = float(s(init))
    rtt = time.perf_counter() - t0
    return max(dt - rtt, 0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default="",
                    help="comma-separated stage substrings to run")
    ap.add_argument("--fast-gather", action="store_true")
    ap.add_argument("--serving", action="store_true",
                    help="coarse pass at the serving operating point "
                         "(fast_gather + depth-major + stride 4 + "
                         "decode-on-map)")
    args = ap.parse_args()
    if args.serving:
        args.fast_gather = True
    only = [s for s in args.only.split(",") if s]

    def want(name):
        return not only or any(s in name for s in only)

    from panogrf_tpu.core.sphere import M3D
    from panogrf_tpu.ops.resample import (interpolate_feats,
                                          interpolate_feats_pointmajor)
    from panogrf_tpu.renderer import render_ops as ro
    from panogrf_tpu.renderer.dist_decoder import (
        MixtureLogisticsDistDecoder, compute_prob)

    H, W = 512, 1024
    rfn, rn, dn = 2, args.chunk, 64
    N = rn * dn
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    res = {"chunk": rn, "dtype": args.dtype}

    # --- gathers (point-major, like project_points_dict) -------------------
    imgs = jnp.asarray(rng.uniform(size=(rfn, H, W, 3)), dt)
    merged = jnp.asarray(rng.uniform(size=(rfn, 128, 256, 64)), dt)
    pts0 = jnp.asarray(rng.uniform(0, 500, size=(rfn, N, 2)), jnp.float32)

    def g_imgs(pts):
        v = interpolate_feats_pointmajor(imgs, pts, H, W)
        return (pts + v[..., :2].astype(jnp.float32).swapaxes(0, 1)
                * 1e-6) % 512

    def g_merged(pts):
        v = interpolate_feats_pointmajor(merged, pts, H, W)
        return (pts + v[..., :2].astype(jnp.float32).swapaxes(0, 1)
                * 1e-6) % 512

    if want("gather"):
        res["gather_imgs_512x1024x3_ms"] = timeit_chain(g_imgs, pts0, name="gather_imgs_512x1024x3_ms")
        res["gather_merged_128x256x64_ms"] = timeit_chain(g_merged, pts0, name="gather_merged_128x256x64_ms")

    # --- dist decoder (point-major (1, rn, dn, rfn, 32)) -------------------
    dec = MixtureLogisticsDistDecoder()
    feats0 = jnp.asarray(rng.normal(size=(1, rn, dn, rfn, 32)) * 0.3, dt)
    dvars = dec.init(jax.random.PRNGKey(0), feats0)

    def g_dec(feats):
        mean, var, vis, aw = dec.apply(dvars, feats)
        upd = (mean.sum(-1, keepdims=True) + var.sum(-1, keepdims=True)
               + aw)
        return feats + (1e-6 * upd).astype(feats.dtype)

    if want("dist_decoder"):
        res["dist_decoder_ms"] = timeit_chain(g_dec, feats0, name="dist_decoder_ms")

    # --- compute_prob -------------------------------------------------------
    near0 = jnp.asarray(rng.uniform(0, 1, size=(1, rn, dn, rfn)), jnp.float32)
    mean0 = jnp.asarray(rng.uniform(0, 1, size=(1, rn, dn, rfn, 2)),
                        jnp.float32)

    def g_prob(near):
        alpha, vis, hit = compute_prob(near, near + 0.01, mean0,
                                       mean0 + 0.5, None, mean0[..., :1],
                                       False)
        return near + 1e-6 * hit

    if want("compute_prob"):
        res["compute_prob_ms"] = timeit_chain(g_prob, near0, name="compute_prob_ms")

    # --- agg net (point-major) ----------------------------------------------
    from panogrf_tpu.renderer.agg_net import DefaultAggregationNet
    agg = DefaultAggregationNet(n_samples=dn)
    prj = {
        "ray_feats": feats0,
        "rgb": feats0[..., :3],
        "img_feats": feats0,
        "dir": feats0[..., :3].astype(jnp.float32),
        "hit_prob": feats0[..., :1],
        "vis": feats0[..., :1],
        "alpha": feats0[..., :1],
    }
    que_dir = jnp.ones((1, rn, dn, 3), dt)
    avars = agg.init(jax.random.PRNGKey(0), prj, que_dir)

    def g_agg(prj):
        density, colors = agg.apply(avars, prj, que_dir)
        upd = (1e-6 * density[..., None, None]).astype(dt)
        return {k: v + upd.astype(v.dtype) if v.shape[-1] == 1 else v
                for k, v in prj.items()}

    if want("agg"):
        res["agg_net_ms"] = timeit_chain(g_agg, prj, iters=4, name="agg_net_ms")

    if want("attn"):
        # ray attention + sigma head in isolation (the post-pool part of
        # IBRNetWithNeuRay): input (nr, dn, 16) pooled geometry features
        from panogrf_tpu.renderer.agg_net import (MultiHeadAttention, _Seq,
                                                  sinusoid_pos_encoding)
        import flax.linen as fnn

        class _AttnTail(fnn.Module):
            @fnn.compact
            def __call__(self, geo):
                pos = jnp.asarray(sinusoid_pos_encoding(dn, 16)).astype(
                    geo.dtype)
                x = geo + pos[None]
                g = MultiHeadAttention(name="ray_attention")(x, x, x)
                return _Seq((16, 1), final_act="relu",
                            name="out_geometry_fc")(g)

        tail = _AttnTail()
        geo0 = jnp.asarray(rng.normal(size=(rn, dn, 16)) * 0.3, dt)
        tvars = tail.init(jax.random.PRNGKey(0), geo0)

        def g_attn(geo):
            s = tail.apply(tvars, geo)
            return geo + (1e-6 * s).astype(geo.dtype)

        res["attn_tail_ms"] = timeit_chain(g_attn, geo0, iters=8,
                                           name="attn_tail_ms")

    if want("pool"):
        # pooled stage in isolation (the XLA chain; the Pallas pool
        # kernels were measured — isolated win, whole-frame loss — and
        # culled, see agg_net.pool_reference docstring)
        from panogrf_tpu.renderer.agg_net import pool_reference
        n = rn * dn
        prng = np.random.default_rng(1)
        pool_params = {}
        pshapes = {"ray_dir_fc": [(4, 16), (16, 35)],
                   "neuray_fc": [(32, 8), (8, 1)],
                   "base_fc": [(4 * 35 + 35 + 32, 64), (64, 32)],
                   "vis_fc": [(32, 32), (32, 33)],
                   "vis_fc2": [(32, 32), (32, 1)],
                   "geometry_fc": [(65, 64), (64, 16)],
                   "rgb_fc": [(37, 16), (16, 8), (8, 1)]}
        for nm, dims in pshapes.items():
            pool_params[nm] = {}
            for i, (a, b) in enumerate(dims):
                pool_params[nm][f"w{i}"] = jnp.asarray(
                    prng.normal(0, 0.2, (a, b)), dt)
                pool_params[nm][f"b{i}"] = jnp.asarray(
                    prng.normal(0, 0.1, (b,)), dt)
        rgbf0 = jnp.asarray(prng.normal(size=(n, 2, 35)), dt)
        nray0 = jnp.asarray(prng.normal(size=(n, 2, 32)), dt)
        rdif0 = jnp.asarray(prng.normal(size=(n, 2, 4)), dt)
        mask0 = jnp.ones((n, 2, 1), dt)

        def g_pool(rgbf):
            geo, rgb, nv = pool_reference(rgbf, nray0, rdif0, mask0,
                                          pool_params)
            upd = geo[..., :1] + rgb[..., :1]
            return rgbf + (1e-6 * upd[:, None]).astype(rgbf.dtype)

        res["pool_xla_ms"] = timeit_chain(g_pool, rgbf0, iters=4,
                                          name="pool_xla_ms")

    # --- projection math ----------------------------------------------------
    w2c = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1), (rfn, 3, 4))
    pts3 = jnp.asarray(rng.normal(size=(N, 3)) * 3, jnp.float32)

    def g_proj(pts3):
        cam = jnp.einsum("vij,pj->pvi", w2c[:, :, :3], pts3) \
            + w2c[None, :, :, 3]
        xy, d = M3D.project_to_pixels(cam, H, W)
        return pts3 + 1e-6 * jnp.mean(xy, 1)[..., :2].sum(-1, keepdims=True)

    if want("projection"):
        res["projection_math_ms"] = timeit_chain(g_proj, pts3, name="projection_math_ms")

    # --- fine resampling (searchsorted) --------------------------------------
    depth0 = jnp.broadcast_to(jnp.linspace(0.5, 15, dn), (1, rn, dn))
    hit = jnp.asarray(rng.uniform(size=(1, rn, dn)), jnp.float32)
    drange = jnp.asarray([[0.5, 15.0]])

    def g_fine(d):
        f = ro.sample_fine_depth(d, hit, drange, dn, None)
        return jnp.sort(f, -1)

    if want("fine"):
        res["sample_fine_depth_ms"] = timeit_chain(g_fine, depth0, name="sample_fine_depth_ms")

    # --- one full coarse render_by_depth pass -------------------------------
    if not want("coarse"):
        res["device"] = str(jax.devices()[0])
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v) for k, v in res.items()}, indent=1))
        return
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    model = NeuralRayGenRenderer(height=H, width=W,
                                 compute_dtype=args.dtype,
                                 fast_gather=args.fast_gather,
                                 gather_depth_major=args.serving,
                                 gather_stride=4 if args.serving else 1,
                                 decode_on_map=args.serving,
                                 use_hierarchical_sampling=False)
    ref_info = {
        "imgs": jnp.asarray(rng.uniform(size=(rfn, H, W, 3)), jnp.float32),
        "mvs_depth": jnp.asarray(
            rng.uniform(1.0, 6.0, size=(rfn, 256, 512, 1)), jnp.float32),
        "depth_range": jnp.asarray([[0.5, 15.0]] * rfn),
        "w2c": w2c,
    }
    coords0 = jnp.stack(
        [jnp.asarray(rng.integers(0, W, (1, rn)), jnp.float32),
         jnp.asarray(rng.integers(0, H, (1, rn)), jnp.float32)], -1)
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {
                "coords": coords0,
                "c2w": jnp.concatenate(
                    [jnp.eye(3), jnp.asarray([[0.], [0.], [0.5]])], 1),
                "depth_range": jnp.asarray([[0.5, 15.0]]),
            }}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)

    from panogrf_tpu.renderer import full_render
    ref_data = full_render.prepare_ref_data(model, params, ref_info)
    qdr = data["que_imgs_info"]["depth_range"]
    c2w = data["que_imgs_info"]["c2w"]

    def g_pass(coords):
        out = model.apply(params, ref_data, coords, c2w, qdr,
                          ref_info["depth_range"],
                          method=NeuralRayGenRenderer.render_rays)
        key = ("pixel_colors_nr_fine" if "pixel_colors_nr_fine" in out
               else "pixel_colors_nr")
        return (coords + 1e-6 * out[key][..., :2]) % 128

    res["coarse_pass_ms"] = timeit_chain(g_pass, coords0, iters=4, name="coarse_pass_ms")
    n_chunks = H * W // rn
    res["coarse_pass_frame_equiv_s"] = round(
        res["coarse_pass_ms"] * n_chunks / 1000.0, 2)

    res = {k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in res.items()}
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
