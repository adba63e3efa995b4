"""Honest per-op timing on the tunnel TPU (chained iters + scalar fetch)."""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit_chain(make_step, init, iters=8):
    """Time f applied iters times sequentially (data-dependent chain)."""
    step = jax.jit(make_step)
    out = step(init)
    s = jax.jit(lambda o: sum(jnp.sum(x) for x in jax.tree.leaves(o)))
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
    from panogrf_tpu.core.sphere import M3D
    from panogrf_tpu.ops.resample import interpolate_feats
    from panogrf_tpu.renderer import render_ops as ro
    from panogrf_tpu.renderer.dist_decoder import MixtureLogisticsDistDecoder

    H, W = 512, 1024
    rfn, rn, dn = 2, 8192, 64
    N = rn * dn
    rng = np.random.default_rng(0)
    res = {}

    # --- gathers ---------------------------------------------------------
    imgs = jnp.asarray(rng.uniform(size=(rfn, H, W, 3)), jnp.float32)
    img_feats = jnp.asarray(rng.uniform(size=(rfn, 128, 256, 32)),
                            jnp.float32)
    ray_feats = jnp.asarray(rng.uniform(size=(rfn, 64, 128, 32)),
                            jnp.float32)
    pts0 = jnp.asarray(rng.uniform(0, 500, size=(rfn, N, 2)), jnp.float32)

    def g_imgs(pts):
        v = interpolate_feats(imgs, pts, H, W)
        return (pts + v[..., :2] * 1e-6) % 512

    def g_if(pts):
        v = interpolate_feats(img_feats, pts, H, W)
        return (pts + v[..., :2] * 1e-6) % 512

    def g_rf(pts):
        v = interpolate_feats(ray_feats, pts, H, W)
        return (pts + v[..., :2] * 1e-6) % 512

    res["gather_imgs_512x1024x3_ms"] = timeit_chain(g_imgs, pts0)
    res["gather_imgfeats_128x256x32_ms"] = timeit_chain(g_if, pts0)
    res["gather_rayfeats_64x128x32_ms"] = timeit_chain(g_rf, pts0)

    # --- dist decoder ------------------------------------------------------
    dec = MixtureLogisticsDistDecoder()
    feats0 = jnp.asarray(rng.normal(size=(rfn, 1, rn, dn, 32)) * 0.3,
                         jnp.float32)
    dvars = dec.init(jax.random.PRNGKey(0), feats0)

    def g_dec(feats):
        mean, var, vis, aw = dec.apply(dvars, feats)
        upd = (mean.sum(-1, keepdims=True) + var.sum(-1, keepdims=True)
               + aw)
        return feats + 1e-6 * upd

    res["dist_decoder_ms"] = timeit_chain(g_dec, feats0)

    # --- agg net -----------------------------------------------------------
    from panogrf_tpu.renderer.agg_net import DefaultAggregationNet
    agg = DefaultAggregationNet(n_samples=dn)
    prj = {
        "ray_feats": feats0,
        "rgb": feats0[..., :3],
        "img_feats": feats0,
        "dir": feats0[..., :3],
        "hit_prob": feats0[..., :1],
        "vis": feats0[..., :1],
        "alpha": feats0[..., :1],
    }
    que_dir = jnp.ones((1, rn, dn, 3))
    avars = agg.init(jax.random.PRNGKey(0), prj, que_dir)

    def g_agg(prj):
        density, colors = agg.apply(avars, prj, que_dir)
        upd = 1e-6 * density[None, ..., None]
        return {k: v + upd if v.shape[-1] == 1 else v
                for k, v in prj.items()}

    res["agg_net_ms"] = timeit_chain(g_agg, prj, iters=4)

    # --- projection math ----------------------------------------------------
    w2c = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1), (rfn, 3, 4))
    pts3 = jnp.asarray(rng.normal(size=(N, 3)) * 3, jnp.float32)

    def g_proj(pts3):
        cam = jnp.einsum("vij,pj->vpi", w2c[:, :, :3], pts3) \
            + w2c[:, None, :, 3]
        xy, d = M3D.project_to_pixels(cam, H, W)
        return pts3 + 1e-6 * jnp.mean(xy, 0)[..., :2].sum(-1, keepdims=True)

    res["projection_math_ms"] = timeit_chain(g_proj, pts3)

    # --- fine resampling (searchsorted) --------------------------------------
    depth0 = jnp.broadcast_to(jnp.linspace(0.5, 15, dn), (1, rn, dn))
    hit = jnp.asarray(rng.uniform(size=(1, rn, dn)), jnp.float32)
    drange = jnp.asarray([[0.5, 15.0]])

    def g_fine(d):
        f = ro.sample_fine_depth(d, hit, drange, dn, None)
        return jnp.sort(f, -1)

    res["sample_fine_depth_ms"] = timeit_chain(g_fine, depth0)

    res = {k: round(v, 2) for k, v in res.items()}
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
