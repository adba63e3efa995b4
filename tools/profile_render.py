"""Component timing for the 512x1024 render path on the current device.

Times each stage of the per-ray pipeline in isolation so kernel work
targets the real bottleneck. Prints a JSON dict of milliseconds.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000.0


def main():
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.renderer import render_ops as ro
    from panogrf_tpu.core.sphere import M3D
    from panogrf_tpu.ops.resample import interpolate_feats

    H, W, DH, DW = 512, 1024, 256, 512
    rfn, rn, dn = 2, 8192, 64
    rng = np.random.default_rng(0)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW))
    ref_info = {
        "imgs": jnp.asarray(rng.uniform(size=(rfn, H, W, 3)), jnp.float32),
        "mvs_depth": jnp.asarray(
            rng.uniform(1, 6, size=(rfn, DH, DW, 1)), jnp.float32),
        "depth_range": jnp.asarray([[0.5, 15.0]] * rfn),
        "w2c": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
            (rfn, 3, 4)).at[1, 2, 3].set(1.0),
    }
    coords = jnp.stack(
        [jnp.asarray(rng.integers(0, W, (1, rn)), jnp.float32),
         jnp.asarray(rng.integers(0, H, (1, rn)), jnp.float32)], -1)
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {"coords": coords[:, :8],
                              "c2w": jnp.concatenate(
                                  [jnp.eye(3),
                                   jnp.asarray([[0.], [0.], [.5]])], 1),
                              "depth_range": jnp.asarray([[0.5, 15.0]])}}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)

    results = {}

    # 1. scene encoding
    prep = jax.jit(lambda p, i, d: model.apply(
        p, i, d, method=NeuralRayGenRenderer.prepare_ref))
    results["prepare_ref_ms"] = timeit(prep, params, ref_info["imgs"],
                                       ref_info["mvs_depth"])
    ref_data = prep(params, ref_info["imgs"], ref_info["mvs_depth"])
    ref_data["w2c"] = ref_info["w2c"]

    # 2. full chunk render (coarse+fine)
    rr = jax.jit(lambda p, rd, c: model.apply(
        p, rd, c, data["que_imgs_info"]["c2w"],
        data["que_imgs_info"]["depth_range"], ref_info["depth_range"],
        method=NeuralRayGenRenderer.render_rays))
    results["render_8192rays_ms"] = timeit(rr, params, ref_data, coords)

    # 3. projection+gather alone
    c2w = data["que_imgs_info"]["c2w"]
    directions = M3D.ray_directions(H, W)

    @jax.jit
    def proj_only(rd, c):
        qd, _ = ro.sample_depth(1, rn, dn, 0.5, 15.0, True)
        pts, _ = ro.depth2points_spherical(c, qd, c2w, directions)
        prj = ro.project_points_dict(rd, pts, M3D)
        return prj["ray_feats"]
    results["project_gather_ms"] = timeit(proj_only, ref_data, coords)

    # 4. aggregation net alone (fabricated inputs)
    prj = {
        "ray_feats": jnp.ones((rfn, 1, rn, dn, 32)),
        "rgb": jnp.ones((rfn, 1, rn, dn, 3)),
        "img_feats": jnp.ones((rfn, 1, rn, dn, 32)),
        "dir": jnp.ones((rfn, 1, rn, dn, 3)),
        "hit_prob": jnp.ones((rfn, 1, rn, dn, 1)),
        "vis": jnp.ones((rfn, 1, rn, dn, 1)),
        "alpha": jnp.ones((rfn, 1, rn, dn, 1)),
    }
    que_dir = jnp.ones((1, rn, dn, 3))
    agg = jax.jit(lambda p, pr, qd: model.apply(
        p, pr, qd, method=lambda m, pr, qd: m.agg_net(pr, qd)))
    results["agg_net_ms"] = timeit(agg, params, prj, que_dir)

    # 5. dist decoder alone
    dd = jax.jit(lambda p, f: model.apply(
        p, f, method=lambda m, f: m.dist_decoder(f)))
    results["dist_decoder_ms"] = timeit(
        dd, params, jnp.ones((rfn, 1, rn, dn, 32)))

    # 6. raw gather cost: 3 feature maps x rfn x rn x dn points
    pts = jnp.asarray(rng.uniform(0, 500, size=(rfn, rn * dn, 2)),
                      jnp.float32)

    @jax.jit
    def gathers(rd, pts):
        a = interpolate_feats(rd["ray_feats"], pts, H, W)
        b = interpolate_feats(rd["imgs"], pts, H, W)
        c = interpolate_feats(rd["img_feats"], pts, H, W)
        return a.sum() + b.sum() + c.sum()
    results["raw_gathers_ms"] = timeit(gathers, ref_data, pts)

    results = {k: round(v, 3) for k, v in results.items()}
    results["device"] = str(jax.devices()[0])
    est = results["render_8192rays_ms"] * (H * W / rn)
    results["est_frame_ms_from_chunks"] = round(est, 1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
