"""Render & score mono / MVS depth for render poses.

Reference ``eval_depth_for_render.py`` (1263 LoC): runs the frozen depth
stack on the evaluation samples and reports the sin-weighted ERP metric
table for both mono and MVS predictions.

Usage:
  python tools/eval_depth.py --num 4 --height 128 --width 256 --cpu \
      [--mono-ckpt ...] [--mvs-ckpt ...]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=4)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--m3d-dist", type=float, default=1.0)
    ap.add_argument("--mono-ckpt", default=None)
    ap.add_argument("--mvs-ckpt", default=None)
    ap.add_argument("--min-depth", type=float, default=0.1)
    ap.add_argument("--max-depth", type=float, default=10.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from panogrf_tpu.core import cubemap
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_three_view_sample)
    from panogrf_tpu.models.mvs import MVSDepthModel
    from panogrf_tpu.models.unifuse import UniFuse, normalize_imagenet
    from panogrf_tpu.train import metrics as M

    H, W = args.height, args.width
    mono = UniFuse(max_depth=args.max_depth)
    mono_vars = jax.jit(mono.init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, H, W, 3)),
                                   jnp.zeros((1, 6, H // 2, H // 2, 3)))
    mvs = MVSDepthModel(min_depth=args.min_depth, max_depth=args.max_depth)
    mvs_vars = None

    import orbax.checkpoint as ocp
    if args.mono_ckpt:
        mono_vars = ocp.StandardCheckpointer().restore(
            Path(args.mono_ckpt).absolute(), mono_vars)

    mono_apply = jax.jit(lambda v, e, c: mono.apply(v, e, c))
    agg = {"mono": [], "mvs": []}
    for qi in range(args.num):
        s = make_three_view_sample(SphereScene.random(4000 + qi), H, W,
                                   args.m3d_dist, seed=200 + qi)
        gt = jnp.clip(s["depth_panos"][1], 0, args.max_depth)
        equi = normalize_imagenet(s["rgb_panos"][1][None])
        cube = jax.vmap(lambda e: cubemap.equi_to_cube(e, H // 2))(equi)
        mout = mono_apply(mono_vars, equi, cube)
        agg["mono"].append({k: float(v) for k, v in M.depth_metrics_erp(
            mout["pred_depth"][0], gt, args.min_depth,
            args.max_depth).items()})

        panos = jnp.stack([s["rgb_panos"][0], s["rgb_panos"][1]])[None]
        rots = jnp.stack([s["rots"][0], s["rots"][1]])[None]
        trans = jnp.stack([s["trans"][0], s["trans"][1]])[None]
        if mvs_vars is None:
            mvs_vars = jax.jit(mvs.init)(
                jax.random.PRNGKey(0), panos, rots, trans,
                mout["pred_depth"], mout["mono_feat"])
            if args.mvs_ckpt:
                mvs_vars = ocp.StandardCheckpointer().restore(
                    Path(args.mvs_ckpt).absolute(), mvs_vars)
            mvs_apply = jax.jit(lambda v, p, r, t, md, mf: mvs.apply(
                v, p, r, t, md, mf))
        out = mvs_apply(mvs_vars, panos, rots, trans, mout["pred_depth"],
                        mout["mono_feat"])
        agg["mvs"].append({k: float(v) for k, v in M.depth_metrics_erp(
            out["depth"][0], gt, args.min_depth, args.max_depth).items()})

    table = {net: {k: round(float(np.mean([m[k] for m in ms])), 4)
                   for k in ms[0]} for net, ms in agg.items()}
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
