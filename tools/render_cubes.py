"""Render perspective cube faces of the query view + metrics.

Reference ``render_cubes.py`` (408 LoC) + ``eval_cubes.py``: instead of an
ERP pano, render the 6 90-deg cube faces of the query camera through the
spherical reference views, compare against GT cube faces resampled from
the GT pano.

Usage:
  python tools/render_cubes.py --num 1 --height 64 --width 128 --cpu
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--num", type=int, default=1)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--depth-height", type=int, default=128)
    ap.add_argument("--depth-width", type=int, default=256)
    ap.add_argument("--m3d-dist", type=float, default=0.5)
    ap.add_argument("--out", default="data/render_cubes_out")
    ap.add_argument("--shards", default=None,
                    help="render scenes from this shard dir; when the "
                         "shards carry *_cubes fields (imported reference "
                         "LMDB data) the stored cube faces/poses are the "
                         "GT and cameras (reference database.py:86-111)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from panogrf_tpu.core import cubemap
    from panogrf_tpu.data import imgs_info
    from panogrf_tpu.data.database import PanoDatabase
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_three_view_sample)
    from panogrf_tpu.nn.blocks import resize_linear
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.train import metrics as M

    H, W = args.height, args.width
    DH, DW = args.depth_height, args.depth_width
    fw = H // 2
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW))

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    # init params on one sample
    rng0 = np.random.default_rng(0)
    scene = SphereScene.random(77)
    s = make_three_view_sample(scene, H, W, args.m3d_dist, seed=0)
    coords8 = imgs_info.sample_train_coords(rng0, H, W, 8)
    data0 = imgs_info.build_render_sample(s, coords8)
    data0["ref_imgs_info"]["mvs_depth"] = resize_linear(
        s["depth_panos"][jnp.asarray(imgs_info.REF_IDS)], (DH, DW),
        axes=(1, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data0)
    if args.ckpt:
        from panogrf_tpu.train.trainer import load_checkpoint_params
        params = load_checkpoint_params(args.ckpt)

    # face pixel coords
    ys, xs = np.meshgrid(np.arange(fw), np.arange(fw), indexing="ij")
    face_coords = jnp.asarray(
        np.stack([xs, ys], -1).reshape(1, -1, 2), jnp.float32)

    @jax.jit
    def render_face(params, ref_data, w2c_face, K):
        out = model.apply(params, ref_data, face_coords,
                          data0["que_imgs_info"]["c2w"],
                          data0["que_imgs_info"]["depth_range"],
                          data0["ref_imgs_info"]["depth_range"],
                          perspec_cam=(w2c_face[None], K[None]),
                          method=NeuralRayGenRenderer.render_rays)
        key = ("pixel_colors_nr_fine" if "pixel_colors_nr_fine" in out
               else "pixel_colors_nr")
        return jnp.clip(out[key][0].reshape(fw, fw, 3), 0, 1)

    reader = None
    if args.shards:
        from panogrf_tpu.data.shards import ShardReader
        reader = ShardReader(args.shards)

    metrics_all = []
    num = min(args.num, len(reader)) if reader is not None else args.num
    for qi in range(num):
        if reader is not None:
            s = reader[qi]
        else:
            scene = SphereScene.random(8800 + qi)
            s = make_three_view_sample(scene, H, W, args.m3d_dist,
                                       seed=50 + qi)
        db = PanoDatabase("m3d", np.asarray(s["rgb_panos"]),
                          np.asarray(s["depth_panos"]),
                          np.asarray(s["rots"]), np.asarray(s["trans"]))
        data = imgs_info.build_render_sample(s, coords8)
        ref_info = data["ref_imgs_info"]
        ref_info["mvs_depth"] = resize_linear(
            s["depth_panos"][jnp.asarray(imgs_info.REF_IDS)], (DH, DW),
            axes=(1, 2))
        ref_data = model.apply(params, ref_info["imgs"],
                               ref_info["mvs_depth"],
                               method=NeuralRayGenRenderer.prepare_ref)
        ref_data["w2c"] = ref_info["w2c"]

        if "rgb_cubes" in s:
            # real imported data: stored faces are GT, stored per-face
            # poses are the cameras (reference database.py:86-111 — w2c is
            # the raw [rots_cubes | trans_cubes] stack; K from face width)
            from panogrf_tpu.data.database import cube_intrinsics
            q = imgs_info.QUE_ID
            gt_cube = jnp.asarray(s["rgb_cubes"][q])
            cw = gt_cube.shape[1]
            if cw != fw:
                raise SystemExit(
                    f"--height {H} implies face width {fw} but shards "
                    f"store {cw}; pass --height {cw * 2}")
            w2c_faces = np.concatenate(
                [s["rots_cubes"][q], s["trans_cubes"][q][..., None]],
                axis=-1).astype(np.float32)
            K = cube_intrinsics(cw)
        else:
            w2c_faces, K = db.cube_cameras(imgs_info.QUE_ID)
            gt_cube = cubemap.equi_to_cube(
                jnp.asarray(s["rgb_panos"][imgs_info.QUE_ID]), fw)
        for f in range(6):
            pred = render_face(params, ref_data,
                               jnp.asarray(w2c_faces[f]), jnp.asarray(K))
            m = M.render_metrics(pred, gt_cube[f])
            metrics_all.append({k: float(v) for k, v in m.items()})
            np.save(out_dir / f"{qi}-face{f}-pred.npy", np.asarray(pred))
        print(f"[{qi}] face psnr:",
              [round(m['psnr_nr'], 2) for m in metrics_all[-6:]])

    mean = {k: float(np.mean([m[k] for m in metrics_all]))
            for k in metrics_all[0]}
    (out_dir / "metric.txt").write_text(json.dumps(mean, indent=2))
    print("mean:", json.dumps(mean))


if __name__ == "__main__":
    main()
