"""Render a per-scene finetuned (ft) checkpoint to full panoramas.

Reference ``render.py:307-401`` (render_video_ft): load the ft checkpoint,
sniff the trainable ``ray_feats`` shape from it (``render.py:345-348``),
rebuild the scene, and render the held-out query view (eval) or an
interpolated camera path (inter), writing images + metric.txt.

Pairs with ``tools/train_ft.py`` (which saves ``data/model/<name>/
ft_latest``); the scene is reconstructed from the same ``--scene-seed``.

Usage:
  python tools/train_ft.py  --steps 200 --name ft_run --cpu
  python tools/render_ft.py --ckpt data/model/ft_run/ft_latest --cpu
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax dir saved by tools/train_ft.py")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--m3d-dist", type=float, default=0.5)
    ap.add_argument("--scene-seed", type=int, default=123,
                    help="must match the train_ft run")
    ap.add_argument("--pose-type", default="eval",
                    choices=["eval", "inter"])
    ap.add_argument("--inter-num", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--out", default="data/render_ft_out")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from panogrf_tpu.data import imgs_info
    from panogrf_tpu.data.synthetic import SphereScene, make_three_view_sample
    from panogrf_tpu.renderer import poses as P
    from panogrf_tpu.renderer.ft_renderer import NeuralRayFtRenderer
    from panogrf_tpu.train import metrics as M
    from render import save_image  # tools/render.py helper

    H, W = args.height, args.width
    ck = ocp.StandardCheckpointer()
    ft_params = ck.restore(Path(args.ckpt).absolute())
    # ray_feats shape is authoritative from the checkpoint (reference
    # sniffs it the same way, render.py:345-348)
    rf = ft_params["params"]["ray_feats"]
    rfn, fh, fw, fd = rf.shape
    print(f"ckpt ray_feats: {rf.shape}")

    ft = NeuralRayFtRenderer(rfn=rfn, ray_feats_hw=(fh, fw), feat_dim=fd,
                             height=H, width=W)

    scene = SphereScene.random(args.scene_seed)
    s = make_three_view_sample(scene, H, W, args.m3d_dist,
                               seed=args.scene_seed)
    data = imgs_info.build_render_sample(
        s, imgs_info.sample_train_coords(np.random.default_rng(0), H, W, 8))
    ref_info = data["ref_imgs_info"]
    qdr = data["que_imgs_info"]["depth_range"]

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def render_chunk(params, coords, c2w):
        out = ft.apply(params, {
            "ref_imgs_info": ref_info,
            "que_imgs_info": {"coords": coords, "c2w": c2w,
                              "depth_range": qdr}})
        return out["pixel_colors_nr_fine"
                   if "pixel_colors_nr_fine" in out else "pixel_colors_nr"]

    def render_image(c2w):
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        coords = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
        n = coords.shape[0]
        pad = (-n) % args.chunk
        coords = np.concatenate([coords, np.zeros((pad, 2), np.float32)])
        outs = []
        for i in range(coords.shape[0] // args.chunk):
            c = jnp.asarray(coords[i * args.chunk:(i + 1) * args.chunk][None])
            outs.append(render_chunk(ft_params, c, c2w))
        rgb = jnp.concatenate(outs, 1)[0][:n].reshape(H, W, 3)
        return jnp.clip(rgb, 0.0, 1.0)

    if args.pose_type == "inter":
        w2c_all = np.asarray(imgs_info.pose_w2c(s["rots"], s["trans"]))
        c2w_all = np.asarray(imgs_info.c2w_from_w2c(jnp.asarray(w2c_all)))
        path = P.prepare_render_info(c2w_all, "inter",
                                     inter_num=args.inter_num)
        for fi, c2w in enumerate(path):
            save_image(out_dir / f"frame{fi:03d}.png",
                       render_image(jnp.asarray(c2w)))
        print(f"wrote {len(path)} path frames to {out_dir}")
        return

    t0 = time.perf_counter()
    rgb = render_image(data["que_imgs_info"]["c2w"])
    jax.block_until_ready(rgb)
    dt = time.perf_counter() - t0
    gt = s["rgb_panos"][imgs_info.QUE_ID]
    m = {k: float(v) for k, v in M.render_metrics(rgb, gt).items()}
    m["sec_per_frame"] = dt
    save_image(out_dir / "que-nr_fine.png", rgb)
    save_image(out_dir / "que-gt.png", gt)
    (out_dir / "metric.txt").write_text(json.dumps(m, indent=2))
    print(json.dumps(m))


if __name__ == "__main__":
    main()
