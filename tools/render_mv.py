"""Multi-view (V>2) novel-view rendering + metrics.

Reference ``render_mv.py`` (425 LoC): render the query view from an
arbitrary number of reference panoramas (refs = all non-query views of a
V-view sample).

Usage:
  python tools/render_mv.py --views 5 --num 2 --height 128 --width 256 --cpu
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--que-idx", type=int, default=2,
                    help="query view index (middle by default)")
    ap.add_argument("--num", type=int, default=2)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--depth-height", type=int, default=128)
    ap.add_argument("--depth-width", type=int, default=256)
    ap.add_argument("--spacing", type=float, default=0.4)
    ap.add_argument("--out", default="data/render_mv_out")
    ap.add_argument("--chunk", type=int, default=2048,
                    help="ray chunk; rfn=3 at chunk 8192 trips a TPU "
                         "compiler register-allocation RET_CHECK bug")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from panogrf_tpu.data import imgs_info
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_multi_view_sample)
    from panogrf_tpu.nn.blocks import resize_linear
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.renderer import full_render
    from panogrf_tpu.train import metrics as M
    from tools.render import save_image

    H, W = args.height, args.width
    DH, DW = args.depth_height, args.depth_width
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW))
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    ref_ids = [i for i in range(args.views) if i != args.que_idx]
    rng = np.random.default_rng(0)
    coords8 = imgs_info.sample_train_coords(rng, H, W, 8)

    params = None
    all_m = []
    for qi in range(args.num):
        s = make_multi_view_sample(SphereScene.random(7000 + qi), H, W,
                                   args.views, args.spacing, seed=300 + qi)
        data = imgs_info.build_render_sample_mv(s, coords8, ref_ids,
                                                args.que_idx)
        ref_info = data["ref_imgs_info"]
        ref_info["mvs_depth"] = resize_linear(
            s["depth_panos"][jnp.asarray(ref_ids)], (DH, DW), axes=(1, 2))
        if params is None:
            params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
            if args.ckpt:
                from panogrf_tpu.train.trainer import load_checkpoint_params
                params = load_checkpoint_params(args.ckpt)
                print(f"restored {args.ckpt}")
        out = full_render.render_image(
            model, params, ref_info, data["que_imgs_info"]["c2w"],
            data["que_imgs_info"]["depth_range"],
            chunk=min(args.chunk, H * W))
        gt = s["rgb_panos"][args.que_idx]
        m = {k: float(v) for k, v in M.render_metrics(out["rgb"],
                                                      gt).items()}
        all_m.append(m)
        save_image(out_dir / f"{qi}-nr_fine.png", out["rgb"])
        save_image(out_dir / f"{qi}-gt.png", gt)
        print(f"[{qi}] refs={ref_ids} "
              + " ".join(f"{k}={v:.3f}" for k, v in m.items()))

    mean = {k: float(np.mean([m[k] for m in all_m])) for k in all_m[0]}
    (out_dir / "metric.txt").write_text(json.dumps(mean, indent=2))
    print("mean:", json.dumps(mean))


if __name__ == "__main__":
    main()
