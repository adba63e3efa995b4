"""Per-scene finetuning of the renderer (reference ``run_training.py`` with
``neuray_ft`` + ``train/ft_lr_common_manager.py``).

Initializes the ft renderer from a trained gen checkpoint (ray features
from the gen init net, MLP/encoder weights transplanted), then optimizes
per-scene with a smaller LR on transplanted weights and a larger LR on the
ray features (the reference's ``lr_diff`` split,
``train/trainer.py:251-259``), sampling the query view among the reference
views each step (``network/renderer.py:1123-1161``).

Usage:
  python tools/train_ft.py --gen-ckpt data/model/run/latest --steps 200 \
      --height 64 --width 128 --cpu
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None,
                    help="ft recipe yaml (configs/ft/..., mirrors the "
                         "reference configs/train/ft_hr_1.0 family); "
                         "explicitly given CLI flags win")
    ap.add_argument("--gen-ckpt", default=None)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--depth-height", type=int, default=128)
    ap.add_argument("--depth-width", type=int, default=256)
    ap.add_argument("--m3d-dist", type=float, default=0.5)
    ap.add_argument("--scene-seed", type=int, default=123)
    ap.add_argument("--rays", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr-ray-feats", type=float, default=1e-2)
    ap.add_argument("--depth-guided", action="store_true",
                    help="3-sigma depth-guided fine sampling from the "
                         "cached MVS depth (reference "
                         "depth_guided_ray_sampling)")
    ap.add_argument("--ft-fixed-sigma", type=float, default=None)
    ap.add_argument("--name", default="ft_run")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    if args.cfg:
        # recipe yaml supplies the defaults; explicitly given CLI flags win
        import sys as _sys
        from panogrf_tpu.config import load_config
        cfg = load_config(args.cfg)
        given = {a.split("=")[0].lstrip("-").replace("-", "_")
                 for a in _sys.argv[1:] if a.startswith("--")}
        for flag, val in [
                ("height", cfg.data.height), ("width", cfg.data.width),
                ("depth_height", cfg.mvs.depth_height),
                ("depth_width", cfg.mvs.depth_width),
                ("m3d_dist", cfg.data.m3d_dist),
                ("lr", cfg.train.lr_init),
                ("steps", cfg.train.total_step),
                ("name", cfg.train.name)]:
            if flag not in given:
                setattr(args, flag, val)

    from panogrf_tpu.data import imgs_info
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_three_view_sample)
    from panogrf_tpu.nn.blocks import resize_linear
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.renderer.ft_renderer import (NeuralRayFtRenderer,
                                                  init_ft_params_from_gen)
    from panogrf_tpu.train import metrics as M
    from panogrf_tpu.train.losses import render_loss, total_loss

    H, W = args.height, args.width
    DH, DW = args.depth_height, args.depth_width

    # --- scene (reference builds its test scene inline, renderer.py:827) --
    scene = SphereScene.random(args.scene_seed)
    s = make_three_view_sample(scene, H, W, args.m3d_dist,
                               seed=args.scene_seed)
    rng = np.random.default_rng(2022)
    coords = imgs_info.sample_train_coords(rng, H, W, args.rays)
    data = imgs_info.build_render_sample(s, coords)
    data["ref_imgs_info"]["mvs_depth"] = resize_linear(
        s["depth_panos"][jnp.asarray(imgs_info.REF_IDS)], (DH, DW),
        axes=(1, 2))

    gen = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW))
    gen_params = jax.jit(gen.init)(jax.random.PRNGKey(0), data)
    if args.gen_ckpt:
        from panogrf_tpu.train.trainer import load_checkpoint_params
        gen_params = load_checkpoint_params(args.gen_ckpt)
        print(f"restored gen checkpoint {args.gen_ckpt}")

    ft = NeuralRayFtRenderer(rfn=2, ray_feats_hw=(DH // 4, DW // 4),
                             height=H, width=W)
    ft_params, ft_cache = init_ft_params_from_gen(ft, gen, gen_params,
                                                  data["ref_imgs_info"],
                                                  jax.random.PRNGKey(1),
                                                  data)

    # --- lr_diff param groups (reference ft_lr_common_manager.py:15) ------
    def label(path, _):
        keys = [getattr(p, "key", None) for p in path]
        return "ray_feats" if "ray_feats" in keys else "net"

    tx = optax.multi_transform(
        {"ray_feats": optax.adam(args.lr_ray_feats),
         "net": optax.adam(args.lr)},
        jax.tree_util.tree_map_with_path(label, ft_params))
    opt_state = tx.init(ft_params)

    # --- per-step query-view sampling among refs (renderer.py:1123) -------
    w2c_all = imgs_info.pose_w2c(s["rots"], s["trans"])
    c2w_all = imgs_info.c2w_from_w2c(w2c_all)
    ref_ids = list(imgs_info.REF_IDS)

    from panogrf_tpu.renderer.ft_renderer import ft_depth_range_at_coords

    def make_batch(step_rng):
        i = int(jax.random.randint(step_rng, (), 0, len(ref_ids)))
        qid = ref_ids[i]
        d = {k: dict(v) for k, v in data.items() if k != "src_imgs_info"}
        d["que_imgs_info"]["c2w"] = c2w_all[qid]
        d["que_imgs_info"]["imgs"] = s["rgb_panos"][qid][None]
        xs = rng.integers(0, W, args.rays)
        ys = rng.integers(0, H, args.rays)
        coords_q = jnp.asarray(np.stack([xs, ys], -1)[None], jnp.float32)
        d["que_imgs_info"]["coords"] = coords_q
        if args.depth_guided:
            # i indexes ref_ids == the cached mvs_depth rows (refs order)
            d["que_imgs_info"]["ft_depth_range"] = ft_depth_range_at_coords(
                ft_cache, i, coords_q, H, W, args.ft_fixed_sigma)
        return d

    @jax.jit
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            out = ft.apply(p, batch, rng=key)
            return total_loss(render_loss(out, batch))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(2022)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        key, k1, k2 = jax.random.split(key, 3)
        batch = make_batch(k1)
        ft_params, opt_state, loss = train_step(ft_params, opt_state,
                                                batch, k2)
        if step % 20 == 0 or step == 1:
            print(f"step {step} ({time.time()-t0:.0f}s): "
                  f"loss={float(loss):.4f}")

    # --- validate on the held-out query view (view 1) ----------------------
    val = dict(data)
    out = ft.apply(ft_params, val)
    gt = np.asarray(out["pixel_colors_gt"])
    pr = np.asarray(out["pixel_colors_nr_fine"])
    mse = float(((gt - pr) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-9))
    print(f"val ray MSE vs held-out query view: {mse:.5f} (psnr {psnr:.2f})")

    import orbax.checkpoint as ocp
    path = (Path("data/model") / args.name / "ft_latest").absolute()
    ck = ocp.StandardCheckpointer()
    ck.save(path, ft_params, force=True)
    ck.wait_until_finished()
    print(f"saved {path}")


if __name__ == "__main__":
    main()
