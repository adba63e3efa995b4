"""Train the generalizable renderer (reference ``run_training.py``).

Usage:
  python tools/train_renderer.py --cfg configs/gen_synthetic_small.yaml \
      [--shards data/shards_train] [--steps 1000]

The frozen mono+MVS depth stack runs outside the optimized step; with
``--gt-depth`` (or no depth checkpoints configured) the GT depth from the
data stream stands in for MVS depth, which is the right setup for the
synthetic data path and for debugging (reference `debug` flag semantics).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--shards", default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--gt-depth", action="store_true", default=True)
    ap.add_argument("--pool", type=int, default=16,
                    help="procedural scene pool size (no-shards mode)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mv", type=int, default=0, metavar="V",
                    help="multi-view training with V>2 views (reference "
                         "run_training_mv.py protocol: refs = "
                         "range(V-1), query drawn from test_views)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from panogrf_tpu.config import load_config
    from panogrf_tpu.data import imgs_info
    from panogrf_tpu.data.shards import ShardReader
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_three_view_sample)
    from panogrf_tpu.nn.blocks import resize_linear
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.train.trainer import Trainer, TrainerConfig

    cfg = load_config(args.cfg)
    R = cfg.renderer
    H, W = R.height, R.width
    DH, DW = cfg.mvs.depth_height, cfg.mvs.depth_width

    model = NeuralRayGenRenderer(
        height=H, width=W, depth_hw=(DH, DW), min_depth=R.min_depth,
        max_depth=R.max_depth, mvs_min_depth=cfg.mvs.mvs_min_depth,
        mvs_max_depth=cfg.mvs.mvs_max_depth,
        depth_sample_num=R.depth_sample_num,
        fine_depth_sample_num=R.fine_depth_sample_num,
        use_hierarchical_sampling=R.use_hierarchical_sampling,
        use_disp=R.use_disp, use_self_hit_prob=R.use_self_hit_prob)

    rng = np.random.default_rng(cfg.train.seed)
    reader = ShardReader(args.shards) if args.shards else None

    # MV protocol (reference run_training_mv.py + get_database_split_mv):
    # V views, refs = range(reference_idx), query drawn from test_views.
    mv = args.mv or (cfg.data.seq_len if cfg.data.test_views else 0)
    if mv:
        # refs = range(reference_idx) per the config protocol; the bare
        # --mv flag (no test_views) keeps the V-1 fallback.
        n_ref = cfg.data.reference_idx if cfg.data.test_views else mv - 1
        ref_ids = list(range(n_ref))
        que_ids = list(cfg.data.test_views) or [mv - 1]
    else:
        ref_ids, que_ids = list(imgs_info.REF_IDS), [imgs_info.QUE_ID]

    # Without shards, pre-render a pool of procedural scenes once: per-step
    # eager scene ray-tracing costs seconds on this box (eager dispatch
    # ~4ms/op), so the pool keeps the TPU busy with training, not data gen.
    pool = []
    if reader is None:
        from panogrf_tpu.data.synthetic import make_multi_view_sample
        for i in range(args.pool):
            scene = SphereScene.random(int(rng.integers(1 << 30)))
            if mv:
                s = make_multi_view_sample(scene, H, W, mv,
                                           cfg.data.m3d_dist, seed=i)
            else:
                s = make_three_view_sample(scene, H, W, cfg.data.m3d_dist,
                                           seed=i)
            pool.append(jax.tree.map(jnp.asarray, s))

    def batches():
        i = 0
        while True:
            if reader is not None:
                s = {k: jnp.asarray(v) for k, v in
                     reader[int(rng.integers(len(reader)))].items()}
            else:
                s = pool[int(rng.integers(len(pool)))]
            coords = imgs_info.sample_train_coords(rng, H, W, 512)
            if mv:
                que = que_ids[int(rng.integers(len(que_ids)))]
                data = imgs_info.build_render_sample_mv(
                    s, coords, ref_ids, que, (R.min_depth, R.max_depth))
            else:
                data = imgs_info.build_render_sample(
                    s, coords, (R.min_depth, R.max_depth))
            d = s["depth_panos"][jnp.asarray(ref_ids)]
            data["ref_imgs_info"]["mvs_depth"] = resize_linear(
                d, (DH, DW), axes=(1, 2))
            data.pop("src_imgs_info", None)
            i += 1
            yield data

    stream = batches()
    first = next(stream)
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.train.seed), first)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"renderer params: {n_params/1e6:.2f}M")

    tc = TrainerConfig(
        name=cfg.train.name, total_step=args.steps or cfg.train.total_step,
        val_interval=cfg.train.val_interval,
        save_interval=cfg.train.save_interval, lr_type=cfg.train.lr_type,
        lr_cfg={"lr_init": cfg.train.lr_init,
                "decay_step": cfg.train.decay_step,
                "decay_rate": cfg.train.decay_rate},
        losses=tuple(l for l in cfg.train.loss
                     if l in ("render", "depth", "consistency")),
        seed=cfg.train.seed, save_dir=cfg.train.save_dir)

    def apply_fn(p, batch, rng_):
        return model.apply(p, batch, rng=rng_)

    # ValidationEvaluator (reference train/train_valid.py:10-120): fixed
    # val scenes, full-query-view render, psnr/ssim/ws-psnr; the trainer
    # keeps the best checkpoint by key_metric (psnr_nr_fine -> psnr_nr of
    # the fine pass here).
    from panogrf_tpu.data.synthetic import SphereScene as _S
    from panogrf_tpu.data.synthetic import make_three_view_sample as _mk
    from panogrf_tpu.renderer import full_render
    from panogrf_tpu.train import metrics as M
    val_scenes = []
    for vi in range(2):  # validate_num=2 like the reference ft cap
        if mv:
            from panogrf_tpu.data.synthetic import make_multi_view_sample
            s = make_multi_view_sample(_S.random(10_000 + vi), H, W, mv,
                                       cfg.data.m3d_dist, seed=10_000 + vi)
        else:
            s = _mk(_S.random(10_000 + vi), H, W, cfg.data.m3d_dist,
                    seed=10_000 + vi)
        val_scenes.append(s)

    def val_fn(params, step):
        import jax.numpy as jnp
        outs = {}
        vals = []
        for s in val_scenes:
            ref_info = imgs_info.build_imgs_info(
                s, ref_ids, (R.min_depth, R.max_depth))
            ref_info["mvs_depth"] = resize_linear(
                s["depth_panos"][jnp.asarray(ref_ids)],
                (DH, DW), axes=(1, 2))
            que_w2c = imgs_info.pose_w2c(s["rots"], s["trans"])[que_ids[0]]
            c2w = imgs_info.c2w_from_w2c(que_w2c[None])[0]
            out = full_render.render_image(
                model, params, ref_info, c2w,
                jnp.asarray([[R.min_depth, R.max_depth]]),
                chunk=min(8192, H * W))
            m = M.render_metrics(out["rgb"],
                                 s["rgb_panos"][que_ids[0]])
            vals.append({k: float(v) for k, v in m.items()})
        for k in vals[0]:
            outs[k] = float(np.mean([v[k] for v in vals]))
        return outs

    t0 = time.time()

    def log(step, m):
        print(f"step {step} ({time.time()-t0:.0f}s): "
              + " ".join(f"{k}={v:.4f}" for k, v in m.items()))

    trainer = Trainer(apply_fn, params, tc, val_fn=val_fn, log_fn=log)
    trainer.fit(stream, key_metric="psnr_nr")
    trainer.save("latest")
    print("done")


if __name__ == "__main__":
    main()
