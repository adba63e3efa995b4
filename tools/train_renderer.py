"""Train the generalizable renderer (reference ``run_training.py``).

Usage:
  python tools/train_renderer.py --cfg configs/gen_synthetic_small.yaml \
      [--shards data/shards_train] [--steps 1000]

The frozen mono+MVS depth stack runs outside the optimized step.  With
``--depth-source stack`` (implied by ``--mono-ckpt``/``--mvs-ckpt``/
``--wo-stereo``) every reference view's depth comes from the composed
mono->MVS predictions — the reference's real training setup
(``init_net.py:233-336``), no GT depth consumed.  The default for the
synthetic/debug path substitutes GT depth (reference `debug` semantics).
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
    ap.add_argument("--depth-source", default=None,
                    choices=["gt", "stack"],
                    help="where ref mvs_depth comes from: 'gt' (debug / "
                         "synthetic default) or 'stack' (frozen mono+MVS "
                         "predictions — the reference's real training "
                         "setup; implied by --mono-ckpt/--mvs-ckpt)")
    ap.add_argument("--mono-ckpt", default=None)
    ap.add_argument("--mvs-ckpt", default=None)
    ap.add_argument("--wo-stereo", action="store_true")
    ap.add_argument("--pool", type=int, default=16,
                    help="procedural scene pool size (no-shards mode)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="data-parallel-over-rays training on an N-device "
                         "('data','ray') mesh: params replicated, the 512 "
                         "query rays of each step sharded across N "
                         "devices, gradient psum over ICI (SURVEY §2.8; "
                         "with --cpu this uses N virtual CPU devices)")
    ap.add_argument("--mv", type=int, default=0, metavar="V",
                    help="multi-view training with V>2 views (reference "
                         "run_training_mv.py protocol: refs = "
                         "range(V-1), query drawn from test_views)")
    ap.add_argument("--count-jitter", default="",
                    help="comma list of FINE sample counts (e.g. "
                         "'64,64,48,32'; duplicates weight the per-step "
                         "draw): train ONE ckpt with the fine count drawn "
                         "per step so every listed count stays usable at "
                         "serve time (tools/render.py --fine-samples). "
                         "Counts are otherwise train-time knobs — a "
                         "64-trained ckpt collapses at any other count "
                         "(AB_QUALITY_r5 serving_f48); the weighted "
                         "jitter ckpt at f32 beat the dedicated "
                         "native-32 ckpt by +0.47 dB (jitter_w rows)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        if args.mesh:
            jax.config.update("jax_num_cpu_devices", args.mesh)
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

    model_kw = dict(
        height=H, width=W, depth_hw=(DH, DW), min_depth=R.min_depth,
        max_depth=R.max_depth, mvs_min_depth=cfg.mvs.mvs_min_depth,
        mvs_max_depth=cfg.mvs.mvs_max_depth,
        depth_sample_num=R.depth_sample_num,
        fine_depth_sample_num=R.fine_depth_sample_num,
        use_hierarchical_sampling=R.use_hierarchical_sampling,
        use_disp=R.use_disp, use_self_hit_prob=R.use_self_hit_prob,
        # gather row reorder (adjacent rays per depth index are ~1 px
        # apart in the ref maps): strictly faster; forward bit-exact,
        # gradients equal up to f32 summation order (tested)
        gather_depth_major=True)
    model = NeuralRayGenRenderer(**model_kw)

    rng = np.random.default_rng(cfg.train.seed)
    reader = ShardReader(args.shards) if args.shards else None

    depth_source = args.depth_source or (
        "stack" if (args.mono_ckpt or args.mvs_ckpt or args.wo_stereo)
        else "gt")
    stack_fn = None
    if depth_source == "stack":
        from panogrf_tpu.models.depth_stack import (load_depth_stack,
                                                    stack_depth_for_sample)
        _stack = load_depth_stack(
            args.mono_ckpt, args.mvs_ckpt,
            # UniFuse's cube fusion needs W >= 128 (1/32-scale ERP)
            mono_hw=(max(H, 64), max(W, 128)),
            # MVS UNet needs >= 32 rows; output is resized to (DH, DW)
            depth_hw=(max(DH, 32), max(DW, 64)), wo_stereo=args.wo_stereo)
        stack_fn = _stack.jitted()
        print(f"depth source: frozen stack (mono="
              f"{args.mono_ckpt or 'random'}, mvs={args.mvs_ckpt or '-'})")

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

    # per-scene depth cache: the frozen stack's prediction is pose/image
    # deterministic, so each scene is run through mono+MVS once (the
    # reference caches the same way via its LMDB pre-render).
    _depth_cache: dict = {}

    def view_depth(s, key, ids, srcs):
        if key not in _depth_cache:
            if stack_fn is not None:
                pred = stack_depth_for_sample(stack_fn, s, ids, srcs)
                _depth_cache[key] = resize_linear(
                    pred["mvs_depth"], (DH, DW), axes=(1, 2))
            else:
                d = s["depth_panos"][jnp.asarray(ids)]
                _depth_cache[key] = resize_linear(d, (DH, DW), axes=(1, 2))
        return _depth_cache[key]

    def ref_depth(s, key):
        return view_depth(s, key, ref_ids,
                          list(imgs_info.SRC_IDS) if not mv else None)

    def batches():
        i = 0
        while True:
            if reader is not None:
                si = int(rng.integers(len(reader)))
                s = {k: jnp.asarray(v) for k, v in reader[si].items()}
                key = ("shard", si)
            else:
                si = int(rng.integers(len(pool)))
                s = pool[si]
                key = ("pool", si)
            coords = imgs_info.sample_train_coords(rng, H, W, 512)
            if mv:
                que = que_ids[int(rng.integers(len(que_ids)))]
                data = imgs_info.build_render_sample_mv(
                    s, coords, ref_ids, que, (R.min_depth, R.max_depth))
            else:
                data = imgs_info.build_render_sample(
                    s, coords, (R.min_depth, R.max_depth))
            data["ref_imgs_info"]["mvs_depth"] = ref_depth(s, key)
            if R.use_self_hit_prob:
                # consistency loss needs the QUERY view's predicted depth
                # (reference computes it in the dataset,
                # ``habitat_data_neuray.py:585-609``)
                q = que_ids[0] if not mv else que
                data["que_imgs_info"]["mvs_depth"] = view_depth(
                    s, key + ("que", q), [q], [ref_ids[0]])
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
        loss_kwargs={"render": {
            "use_ray_mask": R.use_ray_mask,
            "use_polar_weighted_loss": R.use_polar_weighted_loss}},
        seed=cfg.train.seed, save_dir=cfg.train.save_dir)

    # count-robust recipe: a dict of apply fns (one per static fine
    # count, ONE shared param tree) makes the Trainer draw the count per
    # step — see Trainer.__init__ docstring + AB_QUALITY_r5 jitter_w rows
    variant_probs = None
    if args.count_jitter:
        counts = [int(c) for c in args.count_jitter.split(",")]
        variant_probs = {f"f{c}": counts.count(c) for c in set(counts)}
        apply_fn = {
            f"f{c}": (lambda p, b, r, _m=NeuralRayGenRenderer(
                **{**model_kw, "fine_depth_sample_num": c}):
                _m.apply(p, b, rng=r))
            for c in set(counts)}
        print(f"count-jitter training: fine counts {sorted(set(counts))} "
              f"weights {variant_probs}")
    else:
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

    # gt|pred side-by-sides + turbo depth next to the JSONL metrics
    # (reference VisualizeImage, network/metrics.py:287-361)
    vis_dir = Path(cfg.train.save_dir) / cfg.train.name / "vis"

    def val_fn(params, step):
        import jax.numpy as jnp
        from panogrf_tpu.utils import visualize as V
        outs = {}
        vals = []
        for vi, s in enumerate(val_scenes):
            ref_info = imgs_info.build_imgs_info(
                s, ref_ids, (R.min_depth, R.max_depth))
            ref_info["mvs_depth"] = ref_depth(
                jax.tree.map(jnp.asarray, s), ("val", vi))
            que_w2c = imgs_info.pose_w2c(s["rots"], s["trans"])[que_ids[0]]
            c2w = imgs_info.c2w_from_w2c(que_w2c[None])[0]
            out = full_render.render_image(
                model, params, ref_info, c2w,
                jnp.asarray([[R.min_depth, R.max_depth]]),
                chunk=min(8192, H * W))
            gt = s["rgb_panos"][que_ids[0]]
            m = M.render_metrics(out["rgb"], gt)
            V.dump_render_val(vis_dir, step, vi, np.asarray(gt),
                              np.asarray(out["rgb"]),
                              pred_depth=(np.asarray(out["depth"])
                                          if "depth" in out else None))
            vals.append({k: float(v) for k, v in m.items()})
        for k in vals[0]:
            outs[k] = float(np.mean([v[k] for v in vals]))
        return outs

    t0 = time.time()

    def log(step, m):
        print(f"step {step} ({time.time()-t0:.0f}s): "
              + " ".join(f"{k}={v:.4f}" for k, v in m.items()))

    mesh = None
    if args.mesh:
        from panogrf_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)
        print(f"training on mesh {dict(mesh.shape)}")

    trainer = Trainer(apply_fn, params, tc, val_fn=val_fn, log_fn=log,
                      mesh=mesh, variant_probs=variant_probs)
    trainer.fit(stream, key_metric="psnr_nr")
    trainer.save("latest")
    print("done")


if __name__ == "__main__":
    main()
