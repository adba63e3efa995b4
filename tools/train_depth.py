"""Train the 360-MVS depth net with a frozen mono prior (reference
``train_depth.py`` recipe, config ``configs/train/depth/m3d_mvs.yaml``).

Usage:
  python tools/train_depth.py --steps 200 --height 128 --width 256 \
      [--mono-ckpt data/depth_model/mono_run/checkpoint_200] \
      [--shards data/shards_train]

Without --mono-ckpt a randomly initialized frozen UniFuse provides the
hypothesis prior (fine for smoke runs; real training should point at a
trained mono checkpoint).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None,
                    help="depth recipe yaml (e.g. configs/depth/"
                         "m3d_mvs_v4.yaml); CLI flags override")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--views", type=int, default=2, metavar="V",
                    help="V-view MVS training (reference train_depth_mv.py"
                         " / pipeline3_model.py:951-1300): the reference "
                         "view's cost volume is averaged over the V-1 "
                         "sources (models/mvs.py multi-view sweep)")
    ap.add_argument("--shards", default=None)
    ap.add_argument("--mono-ckpt", default=None)
    ap.add_argument("--m3d-dist", type=float, default=1.0)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--name", default="mvs_run")
    ap.add_argument("--min-depth", type=float, default=0.1)
    ap.add_argument("--max-depth", type=float, default=10.0)
    ap.add_argument("--hypotheses", type=int, default=64)
    ap.add_argument("--mvs-uncertainty", action="store_true")
    ap.add_argument("--model", default="mvs", choices=["mvs", "fnet"],
                    help="mvs = 360-MVSNet with mono prior (default); "
                         "fnet = single-UNet cost-volume variant "
                         "(reference fnet.py v3_erp, no mono prior)")
    ap.add_argument("--new-reg3dnet", action="store_true",
                    help="MVSNet CostRegNet regularizer (use_new_reg3dnet)")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="data-parallel training over an N-device mesh "
                         "with cross-replica BatchNorm (the reference's "
                         "SyncBN role, sync_batchnorm/); --batch must be "
                         "a multiple of N (with --cpu this uses N virtual "
                         "CPU devices)")
    ap.add_argument("--vis-interval", type=int, default=100,
                    help="write rgb|gt|pred|error turbo sheets under the "
                         "run dir every N steps (0 = off; reference "
                         "train_depth.py:456-580 tensorboard images)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        if args.mesh:
            jax.config.update("jax_num_cpu_devices", args.mesh)
    import jax
    import jax.numpy as jnp

    if args.cfg:
        # recipe yaml supplies the defaults; explicitly given CLI flags win
        from panogrf_tpu.config import load_config
        cfg = load_config(args.cfg)
        given = {a.split("=")[0].lstrip("-").replace("-", "_")
                 for a in sys.argv[1:] if a.startswith("--")}
        for flag, val in [
                ("height", cfg.data.height), ("width", cfg.data.width),
                ("views", cfg.data.seq_len),
                ("batch", cfg.train.batch_size), ("lr", cfg.train.lr_init),
                ("m3d_dist", cfg.data.m3d_dist),
                ("min_depth", cfg.mono.min_depth),
                ("max_depth", cfg.mono.max_depth),
                ("hypotheses", cfg.mvs.cost_volume_channels),
                ("name", cfg.train.name)]:
            if flag not in given:
                setattr(args, flag, val)

    from panogrf_tpu.core import cubemap
    from panogrf_tpu.data.shards import ShardReader
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_three_view_sample)
    from panogrf_tpu.models.mvs import MVSDepthModel
    from panogrf_tpu.models.unifuse import UniFuse, normalize_imagenet
    from panogrf_tpu.train.depth_trainer import DepthTrainer, DepthTrainConfig

    H, W = args.height, args.width
    mono = UniFuse(max_depth=args.max_depth)
    rng = np.random.default_rng(2022)

    mono_vars = None
    if args.model == "mvs":
        dummy_e = jnp.zeros((1, H, W, 3))
        dummy_c = jnp.zeros((1, 6, H // 2, H // 2, 3))
        mono_vars = jax.jit(mono.init)(jax.random.PRNGKey(1), dummy_e,
                                       dummy_c)
    if args.mono_ckpt:
        import orbax.checkpoint as ocp
        mono_vars = ocp.StandardCheckpointer().restore(
            Path(args.mono_ckpt).absolute(), mono_vars)
        print(f"restored mono from {args.mono_ckpt}")

    mono_apply = jax.jit(lambda v, e, c: mono.apply(v, e, c))

    reader = ShardReader(args.shards) if args.shards else None

    # view ordering for the model (index 1 = reference whose depth is
    # predicted, every other index a source — ``models/mvs.py`` sweep):
    # 2-view keeps the classic (src=0, ref=1); V>2 follows the reference
    # mv protocol (m3d_mvs_v4.yaml: reference_idx = seq_len-1, sources =
    # the preceding views; ``train_depth_mv.py`` /
    # ``pipeline3_model.py:951-1300`` cost averaged over all sources).
    V = max(2, args.views)
    view_order = [0, 1] if V == 2 else [0, V - 1] + list(range(1, V - 1))

    def make_batch():
        panos, rots, trans, gts = [], [], [], []
        for _ in range(args.batch):
            if reader is not None:
                s = reader[int(rng.integers(len(reader)))]
            else:
                scene = SphereScene.random(int(rng.integers(1 << 30)))
                if V <= 3:
                    mk = make_three_view_sample(
                        scene, H, W, args.m3d_dist,
                        seed=int(rng.integers(1 << 30)))
                else:
                    from panogrf_tpu.data.synthetic import \
                        make_multi_view_sample
                    mk = make_multi_view_sample(
                        scene, H, W, V, args.m3d_dist,
                        seed=int(rng.integers(1 << 30)))
                s = {k: np.asarray(v) for k, v in mk.items()}
            if s["rgb_panos"].shape[0] < V:
                raise SystemExit(
                    f"--views {V} but data has {s['rgb_panos'].shape[0]} "
                    "views per sample")
            panos.append(s["rgb_panos"][view_order])
            rots.append(s["rots"][view_order])
            trans.append(s["trans"][view_order])
            gts.append(np.clip(s["depth_panos"][view_order[1]], 0,
                               args.max_depth))
        batch = {
            "panos": jnp.asarray(np.stack(panos), jnp.float32),
            "rots": jnp.asarray(np.stack(rots), jnp.float32),
            "trans": jnp.asarray(np.stack(trans), jnp.float32),
            "gt_depth": jnp.asarray(np.stack(gts), jnp.float32),
        }
        if args.model == "mvs":
            # frozen mono prior on the reference view
            equi = normalize_imagenet(batch["panos"][:, 1])
            cube = jax.vmap(lambda e: cubemap.equi_to_cube(e, H // 2))(equi)
            mout = mono_apply(mono_vars, equi, cube)
            batch["mono_depth"] = jax.lax.stop_gradient(mout["pred_depth"])
            batch["mono_feat"] = jax.lax.stop_gradient(mout["mono_feat"])
        return batch

    def batches():
        while True:
            yield make_batch()

    first = make_batch()
    if args.model == "fnet":
        from panogrf_tpu.models.fnet import FNetDepthModel
        model = FNetDepthModel(
            min_depth=args.min_depth, max_depth=args.max_depth,
            num_depths=args.hypotheses)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), first["panos"][:, :2],
            first["rots"][:, :2], first["trans"][:, :2])

        def forward_fn(variables, batch, train):
            out = model.apply(variables, batch["panos"][:, :2],
                              batch["rots"][:, :2], batch["trans"][:, :2])
            return {"pred_depth": out["depth"]}, {}
    else:
        model = MVSDepthModel(
            min_depth=args.min_depth, max_depth=args.max_depth,
            num_hypotheses=args.hypotheses,
            mvs_uncertainty=args.mvs_uncertainty,
            use_new_reg3dnet=args.new_reg3dnet,
            bn_axis="data" if args.mesh else None)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), first["panos"], first["rots"],
            first["trans"], first["mono_depth"], first["mono_feat"])

        def forward_fn(variables, batch, train):
            # train=True runs BatchNorm on batch statistics and mutates
            # them (torch BN semantics; with --mesh the bn_axis pmean makes
            # the stats cross-replica — the reference's SyncBN role)
            a = (batch["panos"], batch["rots"], batch["trans"],
                 batch["mono_depth"], batch["mono_feat"])
            if train:
                out, mut = model.apply(variables, *a, train=True,
                                       mutable=["batch_stats"])
                new_state = dict(mut)
            else:
                out, new_state = model.apply(variables, *a), {}
            out = dict(out)
            out["pred_depth"] = out.pop("depth")
            if args.mvs_uncertainty:
                out["pred"] = out["pred_final"]
            return out, new_state
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"{args.model} params: {n/1e6:.2f}M")

    mesh = None
    if args.mesh:
        from panogrf_tpu.parallel.mesh import make_mesh
        if args.batch % args.mesh:
            raise SystemExit(f"--batch {args.batch} must be a multiple of "
                             f"--mesh {args.mesh}")
        mesh = make_mesh(args.mesh, data=args.mesh)
        print(f"training on mesh {dict(mesh.shape)} (SyncBN on 'data')")

    loss = "gaussian_nll" if args.mvs_uncertainty else "l1_sphere"
    cfg = DepthTrainConfig(name=args.name, learning_rate=args.lr,
                           loss_type=loss, log_interval=10,
                           vis_interval=args.vis_interval)
    trainer = DepthTrainer(forward_fn, variables, cfg,
                           log_fn=lambda s, m: print(f"step {s}: {m}"),
                           mesh=mesh)
    trainer.restore()
    trainer.fit(batches(), args.steps)
    trainer.save()
    print("eval:", trainer.evaluate(batches(), 2))


if __name__ == "__main__":
    main()
