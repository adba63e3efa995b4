"""Finetune UniFuse 360 mono depth (reference ``train_mono.py``).

Usage:
  python tools/train_mono.py --steps 200 --height 128 --width 256 \
      [--shards data/shards_train] [--loss l1_sphere|berhu|gaussian_nll]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--shards", default=None)
    ap.add_argument("--loss", default="l1_sphere")
    ap.add_argument("--uncertainty", action="store_true")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--name", default="mono_run")
    ap.add_argument("--max-depth", type=float, default=10.0)
    ap.add_argument("--mono-net", default="UniFuse",
                    choices=["UniFuse", "Equi", "ERP+TP", "Cube"],
                    help="select_mono factory choice: Equi = ERP-only, "
                         "ERP+TP = tangent-patch fusion ablation "
                         "(reference models/my_erp_tp.py), Cube = "
                         "cube-encoder-only ablation (my_cube_only.py)")
    ap.add_argument("--nrows", type=int, default=4,
                    help="ERP+TP tangent-patch layout (3/4/5/6 rows)")
    ap.add_argument("--patch-size", type=int, default=64)
    ap.add_argument("--num-layers", type=int, default=18,
                    help="encoder depth: 2=mobilenet_v2, 18/34=resnet")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="data-parallel training over an N-device mesh "
                         "with cross-replica BatchNorm (the reference's "
                         "SyncBN role, sync_batchnorm/); --batch must be "
                         "a multiple of N (with --cpu this uses N virtual "
                         "CPU devices)")
    ap.add_argument("--vis-interval", type=int, default=100,
                    help="write rgb|gt|pred|error turbo sheets under the "
                         "run dir every N steps (0 = off; reference "
                         "train_mono.py tensorboard images)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        if args.mesh:
            jax.config.update("jax_num_cpu_devices", args.mesh)
    import jax
    import jax.numpy as jnp

    from panogrf_tpu.core import cubemap
    from panogrf_tpu.data.shards import ShardReader
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_three_view_sample)
    from panogrf_tpu.models.unifuse import (UniFuse, normalize_imagenet,
                                            select_mono)
    from panogrf_tpu.train.depth_trainer import DepthTrainer, DepthTrainConfig

    H, W = args.height, args.width
    loss = "gaussian_nll" if args.uncertainty else args.loss
    model = select_mono({"mono_net": args.mono_net,
                         "max_depth": args.max_depth,
                         "mono_uncertainty": args.uncertainty,
                         "mono_num_layers": args.num_layers,
                         "nrows": args.nrows,
                         "patchsize": args.patch_size,
                         "bn_axis": "data" if args.mesh else None})
    # UniFuse and the Cube ablation consume the cubemap input
    is_unifuse = args.mono_net in ("UniFuse", "Cube")
    rng = np.random.default_rng(2022)
    reader = ShardReader(args.shards) if args.shards else None

    def make_batch():
        eqs, gts = [], []
        for _ in range(args.batch):
            if reader is not None:
                s = reader[int(rng.integers(len(reader)))]
                v = int(rng.integers(s["rgb_panos"].shape[0]))
                rgb, d = s["rgb_panos"][v], s["depth_panos"][v]
            else:
                scene = SphereScene.random(int(rng.integers(1 << 30)))
                s = make_three_view_sample(scene, H, W, 0.5,
                                           seed=int(rng.integers(1 << 30)))
                rgb, d = np.asarray(s["rgb_panos"][1]), \
                    np.asarray(s["depth_panos"][1])
            eqs.append(rgb)
            gts.append(np.clip(d, 0, args.max_depth))
        equi = jnp.asarray(np.stack(eqs), jnp.float32)
        gt = jnp.asarray(np.stack(gts), jnp.float32)
        equi_n = normalize_imagenet(equi)
        batch = {"equi": equi_n, "gt_depth": gt}
        if is_unifuse:
            batch["cube"] = jax.vmap(
                lambda e: cubemap.equi_to_cube(e, H // 2))(equi_n)
        return batch

    def batches():
        while True:
            yield make_batch()

    first = make_batch()

    def _args(batch):
        return ((batch["equi"], batch["cube"]) if is_unifuse
                else (batch["equi"],))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *_args(first))

    def forward_fn(variables, batch, train):
        if train:
            out, new_state = model.apply(
                variables, *_args(batch), train=True,
                mutable=["batch_stats"])
            return out, new_state
        out = model.apply(variables, *_args(batch))
        return out, {}

    mesh = None
    if args.mesh:
        from panogrf_tpu.parallel.mesh import make_mesh
        if args.batch % args.mesh:
            raise SystemExit(f"--batch {args.batch} must be a multiple of "
                             f"--mesh {args.mesh}")
        mesh = make_mesh(args.mesh, data=args.mesh)
        print(f"training on mesh {dict(mesh.shape)} (SyncBN on 'data')")

    cfg = DepthTrainConfig(name=args.name, learning_rate=args.lr,
                           loss_type=loss, aux_d1_weight=0.0,
                           log_interval=10,
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
