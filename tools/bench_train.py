"""Training-throughput benchmark (steps/sec on the real chip).

VERDICT r3 item 7: the serving bench (bench.py) times inference only; this
tool times the two training recipes the reference actually runs
(``/root/reference/train/trainer.py:330-432`` renderer loop,
``train_depth.py:602`` MVS loop):

* ``gen``  — the 512x1024 renderer recipe: 512 query rays/step, 64+64
  samples, rfn=2, render+depth losses, Adam + exp-decay (the shipped
  ``neuray_gen_cv_erp_mono_stereo_uniform_512x1024`` configuration).
* ``mvs``  — the 256x512 two-view MVS depth recipe at batch 2
  (``configs/train/depth/m3d_mvs.yaml``): l1-sphere + 0.5*d1 aux.

Methodology (tunnel TPU): steps chain through the train state (step i+1
consumes step i's params), so one scalar fetch at the end serializes the
whole run; RTT is subtracted once.  Each recipe prints ONE JSON line.

``--mesh N`` times the data-parallel variant over an N-device mesh
(virtual CPU devices with --cpu; real multi-chip numbers need a pod —
this box tunnels a single v5e).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _time_steps(run_k, warm_arg, iters):
    """run_k(state) -> (state, scalar); returns sec/step.

    Steps chain through the state, so the final scalar fetch serializes
    all ``iters`` steps; the tunnel RTT of one trivial fetch is measured
    separately and subtracted once.
    """
    import jax.numpy as jnp
    import jax
    st, x = run_k(warm_arg)                  # compile + warm
    _ = float(x)
    trivial = jax.jit(lambda v: v + 1.0)
    _ = float(trivial(x))
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(trivial(x))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    t0 = time.perf_counter()
    s2 = warm_arg
    for _ in range(iters):
        s2, x = run_k(s2)
    _ = float(x)
    dt = time.perf_counter() - t0
    return max((dt - rtt) / iters, 1e-9)


def bench_gen(args):
    import jax
    import jax.numpy as jnp
    from panogrf_tpu.data import imgs_info
    from panogrf_tpu.data.synthetic import SphereScene, make_three_view_sample
    from panogrf_tpu.nn.blocks import resize_linear
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.train.trainer import (TrainState, TrainerConfig,
                                           make_optimizer, make_train_step)

    on_cpu = jax.default_backend() == "cpu"
    H, W = (64, 128) if on_cpu else (512, 1024)
    DH, DW = (32, 64) if on_cpu else (256, 512)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 gather_depth_major=True)

    rng = np.random.default_rng(2022)
    scene = SphereScene.random(7)
    s = jax.tree.map(jnp.asarray,
                     make_three_view_sample(scene, H, W, 0.5, seed=7))
    coords = imgs_info.sample_train_coords(rng, H, W, args.rays)
    data = imgs_info.build_render_sample(s, coords, (0.5, 15.0))
    data["ref_imgs_info"]["mvs_depth"] = resize_linear(
        s["depth_panos"][jnp.asarray(list(imgs_info.REF_IDS))], (DH, DW),
        axes=(1, 2))
    # depth loss inputs (reference gen recipe trains render + depth,
    # yaml `loss: [render, depth]`)
    data["ref_imgs_info"]["true_depth"] = s["depth_panos"][
        jnp.asarray(list(imgs_info.REF_IDS))]
    data.pop("src_imgs_info", None)

    cfg = TrainerConfig(losses=("render", "depth"))
    tx, _ = make_optimizer(cfg)

    def apply_fn(p, batch, rng_):
        return model.apply(p, batch, rng=rng_)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    step = make_train_step(apply_fn, cfg, tx)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))

    key = jax.random.PRNGKey(1)

    def run_k(st):
        st, m = step(st, data, key)
        return st, m["loss"]

    sec = _time_steps(run_k, state, args.iters)
    name = f"train_gen_{H}x{W}" + ("_cpu" if on_cpu else "")
    print(json.dumps({
        "metric": name, "value": round(1.0 / sec, 3), "unit": "steps/sec",
        "sec_per_step": round(sec, 4), "rays_per_step": args.rays,
        "rays_per_sec": int(args.rays / sec)}))


def bench_mvs(args):
    import jax
    import jax.numpy as jnp
    from panogrf_tpu.models.mvs import MVSDepthModel
    from panogrf_tpu.train.depth_trainer import DepthTrainer, DepthTrainConfig

    on_cpu = jax.default_backend() == "cpu"
    H, W = (32, 64) if on_cpu else (256, 512)
    B = 2
    model = MVSDepthModel(num_hypotheses=16 if on_cpu else 64)
    rng = np.random.default_rng(2022)
    panos = jnp.asarray(rng.uniform(size=(B, 2, H, W, 3)), jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3), (B, 2, 3, 3))
    trans = jnp.zeros((B, 2, 3)).at[:, 0, 2].set(0.3)
    mono = jnp.asarray(rng.uniform(1, 5, size=(B, H, W, 1)), jnp.float32)
    feat = jnp.asarray(rng.uniform(size=(B, H // 2, W // 2, 32)),
                       jnp.float32)
    gt = jnp.asarray(rng.uniform(1, 5, size=(B, H, W, 1)), jnp.float32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), panos, rots,
                                    trans, mono, feat)

    def forward_fn(v, batch, train):
        out, mut = model.apply(v, batch["panos"], batch["rots"],
                               batch["trans"], batch["mono"], batch["feat"],
                               train=train,
                               mutable=["batch_stats"] if train else [])
        out = dict(out)
        out["pred_depth"] = out["depth"]
        return out, (dict(mut) if train else {})

    trainer = DepthTrainer(forward_fn, variables,
                           DepthTrainConfig(loss_type="l1_sphere"))
    batch = {"panos": panos, "rots": rots, "trans": trans, "mono": mono,
             "feat": feat, "gt_depth": gt}

    st0 = (trainer.params, trainer.state, trainer.opt_state)

    def run_k(st):
        p, s_, o = st
        p, s_, o, loss = trainer._train_step(p, s_, o, batch)
        return (p, s_, o), loss

    sec = _time_steps(run_k, st0, args.iters)
    name = f"train_mvs_{H}x{W}_b{B}" + ("_cpu" if on_cpu else "")
    print(json.dumps({
        "metric": name, "value": round(1.0 / sec, 3), "unit": "steps/sec",
        "sec_per_step": round(sec, 4)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", default="gen", choices=["gen", "mvs", "all"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rays", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.recipe in ("gen", "all"):
        bench_gen(args)
    if args.recipe in ("mvs", "all"):
        bench_mvs(args)


if __name__ == "__main__":
    main()
