"""Stage-level profile of the MVS depth TRAIN step (tunnel-safe timing).

The recorded recipe throughput (TRAIN_BENCH_r5.json train_mvs_256x512_b2
= 4.34 s/step) is far above any FLOP estimate for the model, so this
tool attributes the step across its stages on the real chip:

  step        full fwd+loss+bwd+adam (what bench_train times)
  fwd         model forward only
  feat        feature net (Equi) fwd
  feat_grad   feature net fwd+bwd
  sweep       spherical sweep cost volume fwd
  sweep_grad  sweep fwd + grad wrt BOTH feature maps (the gather's
              backward is a scatter-add -- the usual TPU pathology)
  reg         3D UNet regularizer fwd
  reg_grad    3D UNet fwd+bwd

Methodology identical to tools/profile_honest.py: K iterations chained
through a data dependency, one scalar fetch, minus the measured RTT.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit_chain(fn, iters=3):
    """fn: scalar -> scalar with the stage inside; chain `iters` dependent
    applications, one scalar fetch, minus RTT; returns sec per apply."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x0):
        def body(c, _):
            return fn(c), 0.0
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return c

    _ = float(chain(jnp.float32(1.0)))        # compile + warm
    trivial = jax.jit(lambda v: v + 1.0)
    _ = float(trivial(jnp.float32(0)))
    rtts = [0.0] * 3
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(trivial(jnp.float32(i)))
        rtts[i] = time.perf_counter() - t0
    rtt = min(rtts)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(chain(jnp.float32(1.0 + 1e-3 * i)))
        times.append(time.perf_counter() - t0)
    return max((min(times) - rtt) / iters, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--hypotheses", type=int, default=64)
    ap.add_argument("--stages", default="step,fwd,feat,feat_grad,sweep,"
                                        "sweep_grad,reg,reg_grad")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--scatter", action="store_true",
                    help="time the sweep stages through the SCATTER "
                         "backward (mm_backward=False) for comparison; "
                         "WARNING: at full shapes one chained dispatch "
                         "can exceed the tunnel's ~30 s limit -- use "
                         "--iters 1 and small shapes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from panogrf_tpu.models.mvs import MVSDepthModel, build_depth_hypotheses
    from panogrf_tpu.models.unifuse import Equi
    from panogrf_tpu.nn.blocks import UNet3D, resize_linear
    from panogrf_tpu.train.depth_trainer import DepthTrainer, DepthTrainConfig

    H, W, B, D = args.height, args.width, args.batch, args.hypotheses
    h4, w4 = H // 4, W // 4
    model = MVSDepthModel(num_hypotheses=D)
    rng = np.random.default_rng(2022)
    panos = jnp.asarray(rng.uniform(size=(B, 2, H, W, 3)), jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3), (B, 2, 3, 3))
    trans = jnp.zeros((B, 2, 3)).at[:, 0, 2].set(0.3)
    mono = jnp.asarray(rng.uniform(1, 5, size=(B, H, W, 1)), jnp.float32)
    feat = jnp.asarray(rng.uniform(size=(B, H // 2, W // 2, 32)), jnp.float32)
    gt = jnp.asarray(rng.uniform(1, 5, size=(B, H, W, 1)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), panos, rots,
                                    trans, mono, feat)

    results = {}
    stages = args.stages.split(",")

    if "step" in stages or "fwd" in stages:
        def forward_fn(v, batch, train):
            out, mut = model.apply(v, batch["panos"], batch["rots"],
                                   batch["trans"], batch["mono"],
                                   batch["feat"], train=train,
                                   mutable=["batch_stats"] if train else [])
            out = dict(out)
            out["pred_depth"] = out["depth"]
            return out, (dict(mut) if train else {})

        trainer = DepthTrainer(forward_fn, variables,
                               DepthTrainConfig(loss_type="l1_sphere"))
        batch = {"panos": panos, "rots": rots, "trans": trans, "mono": mono,
                 "feat": feat, "gt_depth": gt}

    if "step" in stages:
        def one_step(st):
            p, s_, o = st
            p, s_, o, _ = trainer._train_step(p, s_, o, batch)
            return (p, s_, o)
        # chain through the state tuple: adapt timeit_chain manually
        import jax as _jax

        @_jax.jit
        def chain(st):
            def body(c, _):
                return one_step(c), 0.0
            c, _ = _jax.lax.scan(body, st, None, length=args.iters)
            return _jax.tree_util.tree_reduce(
                lambda a, b: a + b,
                _jax.tree_util.tree_map(jnp.sum, c[0]))
        st0 = (trainer.params, trainer.state, trainer.opt_state)
        _ = float(chain(st0))
        trivial = jax.jit(lambda v: v + 1.0)
        _ = float(trivial(jnp.float32(0)))
        t0 = time.perf_counter(); _ = float(trivial(jnp.float32(1)))
        rtt = time.perf_counter() - t0
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(chain(st0))
            ts.append(time.perf_counter() - t0)
        results["step"] = (min(ts) - rtt) / args.iters

    if "fwd" in stages:
        def f_fwd(x):
            b2 = dict(batch)
            b2["panos"] = batch["panos"] + x * 1e-12
            out, _ = forward_fn(variables, b2, False)
            return x * (1.0 + 1e-9 * out["depth"].sum())
        results["fwd"] = timeit_chain(f_fwd, args.iters)

    flat = panos.reshape(B * 2, H, W, 3)
    equi = Equi()
    ev = jax.jit(equi.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), flat, False)

    if "feat" in stages:
        def f_feat(x):
            y = equi.apply(ev, flat + x * 1e-12, False)
            return x * (1.0 + 1e-9 * y.sum())
        results["feat"] = timeit_chain(f_feat, args.iters)

    if "feat_grad" in stages:
        def f_featg(x):
            g = jax.grad(lambda xx: equi.apply(ev, xx, False).sum())(
                flat + x * 1e-12)
            return x * (1.0 + 1e-9 * g.sum())
        results["feat_grad"] = timeit_chain(f_featg, args.iters)

    # sweep operands
    feats = jax.jit(lambda f: equi.apply(ev, f, False))(flat)
    feats = feats.reshape(B, 2, h4, w4, feats.shape[-1])
    mu4 = resize_linear(mono, (h4, w4), axes=(1, 2))
    dvol = build_depth_hypotheses(mu4, [0.0] * 5, D, 0.1, 10.0, 0.5)
    from panogrf_tpu.ops.cost_volume import spherical_sweep_cost
    conv = model.convention

    def sweep(rf, sf):
        return jax.vmap(lambda a, b, dv, rot, tr: spherical_sweep_cost(
            a, b, dv, rot[1], tr[1], rot[0], tr[0], conv,
            mm_backward=not args.scatter))(
            rf, sf, dvol, rots, trans)

    if "sweep" in stages:
        def f_sweep(x):
            c = sweep(feats[:, 1] + x * 0, feats[:, 0] + x * 0)
            return x * (1.0 + 1e-9 * c.sum())
        results["sweep"] = timeit_chain(f_sweep, args.iters)

    if "sweep_grad" in stages:
        def f_sweepg(x):
            g = jax.grad(lambda rf, sf: sweep(rf, sf).sum(),
                         argnums=(0, 1))(feats[:, 1] + x * 0,
                                         feats[:, 0] + x * 0)
            return x * (1.0 + 1e-9 * (g[0].sum() + g[1].sum()))
        results["sweep_grad"] = timeit_chain(f_sweepg, args.iters)

    cost = jax.jit(lambda: sweep(feats[:, 1], feats[:, 0]))()
    u3 = UNet3D(base_features=32, num_layers=3, out_features=1, wrap=True)
    uv = jax.jit(u3.init)(jax.random.PRNGKey(0), cost)

    if "reg" in stages:
        def f_reg(x):
            y = u3.apply(uv, cost + x * 0)
            return x * (1.0 + 1e-9 * y.sum())
        results["reg"] = timeit_chain(f_reg, args.iters)

    if "reg_grad" in stages:
        def f_regg(x):
            g = jax.grad(lambda c: u3.apply(uv, c).sum())(cost + x * 0)
            return x * (1.0 + 1e-9 * g.sum())
        results["reg_grad"] = timeit_chain(f_regg, args.iters)

    print(json.dumps({k: round(v * 1000.0, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
