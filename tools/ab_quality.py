"""Quality A/B for every serving-path approximation.

Renders the same held-out synthetic scenes with one trained checkpoint
under each operating point and prints a PSNR/SSIM table:

  exact        float32, per-map gathers, full coarse+fine (reference
               numerics)
  fast_gather  single merged full-res gather (quality-neutral claim)
  bf16         fast_gather + bfloat16 compute (the serving default)
  light_coarse bf16 + proxy coarse pass (importance from the decoded
               NeuRay stats map, fine pass unchanged)
  diner        depth-guided sampling, no fine pass

Usage:
  python tools/ab_quality.py [--ckpt data/model/run/latest] [--steps 300]
      [--height 128 --width 256] [--num 4] [--cpu]

Without --ckpt a small renderer is trained from scratch on procedural
scenes first (steps controlled by --steps) so the comparison runs on
weights that actually render structure.
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--depth-height", type=int, default=64)
    ap.add_argument("--depth-width", type=int, default=128)
    ap.add_argument("--num", type=int, default=4)
    ap.add_argument("--m3d-dist", type=float, default=0.5)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--fine-samples", type=int, default=0,
                    help="fine-pass sample count for BOTH training and "
                         "eval (0 = --samples).  Sample counts are "
                         "train-time knobs (AB_QUALITY_r5 serving_f*): "
                         "this trains a ckpt native to an asymmetric "
                         "coarse/fine count instead of evaluating a "
                         "64-trained ckpt off its calibration")
    ap.add_argument("--proxy-samples", type=int, default=0)
    ap.add_argument("--count-jitter", default="",
                    help="comma list of FINE sample counts (e.g. "
                         "'64,48,32'): train with the fine count drawn "
                         "uniformly per step (one param tree, one jitted "
                         "step per count) so a single ckpt stays "
                         "calibrated at every listed serve-time count — "
                         "the count-robust recipe (vs the per-count "
                         "native ckpts of --fine-samples).  Duplicates "
                         "weight the draw: '64,64,48,32' trains half "
                         "the steps at 64")
    ap.add_argument("--modes", default="exact,fast_gather,bf16,"
                                       "light_coarse,diner")
    ap.add_argument("--train-mode", default="hierarchical",
                    help="from-scratch training sampler: 'hierarchical' "
                         "or 'diner[N][_muK|_cuK]' (trains the renderer "
                         "under DINER depth-guided sampling, the "
                         "reference's diner_depth_guided_sampling flag; "
                         "eval --modes must then be diner-family only — "
                         "the fine decoder/agg params do not exist)")
    ap.add_argument("--save-ckpt", default=None,
                    help="save the from-scratch-trained params here "
                         "(orbax) so later mode runs can reuse --ckpt")
    ap.add_argument("--out", default=None, help="write the table as JSON")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from panogrf_tpu.data import imgs_info
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_three_view_sample)
    from panogrf_tpu.nn.blocks import resize_linear
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.renderer import full_render
    from panogrf_tpu.renderer.presets import PRESETS
    from panogrf_tpu.train import metrics as M

    H, W = args.height, args.width
    DH, DW = args.depth_height, args.depth_width
    dn = args.samples

    train_kw = {}
    if args.train_mode != "hierarchical":
        import re as _re2
        g = _re2.fullmatch(r"diner(\d*)(?:_(mu|cu)(\d+))?", args.train_mode)
        assert g, f"bad --train-mode {args.train_mode}"
        train_kw = {
            "sampling_mode": "diner",
            "use_hierarchical_sampling": False,
            "diner_n_candidates": int(g.group(1)) if g.group(1) else 128,
            "diner_n_uniform": int(g.group(3)) if g.group(2) == "mu" else 0,
            "diner_contain_uniform":
                int(g.group(3)) if g.group(2) == "cu" else 0,
        }

    def make_model(**kw):
        base_kw = dict(
            height=H, width=W, depth_hw=(DH, DW), depth_sample_num=dn,
            fine_depth_sample_num=args.fine_samples or dn,
            coarse_proxy_samples=args.proxy_samples, **train_kw)
        base_kw.update(kw)
        return NeuralRayGenRenderer(**base_kw)

    # all modes share ONE parameter tree (the flags only change execution)
    base = make_model()
    rng = np.random.default_rng(0)
    scene = SphereScene.random(1234)
    s0 = make_three_view_sample(scene, H, W, args.m3d_dist, seed=0)
    coords = imgs_info.sample_train_coords(rng, H, W, 512)

    def with_depth(data, s):
        d = s["depth_panos"][jnp.asarray(imgs_info.REF_IDS)]
        data["ref_imgs_info"]["mvs_depth"] = resize_linear(
            d, (DH, DW), axes=(1, 2))
        data.pop("src_imgs_info", None)
        return data

    data0 = with_depth(imgs_info.build_render_sample(s0, coords), s0)
    params = jax.jit(base.init)(jax.random.PRNGKey(0), data0)
    if args.ckpt:
        from panogrf_tpu.train.trainer import load_checkpoint_params
        params = load_checkpoint_params(args.ckpt, target=params)
        print(f"restored {args.ckpt}")
    else:
        from panogrf_tpu.train.trainer import Trainer, TrainerConfig
        pool = [make_three_view_sample(SphereScene.random(100 + i), H, W,
                                       args.m3d_dist, seed=i)
                for i in range(8)]

        def stream():
            while True:
                s = pool[int(rng.integers(len(pool)))]
                c = imgs_info.sample_train_coords(rng, H, W, 512)
                yield with_depth(imgs_info.build_render_sample(s, c), s)

        cfg = TrainerConfig(total_step=args.steps, val_interval=10**9,
                            save_interval=10**9, losses=("render",),
                            log_interval=100,
                            lr_cfg={"lr_init": 4e-4, "decay_step": 10**9,
                                    "decay_rate": 0.5})
        probs = None
        if args.count_jitter:
            counts = [int(c) for c in args.count_jitter.split(",")]
            # duplicates weight the per-step draw: '64,64,48,32' trains
            # half the steps at 64
            probs = {f"f{c}": counts.count(c) for c in set(counts)}
            variants = {
                f"f{c}": (lambda p, b, r, _m=make_model(
                    fine_depth_sample_num=c):
                    _m.apply(p, b, rng=r))
                for c in set(counts)}
            apply = variants
        else:
            apply = lambda p, b, r: base.apply(p, b, rng=r)
        tr = Trainer(apply, params, cfg, variant_probs=probs,
                     log_fn=lambda st, m: print(f"train {st}: "
                                                f"loss={m['loss']:.4f}"))
        tr.fit(stream())
        params = tr.state.params
        if args.save_ckpt:
            import orbax.checkpoint as ocp
            ck = ocp.StandardCheckpointer()
            ck.save(Path(args.save_ckpt).absolute(), params, force=True)
            # StandardCheckpointer.save is ASYNC: without this the
            # checkpoint stays a .orbax-checkpoint-tmp dir until exit
            ck.wait_until_finished()
            print(f"saved params -> {args.save_ckpt}")

    mode_cfgs = {
        "exact": {},
        "fast_gather": {"fast_gather": True},
        "bf16": {"fast_gather": True, "compute_dtype": "bfloat16"},
        "light_coarse": {"fast_gather": True, "compute_dtype": "bfloat16",
                         "light_coarse": True},
        # real coarse pass at a reduced sample count.  MEASURED: -5.8 dB
        # (r3) — eval sample counts that differ from the trained ones
        # collapse on a converged ckpt (see serving_f* note below).
        "coarse16": {"fast_gather": True, "compute_dtype": "bfloat16",
                     "depth_sample_num": 16},
        "coarse32": {"fast_gather": True, "compute_dtype": "bfloat16",
                     "depth_sample_num": 32},
        # epipolar feature interpolation: gather every S-th sample's map
        # row, lerp in between (geometry exact) — render_ops stride path
        "s2": {"fast_gather": True, "compute_dtype": "bfloat16",
               "gather_stride": 2},
        "s4": {"fast_gather": True, "compute_dtype": "bfloat16",
               "gather_stride": 4},
        "s8": {"fast_gather": True, "compute_dtype": "bfloat16",
               "gather_stride": 8},
        # decode-on-map: dist-decoder heads precomputed on the map,
        # stats gathered with the row (see renderer.decode_on_map)
        "dmap": {"fast_gather": True, "compute_dtype": "bfloat16",
                 "gather_stride": 4, "decode_on_map": True},
        # asymmetric stride: fine samples cluster near surfaces so a
        # larger fine stride loses less than the same coarse stride
        "s4f8": {"fast_gather": True, "compute_dtype": "bfloat16",
                 "gather_stride": 4, "gather_stride_fine": 8},
        "dmap_s4f8": {"fast_gather": True, "compute_dtype": "bfloat16",
                      "gather_stride": 4, "gather_stride_fine": 8,
                      "decode_on_map": True},
        # serving renders ONLY the fine pass — the coarse pass just
        # places fine samples — so a coarser COARSE stride may be near
        # free while fine stride touches final colors directly
        "dmap_s8f8": {"fast_gather": True, "compute_dtype": "bfloat16",
                      "gather_stride": 8, "gather_stride_fine": 8,
                      "decode_on_map": True},
        "dmap_s8f4": {"fast_gather": True, "compute_dtype": "bfloat16",
                      "gather_stride": 8, "gather_stride_fine": 4,
                      "decode_on_map": True},
        "dmap_s4f16": {"fast_gather": True, "compute_dtype": "bfloat16",
                       "gather_stride": 4, "gather_stride_fine": 16,
                       "decode_on_map": True},
        "dmap_s4f32": {"fast_gather": True, "compute_dtype": "bfloat16",
                       "gather_stride": 4, "gather_stride_fine": 32,
                       "decode_on_map": True},
        # the blessed operating points, single-sourced from
        # renderer/presets.py (what bench.py/render.py --preset run).
        # NOTE: "serving"/"turbo" here measure the MODEL flags only; the
        # presets' render-path lowres-coarse factor is the clr2/clr4
        # modes (serving ships clr2, turbo ships clr4 — the "turbo" mode
        # below renders with its preset factor f=4 so the recorded row
        # matches what `--preset turbo` actually serves).
        "serving": dict(PRESETS["serving"]),
        "turbo": dict(PRESETS["turbo"]),
        # nearest-tap merged-map fetch: 1 gather row per (sample, view)
        # instead of the 2x2 bilinear window (resample.nearest_sample) —
        # halves the fetched DRAM segments of the dominant frame cost
        "nearest": {**PRESETS["serving"], "gather_nearest": True},
        # nearest on the COARSE pass only: the coarse pass just places
        # fine samples, so its taps can be crude while the fine pass
        # keeps bilinear fidelity (needs per-pass flags — approximated
        # here by full-nearest vs serving delta attribution)
        "nearest_f48": {**PRESETS["serving"], "gather_nearest": True,
                        "fine_depth_sample_num": 48},
        # serving at a reduced FINE sample count.  MEASURED (r5, trained
        # 300-step ckpt): collapses — serving_f48 7.2 / serving_f32 6.4
        # PSNR vs 30.8 at the trained 64, with strides/dmap/bf16 ruled
        # out by isolation and exact numerics equally broken; r3's
        # coarse16 (-5.8 dB) was the same effect on the coarse count.
        # Sample counts are TRAIN-TIME knobs: train at the count you
        # serve (same lesson as the DINER train/serve mismatch,
        # AB_DINER_r4.json).
        "serving_f48": {"fast_gather": True, "compute_dtype": "bfloat16",
                        "gather_stride": 4, "gather_stride_fine": 16,
                        "decode_on_map": True, "gather_depth_major": True,
                        "coarse_geometry_only": True,
                        "fine_depth_sample_num": 48},
        "serving_f32": {"fast_gather": True, "compute_dtype": "bfloat16",
                        "gather_stride": 4, "gather_stride_fine": 16,
                        "decode_on_map": True, "gather_depth_major": True,
                        "coarse_geometry_only": True,
                        "fine_depth_sample_num": 32},
        # both passes reduced (coarse importance AND fine integration)
        "serving_c48f48": {"fast_gather": True, "compute_dtype": "bfloat16",
                           "gather_stride": 4, "gather_stride_fine": 16,
                           "decode_on_map": True,
                           "gather_depth_major": True,
                           "coarse_geometry_only": True,
                           "depth_sample_num": 48,
                           "fine_depth_sample_num": 48},
        "diner": {"fast_gather": True, "compute_dtype": "bfloat16"},
        # the reference's DINER development traces use 1000 candidates
        # (original_depth_guided_sample.py inline shapes); at 128 the
        # 0.05 m validity window is wider than the candidate spacing and
        # most rays fall back to uniform fill
        "diner1000": {"fast_gather": True, "compute_dtype": "bfloat16"},
    }
    # DINER mode grammar: diner[N][_muK | _cuK] — N candidates (default
    # 128), _muK merges a separate K-sample uniform pass (reference
    # merge_uniform_diner), _cuK unions K uniform samples pre-render
    # (reference contain_uniform).
    import re as _re
    for mode in args.modes.split(","):
        m = _re.fullmatch(r"diner(\d*)(?:_(mu|cu)(\d+))?", mode)
        if m and mode not in mode_cfgs:
            mode_cfgs[mode] = {"fast_gather": True,
                               "compute_dtype": "bfloat16"}
        # clr<f>[_fN]: the serving preset with the COARSE pass on an
        # (H/f, W/f) ray grid, hit-prob bilinearly upsampled to drive the
        # full-res fine pass (full_render.render_image_device
        # coarse_lowres); optional _fN serves N fine samples (pair with a
        # --count-jitter or native-count ckpt — see serving_f* collapse)
        g = _re.fullmatch(r"clr(\d+)(?:_f(\d+))?", mode)
        if g and mode not in mode_cfgs:
            mode_cfgs[mode] = dict(PRESETS["serving"])
            if g.group(2):
                mode_cfgs[mode]["fine_depth_sample_num"] = int(g.group(2))
    # NOTE: 'light_coarse' now decodes the FULL-res upsampled map under
    # fast_gather (renderer.prepare_ref); the recorded -6.9 dB was the
    # 1/4-res variant — re-run before citing.
    scenes = []
    for i in range(args.num):
        s = make_three_view_sample(SphereScene.random(9000 + i), H, W,
                                   args.m3d_dist, seed=100 + i)
        scenes.append(s)

    table = {}
    for mode in args.modes.split(","):
        model = make_model(**mode_cfgs[mode])
        vals = []
        for s in scenes:
            ref_info = imgs_info.build_imgs_info(
                s, imgs_info.REF_IDS, (0.5, 15.0))
            ref_info["mvs_depth"] = resize_linear(
                s["depth_panos"][jnp.asarray(imgs_info.REF_IDS)],
                (DH, DW), axes=(1, 2))
            q = imgs_info.QUE_ID
            c2w = imgs_info.c2w_from_w2c(
                imgs_info.pose_w2c(s["rots"], s["trans"])[q][None])[0]
            if mode.startswith("diner"):
                g = _re.fullmatch(r"diner(\d*)(?:_(mu|cu)(\d+))?", mode)
                n_cand = int(g.group(1)) if g.group(1) else 128
                n_uni = int(g.group(3)) if g.group(2) == "mu" else 0
                c_uni = int(g.group(3)) if g.group(2) == "cu" else 0
                ref_data = full_render.prepare_ref_data(model, params,
                                                        ref_info)
                ref_data["mvs_depth"] = ref_info["mvs_depth"]
                ref_data["mvs_uncert"] = 0.04 * jnp.ones_like(
                    ref_info["mvs_depth"])
                rgb = full_render.render_image_device(
                    model, params, ref_data, c2w,
                    jnp.asarray([[0.5, 15.0]]), ref_info["depth_range"],
                    chunk=min(2048, H * W), mode="diner",
                    n_candidates=n_cand, n_uniform=n_uni,
                    contain_uniform=c_uni)
                out = {"rgb": rgb}
            elif mode.startswith("clr") or mode == "turbo":
                from panogrf_tpu.renderer.presets import \
                    PRESET_COARSE_LOWRES
                f = (int(_re.fullmatch(r"clr(\d+)(?:_f\d+)?",
                                       mode).group(1))
                     if mode.startswith("clr")
                     else PRESET_COARSE_LOWRES["turbo"])
                ref_data = full_render.prepare_ref_data(model, params,
                                                        ref_info)
                rgb = full_render.render_image_device(
                    model, params, ref_data, c2w,
                    jnp.asarray([[0.5, 15.0]]), ref_info["depth_range"],
                    chunk=min(2048, H * W), coarse_lowres=f)
                out = {"rgb": rgb}
            else:
                out = full_render.render_image(
                    model, params, ref_info, c2w,
                    jnp.asarray([[0.5, 15.0]]), chunk=min(8192, H * W))
            m = M.render_metrics(out["rgb"], s["rgb_panos"][q])
            vals.append({k: float(v) for k, v in m.items()})
        table[mode] = {k: round(float(np.mean([v[k] for v in vals])), 4)
                       for k in vals[0]}
        print(f"{mode:14s} " + " ".join(f"{k}={v:.3f}"
                                        for k, v in table[mode].items()))

    if args.out:
        Path(args.out).write_text(json.dumps(table, indent=2))
    print(json.dumps(table))


if __name__ == "__main__":
    main()
