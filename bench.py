"""Headline benchmark: novel 512x1024 pano render, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.md north-star of 1.0 s/frame at 512x1024 on one
v5e chip (the reference never measures throughput; its render loop pushes
4096-8192-ray batches through a Python loop, ``render.py:101,414``).
``vs_baseline`` = baseline_seconds / ours (>1 means faster than target).

Timing methodology: on this box the TPU is reached through a tunnel where
``block_until_ready`` does not actually block and bulk host transfers run
at ~30 MB/s, so we chain K whole-frame renders on device, reduce to one
scalar, fetch it (forcing completion), and subtract the measured RTT.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent XLA compile cache: the frame program recompiles per
# (chunk, stride, dtype) point and this box has one CPU core — cache
# compiled executables on disk so sweeps/re-runs skip XLA (same setup as
# tests/conftest.py; delete the dir to force a cold compile).
jax.config.update("jax_compilation_cache_dir", "/tmp/panogrf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    ap = argparse.ArgumentParser()
    # The blessed operating points live in panogrf_tpu/renderer/presets.py
    # (exact / serving / turbo); individual flags below OVERRIDE the
    # preset when given explicitly.
    ap.add_argument("--preset", default="serving",
                    choices=["exact", "serving", "turbo"])
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--coarse-chunk", type=int, default=None,
                    help="ray-chunk size for the lowres coarse pass only "
                         "(default: the preset's; 0 = same as --chunk). "
                         "Bit-exact blocking knob — the lowres grid has "
                         "1/f^2 the rays, so a larger coarse chunk "
                         "re-batches its latency-bound agg matmuls")
    ap.add_argument("--no-fast-gather", dest="fast_gather",
                    action="store_false", default=None)
    ap.add_argument("--diner", action="store_true",
                    help="depth-guided (DINER) sampling operating point: "
                         "64 guided samples, no fine pass — the "
                         "reference's own low-sample mode")
    # light_coarse measured -6.9 dB PSNR on the trained-checkpoint A/B
    # (AB_QUALITY_r3.json) -> opt-in only.
    ap.add_argument("--light-coarse", dest="light_coarse",
                    action="store_true", default=False,
                    help="proxy coarse pass (importance from the decoded "
                         "NeuRay stats map; -6.9 dB on the quality A/B — "
                         "see tools/ab_quality.py)")
    ap.add_argument("--proxy-samples", type=int, default=0,
                    help="coarse sample count for the proxy pass "
                         "(0 = depth_sample_num)")
    ap.add_argument("--no-depth-major", dest="depth_major",
                    action="store_false", default=None,
                    help="gather rows in (ray, sample) order instead of "
                         "the (sample, ray) near-sequential order")
    ap.add_argument("--gather-stride", type=int, default=None,
                    help="fetch merged-map rows at every S-th depth sample "
                         "and interpolate in between (epipolar feature "
                         "interpolation; quality A/B in tools/ab_quality)")
    ap.add_argument("--gather-stride-fine", type=int, default=None,
                    help="separate stride for the fine pass "
                         "(0 = same as --gather-stride)")
    ap.add_argument("--gather-nearest", dest="gather_nearest",
                    action="store_true", default=None,
                    help="nearest-tap merged-map fetch (1 row/point "
                         "instead of the 2x2 bilinear window; quality "
                         "A/B in tools/ab_quality, mode 'nearest')")
    ap.add_argument("--coarse-lowres", type=int, default=None,
                    help="run the coarse importance pass on an (H/f, W/f) "
                         "ray grid and bilinearly upsample its hit-prob "
                         "to drive the full-res fine pass (default: the "
                         "preset's factor — serving f=2, turbo f=4; "
                         "quality A/B AB_QUALITY_r5.json clr2/clr4)")
    ap.add_argument("--no-decode-on-map", dest="decode_on_map",
                    action="store_false", default=None,
                    help="disable decode-on-map (per-sample dist-decoder "
                         "MLPs instead of stats gathered with the row)")
    ap.add_argument("--fine-samples", type=int, default=0,
                    help="fine-pass sample count (0 = preset).  WARNING: "
                         "eval counts different from the trained 64 "
                         "collapse quality (AB_QUALITY_r5 serving_f48 "
                         "7.2 PSNR) — train at the count you serve")
    ap.add_argument("--coarse-samples", type=int, default=0,
                    help="coarse-pass sample count (0 = 64); same "
                         "train-time-knob warning as --fine-samples "
                         "(r3 coarse16 -5.8 dB)")
    ap.add_argument("--video-batch", type=int, default=0,
                    help="also time the pose-path serving shape: B frames "
                         "per dispatch (full_render.render_video_device), "
                         "reported as video_ms_per_frame (amortized)")
    ap.add_argument("--no-coarse-geometry-only", dest="coarse_geo_only",
                    action="store_false", default=None,
                    help="keep the coarse pass's (discarded) RGB head")
    ap.add_argument("--with-depth-stack", action="store_true",
                    help="also time the per-scene cost: frozen mono+MVS "
                         "depth inference + reference-view encoding "
                         "(amortized across all frames of a scene; "
                         "reported as scene_prep_ms)")
    ap.add_argument("--no-roofline", dest="roofline", action="store_false",
                    default=True,
                    help="skip the per-stage MFU/roofline measurement")
    ap.add_argument("--ablate", default="",
                    choices=["", "agg", "gather", "agg+gather", "attn"],
                    help="MEASUREMENT-ONLY stage ablation: time the frame "
                         "with the aggregation (or the merged-map row "
                         "fetch) replaced by a trivial stand-in — the "
                         "delta vs the un-ablated frame attributes "
                         "in-context stage cost (output image is garbage)")
    args = ap.parse_args()
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.renderer import full_render
    from panogrf_tpu.renderer.presets import (preset_kwargs, PRESET_CHUNK,
                                              PRESET_COARSE_LOWRES)

    H, W = 512, 1024
    DH, DW = 256, 512
    rfn = 2
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu:  # keep CI sane; the driver runs this on the real chip
        H, W, DH, DW = 64, 128, 32, 64

    kw = preset_kwargs(
        args.preset,
        fast_gather=args.fast_gather,
        gather_depth_major=args.depth_major,
        gather_stride=args.gather_stride,
        gather_stride_fine=args.gather_stride_fine,
        gather_nearest=args.gather_nearest,
        decode_on_map=args.decode_on_map,
        coarse_geometry_only=(args.coarse_geo_only and not args.diner)
        if (args.coarse_geo_only is not None or args.diner) else None,
        fine_depth_sample_num=args.fine_samples or None,
        depth_sample_num=args.coarse_samples or None,
        compute_dtype="float32" if on_cpu else None)
    if args.diner:
        kw["coarse_geometry_only"] = False
    model = NeuralRayGenRenderer(
        height=H, width=W, depth_hw=(DH, DW),
        light_coarse=args.light_coarse and not args.diner,
        coarse_proxy_samples=args.proxy_samples,
        ablate=args.ablate,
        **kw)
    rng = np.random.default_rng(0)
    ref_info = {
        "imgs": jnp.asarray(rng.uniform(size=(rfn, H, W, 3)), jnp.float32),
        "mvs_depth": jnp.asarray(rng.uniform(1.0, 6.0, size=(rfn, DH, DW, 1)),
                                 jnp.float32),
        "depth_range": jnp.asarray([[0.5, 15.0]] * rfn),
        "w2c": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
            (rfn, 3, 4)).at[1, 2, 3].set(1.0),
    }
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {
                "coords": jnp.zeros((1, 8, 2)),
                "c2w": jnp.concatenate([jnp.eye(3),
                                        jnp.asarray([[0.], [0.], [0.5]])], 1),
                "depth_range": jnp.asarray([[0.5, 15.0]]),
            }}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)

    c2w = data["que_imgs_info"]["c2w"]
    qdr = data["que_imgs_info"]["depth_range"]
    # Chunk sweeps move as the pipeline slims: round-2 (pre-stride,
    # pre-decode-on-map) optimum was 128 (3.43 s); at the round-4 serving
    # point (stride 4/16 + decode-on-map + base_fc row-block split) the
    # re-sweep gave 128->1402, 256->1340, 512->1311 (opt), 1024->1441 ms.
    chunk = args.chunk or PRESET_CHUNK[args.preset]
    from panogrf_tpu.renderer.presets import PRESET_COARSE_CHUNK
    cchunk = (args.coarse_chunk if args.coarse_chunk is not None
              else PRESET_COARSE_CHUNK[args.preset])

    ref_data = full_render.prepare_ref_data(model, params, ref_info)
    mode = "diner" if args.diner else "hierarchical"
    # low-res coarse factor: explicit flag wins, else the preset's; the
    # diner / light-coarse paths have no standard coarse pass (ablation
    # stand-ins DO compose — attribution stays at the shipped point)
    clr = (args.coarse_lowres if args.coarse_lowres is not None
           else PRESET_COARSE_LOWRES[args.preset])
    if args.diner or args.light_coarse:
        clr = 1
    if args.diner:
        ref_data["mvs_depth"] = ref_info["mvs_depth"]
        ref_data["mvs_uncert"] = 0.04 * jnp.ones_like(
            ref_info["mvs_depth"])

    @jax.jit
    def frame_sum(ref_data, c2w):
        rgb = full_render.render_image_device(
            model, params, ref_data, c2w, qdr, ref_info["depth_range"],
            chunk=chunk, mode=mode, coarse_lowres=clr,
            coarse_chunk=cchunk)
        return rgb.sum()

    # warmup / compile
    _ = float(frame_sum(ref_data, c2w))
    # RTT of a trivial fetch
    rtts = []
    trivial = jax.jit(lambda x: x.sum())
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(trivial(qdr))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    times = []
    for i in range(3):
        c = c2w.at[2, 3].add(0.001 * i)  # avoid any result caching
        t0 = time.perf_counter()
        _ = float(frame_sum(ref_data, c))
        times.append(time.perf_counter() - t0)
    sec = max(min(times) - rtt, 1e-9)

    rays_per_sec = H * W / sec
    baseline_sec = 1.0 * (H * W) / (512 * 1024)  # scale target with size
    name = "novel_pano_render_512x1024" if not on_cpu \
        else f"novel_pano_render_{H}x{W}_cpu"
    if args.diner:
        name += "_diner"
    if args.preset != "serving":
        name += f"_{args.preset}"
    if args.ablate:
        name += f"_ablate_{args.ablate}"
    if args.coarse_lowres is not None and \
            clr != PRESET_COARSE_LOWRES[args.preset]:
        name += f"_clr{clr}"
    result = {
        "metric": name,
        "value": round(sec * 1000.0, 2),
        "unit": "ms/frame",
        "vs_baseline": round(baseline_sec / sec, 3),
        "rays_per_sec": int(rays_per_sec),
    }

    if (args.preset == "serving" and not args.ablate and not args.diner
            and not args.light_coarse and args.coarse_lowres is None
            and not args.fine_samples and not args.coarse_samples
            and args.chunk is None and args.coarse_chunk is None):
        # the default run also records the turbo point (same model +
        # params — turbo is serving with the coarse pass at f=4, a
        # render-path knob; A/B AB_QUALITY_r5.json clr4/steps2000_clr4)
        @jax.jit
        def frame_sum_turbo(ref_data, c2w):
            rgb = full_render.render_image_device(
                model, params, ref_data, c2w, qdr,
                ref_info["depth_range"], chunk=PRESET_CHUNK["turbo"],
                coarse_lowres=PRESET_COARSE_LOWRES["turbo"])
            return rgb.sum()
        _ = float(frame_sum_turbo(ref_data, c2w))
        tt = []
        for i in range(3):
            c = c2w.at[2, 3].add(0.001 * (i + 7))
            t0 = time.perf_counter()
            _ = float(frame_sum_turbo(ref_data, c))
            tt.append(time.perf_counter() - t0)
        result["turbo_ms_per_frame"] = round(
            max(min(tt) - rtt, 1e-9) * 1000.0, 2)

    if args.video_batch:
        # pose-path serving: B frames per dispatch through
        # full_render.render_video_device (chunk body vmapped over poses,
        # merged maps shared; per-frame output bit-exact to the
        # single-frame path) — reported as amortized ms/frame
        B = args.video_batch
        c2ws = jnp.stack([c2w.at[2, 3].add(0.01 * i) for i in range(B)])

        @jax.jit
        def frame_sum_video(ref_data, c2ws):
            rgb = full_render.render_video_device(
                model, params, ref_data, c2ws, qdr,
                ref_info["depth_range"], chunk=chunk, coarse_lowres=clr,
                coarse_chunk=cchunk)
            return rgb.sum()

        _ = float(frame_sum_video(ref_data, c2ws))
        tv = []
        for i in range(3):
            cs = c2ws.at[:, 2, 3].add(0.001 * (i + 3))
            t0 = time.perf_counter()
            _ = float(frame_sum_video(ref_data, cs))
            tv.append(time.perf_counter() - t0)
        result["video_ms_per_frame"] = round(
            max(min(tv) - rtt, 1e-9) * 1000.0 / B, 2)
        result["video_batch"] = B

    if args.roofline and not args.diner and not args.ablate:
        # MFU/roofline accounting (utils/roofline.py): measure the two
        # dominant stages in isolation at the serving chunk and price them
        # against the chip's published peaks + the measured gather-row
        # latency model.  agg stage = prob-embed->pool->attention->heads;
        # gather stage = the strided merged-map row fetches of both passes.
        from panogrf_tpu.utils import roofline as rl
        from panogrf_tpu.renderer.agg_net import DefaultAggregationNet
        from panogrf_tpu.ops.resample import interpolate_feats_pointmajor

        def time_chain(step, init, iters=128):
            # The frame loop runs its chunks via lax.map inside ONE jit,
            # so per-chunk dispatch costs nothing there — time stages the
            # same way: iterate the (data-dependent) step on-device with
            # fori_loop, one dispatch total, and amortize the tunnel RTT
            # over all iterations.  (The first version of this harness
            # host-dispatched 4 iterations; the ~35 ms RTT per call made
            # the stage "times" exceed the whole frame.)
            @jax.jit
            def run(o):
                o = jax.lax.fori_loop(0, iters, lambda i, t: step(t), o)
                return sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree.leaves(o))
            _ = float(run(init))                 # compile + warm
            t0 = time.perf_counter()
            _ = float(run(init))
            dt = time.perf_counter() - t0
            return max((dt - rtt) / iters, 1e-9)

        dn = kw.get("fine_depth_sample_num", 64)
        cdt = jnp.dtype(kw["compute_dtype"])
        rng2 = np.random.default_rng(1)
        f0 = jnp.asarray(rng2.normal(size=(1, chunk, dn, rfn, 32)) * 0.3,
                         cdt)
        prj = {"ray_feats": f0, "rgb": f0[..., :3], "img_feats": f0,
               "dir": f0[..., :3].astype(jnp.float32),
               "hit_prob": f0[..., :1], "vis": f0[..., :1],
               "alpha": f0[..., :1]}
        qd = jnp.ones((1, chunk, dn, 3), cdt)
        agg = DefaultAggregationNet(n_samples=dn)
        avars = jax.jit(agg.init)(jax.random.PRNGKey(0), prj, qd)

        def g_agg(p):
            density, _ = agg.apply(avars, p, qd)
            upd = (1e-6 * density[..., None, None]).astype(cdt)
            return {k: v + upd.astype(v.dtype) if v.shape[-1] == 1 else v
                    for k, v in p.items()}

        agg_chunk_s = time_chain(g_agg, prj)

        row_ch = 3 + 64 + (10 if kw["decode_on_map"] else 0)
        merged = jnp.asarray(rng2.uniform(size=(rfn, H, W, row_ch)), cdt)
        s_c, s_f = kw["gather_stride"], (kw["gather_stride_fine"]
                                         or kw["gather_stride"])
        # REAL projected coordinates (not random points): gather latency
        # is DRAM-locality-bound, so the stage must see the depth-major
        # near-sequential access pattern the frame actually produces —
        # project one real chunk's strided coarse+fine samples exactly
        # like render_ops.project_points_dict does.
        from panogrf_tpu.core.sphere import get_convention
        from panogrf_tpu.renderer import render_ops as ro
        conv = get_convention("m3d")

        def real_rows(dn_pass, s):
            cds = jnp.stack(
                [jnp.arange(chunk, dtype=jnp.float32) % W,
                 jnp.arange(chunk, dtype=jnp.float32) // W + H // 3],
                -1)[None]
            qd_, _ = ro.sample_depth(1, chunk, dn_pass, 0.5, 15.0, True)
            pts, _ = ro.depth2points_spherical(
                cds, qd_, c2w, conv.ray_directions(H, W))
            pts = jnp.swapaxes(pts, 1, 2)[..., ::s, :, :]     # depth-major
            flat = pts.reshape(-1, 3)
            cam = (jnp.einsum("vij,pj->pvi",
                              ref_info["w2c"][:, :, :3], flat)
                   + ref_info["w2c"][None, :, :, 3])
            xy, _ = conv.project_to_pixels(cam, H, W)
            return jnp.swapaxes(xy, 0, 1)                     # (rfn, n, 2)

        # at lowres factor f the coarse pass fetches 1/f^2 of the rows —
        # keep the same chunk mix by truncating the coarse share
        rc = real_rows(64, s_c)
        rc = rc[:, : max(rc.shape[1] // (clr * clr), 1)]
        pts0 = jnp.concatenate([rc, real_rows(dn, s_f)], axis=1)

        def g_gather(pts):
            v = interpolate_feats_pointmajor(merged, pts, H, W)
            return pts + v[..., 0].astype(jnp.float32).mean() * 1e-9

        gather_chunk_s = time_chain(g_gather, pts0)

        n_chunks = H * W / chunk
        # frame agg time: the coarse pass is geometry_only (slightly
        # cheaper than the timed full pass) — treat both as the timed
        # one; at lowres factor f the coarse pass runs on 1/f^2 rays
        agg_s = agg_chunk_s * n_chunks * (1 + 1 / (clr * clr))
        gather_s = gather_chunk_s * n_chunks
        fm = rl.frame_model(H, W, dn_fine=dn, stride=s_c, stride_fine=s_f,
                            v=rfn, lowres_coarse=clr,
                            dtype=kw["compute_dtype"])
        ach = rl.achieved(fm, agg_s, gather_s)
        result.update({
            "agg_ms": round(agg_s * 1000, 1),
            "gather_ms": round(gather_s * 1000, 1),
            "agg_tflops": round(fm["agg_flops"] / 1e12, 3),
            "agg_mfu": round(ach["agg_mfu"], 4),
            "agg_hbm_frac": round(ach["agg_hbm_frac"], 3),
            "gather_rows_M": round(fm["gather_rows"] / 1e6, 1),
            "gather_hbm_frac": round(ach["gather_hbm_frac"], 3),
            "gather_latency_model_frac": [
                round(x, 2) for x in ach["gather_latency_model_frac"]],
        })

    if args.with_depth_stack:
        # Per-SCENE cost the frame loop amortizes: frozen UniFuse + MVS
        # depth inference and reference-view encoding (prepare_ref).
        from panogrf_tpu.models.depth_stack import DepthStack
        from panogrf_tpu.models.unifuse import UniFuse
        from panogrf_tpu.models.mvs import MVSDepthModel
        mono = UniFuse()
        mvs = MVSDepthModel()
        # UniFuse needs >= 128x256 for its deepest cube->ERP level
        mono_hw = (max(H, 128), max(W, 256))
        equi0 = ref_info["imgs"][:1]
        from panogrf_tpu.core import cubemap as _cm
        cube0 = jax.vmap(lambda e: _cm.equi_to_cube(e, H // 2))(equi0)
        mono_params = jax.jit(mono.init)(jax.random.PRNGKey(1), equi0,
                                         cube0)
        panos0 = jnp.zeros((1, 2, DH, DW, 3))
        rots0 = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
        trans0 = jnp.zeros((1, 2, 3))
        mdep0 = jnp.ones((1, mono_hw[0], mono_hw[1], 1))
        mfeat0 = jnp.zeros((1, mono_hw[0] // 2, mono_hw[1] // 2, 32))
        mvs_params = jax.jit(mvs.init)(jax.random.PRNGKey(2), panos0,
                                       rots0, trans0, mdep0, mfeat0)
        src_imgs = jnp.flip(ref_info["imgs"], axis=0)
        src_w2c = jnp.flip(ref_info["w2c"], axis=0)

        # params must be jit ARGUMENTS: closed-over trees get embedded as
        # HLO constants and blow the tunnel's compile-request size limit
        @jax.jit
        def prep_sum(imgs, mono_p, mvs_p, render_p):
            stack = DepthStack(mono, mono_p, mvs, mvs_p,
                               mono_hw=mono_hw, depth_hw=(DH, DW))
            d = stack(imgs, src_imgs, ref_info["w2c"], src_w2c)
            ref = model.apply(render_p, imgs, d["mvs_depth"],
                              method=NeuralRayGenRenderer.prepare_ref)
            return sum(jnp.sum(v.astype(jnp.float32))
                       for v in jax.tree.leaves(ref)) + jnp.sum(
                           d["mvs_depth"])

        _ = float(prep_sum(ref_info["imgs"], mono_params, mvs_params,
                           params))  # compile
        times = []
        for i in range(3):
            imgs_i = ref_info["imgs"] + 1e-6 * i
            t0 = time.perf_counter()
            _ = float(prep_sum(imgs_i, mono_params, mvs_params, params))
            times.append(time.perf_counter() - t0)
        result["scene_prep_ms"] = round(
            (max(min(times) - rtt, 1e-9)) * 1000.0, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
