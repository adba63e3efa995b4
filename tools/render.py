"""Render novel panoramas + metrics (reference ``render.py`` + ``eval.py``).

Renders the query view of held-out synthetic (or shard) samples with a
trained renderer checkpoint, writes pred/gt images, and prints
PSNR / SSIM / WS-PSNR — the reference's metric stack (``eval.py:22-31``)
minus LPIPS (no pretrained VGG in this image; see train/metrics.py).

Usage:
  python tools/render.py --ckpt data/model/run/latest --num 4 \
      [--height 256 --width 512] [--out data/render_out] \
      [--shards data/shards/test] [--lpips-weights lpips_vgg.npz]

Already-written frames are skipped for idempotent restarts (reference
``render.py:250-254``).  With ``--shards`` the scenes come from a shard
dataset (e.g. imported reference LMDB data) instead of procedural ones.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def save_image(path: Path, img) -> None:
    arr = np.asarray(np.clip(np.asarray(img) * 255.0, 0, 255), np.uint8)
    try:
        import imageio.v2 as imageio
        imageio.imwrite(path, arr)
    except Exception:
        np.save(path.with_suffix(".npy"), arr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--num", type=int, default=2)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--depth-height", type=int, default=128)
    ap.add_argument("--depth-width", type=int, default=256)
    ap.add_argument("--m3d-dist", type=float, default=0.5)
    ap.add_argument("--out", default="data/render_out")
    ap.add_argument("--pose-type", default="eval", choices=["eval", "inter"],
                    help="'eval': held-out query view (with metrics); "
                         "'inter': interpolated path between refs (video)")
    ap.add_argument("--inter-num", type=int, default=12)
    ap.add_argument("--frame-batch", type=int, default=4,
                    help="pose-path frames rendered together per dispatch "
                         "(full_render.render_video_device: the chunk "
                         "body is vmapped over poses, so the "
                         "latency-bound agg matmuls run at B x the rows "
                         "while the merged maps are shared; per-frame "
                         "output is bit-exact).  1 = the per-frame path")
    ap.add_argument("--shards", default=None,
                    help="render scenes from this shard dir (real data)")
    ap.add_argument("--lpips-weights", default=None)
    ap.add_argument("--no-skip", action="store_true",
                    help="re-render frames even if the file exists")
    # Serving configuration: the blessed operating points live in
    # panogrf_tpu/renderer/presets.py (exact / serving / turbo); the
    # individual flags below OVERRIDE the preset when given explicitly.
    ap.add_argument("--preset", default="serving",
                    choices=["exact", "serving", "turbo"],
                    help="named operating point (renderer/presets.py): "
                         "'exact' = reference-exact numerics (float32, "
                         "per-map gathers); 'serving' = the shipped "
                         "quality-neutral point (-0.03 dB A/B); 'turbo' "
                         "= fastest documented usable point")
    ap.add_argument("--exact", action="store_true",
                    help="alias for --preset exact (kept for round-2/3 "
                         "command lines)")
    ap.add_argument("--gather-stride", type=int, default=None,
                    help="override the preset's epipolar feature "
                         "interpolation stride (fetch map rows every "
                         "S-th sample, lerp in between; -0.04 dB at S=4 "
                         "on the trained-checkpoint A/B)")
    ap.add_argument("--gather-stride-fine", type=int, default=None,
                    help="override the preset's fine-pass stride "
                         "(0 = same as --gather-stride)")
    ap.add_argument("--no-decode-on-map", dest="decode_on_map",
                    action="store_false", default=None,
                    help="disable decode-on-map (dist-decoder heads "
                         "precomputed on the map, -0.03 dB on the A/B)")
    ap.add_argument("--coarse-lowres", type=int, default=None,
                    help="low-res coarse importance factor f: coarse "
                         "pass on an (H/f, W/f) ray grid, hit-prob "
                         "upsampled to drive the full-res fine pass "
                         "(default: the preset's — serving f=2, turbo "
                         "f=4; A/B AB_QUALITY_r5.json clr2/clr4)")
    ap.add_argument("--mono-ckpt", default=None,
                    help="UniFuse checkpoint (orbax dir or torch .pth) — "
                         "enables the composed mono->MVS->renderer "
                         "pipeline: NO ground-truth depth is consumed")
    ap.add_argument("--mvs-ckpt", default=None,
                    help="MVS checkpoint (orbax dir or torch .pth)")
    ap.add_argument("--wo-stereo", action="store_true",
                    help="mono-only init path (reference wo_stereo): skip "
                         "the MVS net, resize mono depth")
    ap.add_argument("--depth-stack", action="store_true",
                    help="run the depth stack even without checkpoints "
                         "(random weights; smoke/debug only)")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="shard the pano's rays across an N-device "
                         "('data','ray') mesh — each chip renders H*W/N "
                         "rays, the only collective is the image gather "
                         "(SURVEY §2.8; with --cpu this uses N virtual "
                         "CPU devices)")
    ap.add_argument("--samples", type=int, default=0,
                    help="coarse sample count (0 = preset's 64).  Sample "
                         "counts are TRAIN-time knobs: only pass this to "
                         "serve a ckpt TRAINED at the same count "
                         "(AB_QUALITY_r5.json serving_f*/native* — a "
                         "64-trained ckpt collapses at other counts)")
    ap.add_argument("--fine-samples", type=int, default=0,
                    help="fine sample count (0 = preset's 64); same "
                         "matched-ckpt requirement as --samples.  A "
                         "64+32-trained ckpt serves at 472 ms/frame vs "
                         "690 at 64+64 (-0.8 dB, AB_QUALITY_r5 native*)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="rays per jitted chunk for the on-device render "
                         "path (0 = the preset's swept optimum, "
                         "presets.PRESET_CHUNK; bit-exact blocking knob)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.exact:
        args.preset = "exact"

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        if args.mesh:
            jax.config.update("jax_num_cpu_devices", args.mesh)
    import jax
    import jax.numpy as jnp

    from panogrf_tpu.data import imgs_info
    from panogrf_tpu.data.synthetic import (SphereScene,
                                            make_three_view_sample)
    from panogrf_tpu.nn.blocks import resize_linear
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.renderer import full_render
    from panogrf_tpu.train import metrics as M

    from panogrf_tpu.renderer.presets import (preset_kwargs,
                                              PRESET_CHUNK,
                                              PRESET_COARSE_CHUNK,
                                              PRESET_COARSE_LOWRES)

    H, W = args.height, args.width
    DH, DW = args.depth_height, args.depth_width
    kw = preset_kwargs(args.preset,
                       gather_stride=args.gather_stride,
                       gather_stride_fine=args.gather_stride_fine,
                       decode_on_map=args.decode_on_map,
                       depth_sample_num=args.samples or None,
                       fine_depth_sample_num=args.fine_samples or None,
                       compute_dtype="float32" if args.cpu else None)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW), **kw)
    clr = (args.coarse_lowres if args.coarse_lowres is not None
           else PRESET_COARSE_LOWRES[args.preset])
    if H % clr or W % clr:
        print(f"coarse-lowres {clr} does not divide {H}x{W}; disabling")
        clr = 1

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    # one sample to init/restore params
    scene = SphereScene.random(1234)
    s = make_three_view_sample(scene, H, W, args.m3d_dist, seed=0)
    coords = imgs_info.sample_train_coords(np.random.default_rng(0), H, W, 8)
    data0 = imgs_info.build_render_sample(s, coords)
    data0["ref_imgs_info"]["mvs_depth"] = resize_linear(
        s["depth_panos"][jnp.asarray(imgs_info.REF_IDS)], (DH, DW),
        axes=(1, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data0)
    if args.ckpt:
        from panogrf_tpu.train.trainer import load_checkpoint_params
        params = load_checkpoint_params(args.ckpt)
        print(f"restored {args.ckpt}")

    mesh = None
    if args.mesh:
        from panogrf_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)
        print(f"rendering on mesh {dict(mesh.shape)}")

    from panogrf_tpu.renderer import poses as P

    lpips_score = None
    if args.lpips_weights:
        from panogrf_tpu.train import lpips as L
        lpips_score = L.lpips_fn(L.load_lpips_weights(args.lpips_weights))

    reader = None
    if args.shards:
        from panogrf_tpu.data.shards import ShardReader
        reader = ShardReader(args.shards)

    # Composed pipeline (reference render.py:148-160 + init_net.py:233-336):
    # the frozen mono(+MVS) stack predicts every reference view's depth —
    # GT depth is NOT consumed anywhere on this path.
    stack_fn = None
    use_stack = bool(args.mono_ckpt or args.mvs_ckpt or args.wo_stereo
                     or args.depth_stack)
    if use_stack:
        from panogrf_tpu.models.depth_stack import (load_depth_stack,
                                                    stack_depth_for_sample)
        stack = load_depth_stack(
            args.mono_ckpt, args.mvs_ckpt,
            # UniFuse's cube fusion needs W >= 128 (1/32-scale ERP)
            mono_hw=(max(H, 64), max(W, 128)),
            # MVS UNet needs >= 32 rows; output is resized to (DH, DW)
            depth_hw=(max(DH, 32), max(DW, 64)), wo_stereo=args.wo_stereo)
        stack_fn = stack.jitted()
        print(f"depth stack: mono={args.mono_ckpt or 'random'} "
              f"mvs={args.mvs_ckpt or ('-' if stack.mvs_model is None else 'random')}")

    all_m = []
    num = min(args.num, len(reader)) if reader is not None else args.num
    for qi in range(num):
        # idempotent restart: skip frames already on disk (reference
        # render.py:250-254) — checked BEFORE the (expensive) scene build
        if not args.no_skip and args.pose_type == "eval" and \
                (out_dir / f"{qi}-nr_fine.png").exists():
            print(f"[{qi}] exists, skipping")
            continue
        if reader is not None:
            s = {k: jnp.asarray(v) for k, v in reader[qi].items()}
        else:
            scene = SphereScene.random(9000 + qi)
            s = make_three_view_sample(scene, H, W, args.m3d_dist,
                                       seed=100 + qi)
        data = imgs_info.build_render_sample(s, coords)
        ref_info = data["ref_imgs_info"]
        if stack_fn is not None:
            pred = stack_depth_for_sample(stack_fn, s,
                                          imgs_info.REF_IDS,
                                          imgs_info.SRC_IDS)
            ref_info["mvs_depth"] = resize_linear(
                pred["mvs_depth"], (DH, DW), axes=(1, 2))
            if "mvs_uncert" in pred:
                ref_info["mvs_uncert"] = resize_linear(
                    pred["mvs_uncert"], (DH, DW), axes=(1, 2))
        else:
            ref_info["mvs_depth"] = resize_linear(
                s["depth_panos"][jnp.asarray(imgs_info.REF_IDS)], (DH, DW),
                axes=(1, 2))

        if args.pose_type == "inter":
            w2c_all = np.asarray(imgs_info.pose_w2c(s["rots"], s["trans"]))
            c2w_all = np.asarray(imgs_info.c2w_from_w2c(
                jnp.asarray(w2c_all)))
            path = P.prepare_render_info(c2w_all, "inter",
                                         inter_num=args.inter_num)
            ref_data = full_render.prepare_ref_data(model, params, ref_info)
            qdr = data["que_imgs_info"]["depth_range"]
            chunk = args.chunk or PRESET_CHUNK[args.preset]
            while (H * W) % chunk:
                chunk //= 2
            fb = max(1, args.frame_batch)
            frames = []
            for g0 in range(0, len(path), fb):
                grp = np.asarray(path[g0:g0 + fb])
                ng = grp.shape[0]
                if ng < fb:  # pad to the compiled batch; trim below
                    grp = np.concatenate(
                        [grp, np.repeat(grp[-1:], fb - ng, axis=0)])
                if fb > 1:
                    rgbs = full_render.render_video_device(
                        model, params, ref_data, jnp.asarray(grp), qdr,
                        ref_info["depth_range"], chunk=chunk,
                        coarse_lowres=clr,
                        coarse_chunk=PRESET_COARSE_CHUNK[args.preset])
                else:
                    rgbs = full_render.render_image_device(
                        model, params, ref_data, jnp.asarray(grp[0]), qdr,
                        ref_info["depth_range"], chunk=chunk,
                        coarse_lowres=clr,
                        coarse_chunk=PRESET_COARSE_CHUNK[args.preset])[None]
                for gi in range(ng):
                    fi = g0 + gi
                    rgb = rgbs[gi]
                    save_image(out_dir / f"{qi}-frame{fi:03d}.png", rgb)
                    frames.append(np.asarray(
                        np.clip(np.asarray(rgb) * 255.0, 0, 255),
                        np.uint8))
            # assemble the pose-path frames into a video (reference
            # render.py:304,401 imageio.mimsave of the 'inter' loop)
            try:
                import imageio.v2 as imageio
                imageio.mimsave(out_dir / f"{qi}-video.gif", frames,
                                duration=0.125, loop=0)
                print(f"[{qi}] wrote {len(path)} path frames + "
                      f"{qi}-video.gif")
            except Exception as e:  # headless codecs vary; frames remain
                print(f"[{qi}] wrote {len(path)} path frames "
                      f"(gif assembly failed: {e})")
            continue

        t0 = time.perf_counter()
        if mesh is not None:
            from panogrf_tpu.parallel.sharded_render import \
                render_image_sharded
            ref_data = full_render.prepare_ref_data(model, params, ref_info)
            rgb = render_image_sharded(
                model, params, ref_data, data["que_imgs_info"]["c2w"],
                data["que_imgs_info"]["depth_range"],
                ref_info["depth_range"], mesh, coarse_lowres=clr)
            out = {"rgb": rgb}
        elif clr > 1:
            ref_data = full_render.prepare_ref_data(model, params, ref_info)
            # the device path (lax.map inside one jit) pays no per-chunk
            # dispatch, so it runs at the preset's SWEPT chunk — unlike
            # the host-loop render_image below, where big chunks amortize
            # the per-dispatch tunnel RTT
            chunk = args.chunk or PRESET_CHUNK[args.preset]
            while (H * W) % chunk:
                chunk //= 2
            rgb = full_render.render_image_device(
                model, params, ref_data, data["que_imgs_info"]["c2w"],
                data["que_imgs_info"]["depth_range"],
                ref_info["depth_range"], chunk=chunk,
                coarse_lowres=clr,
                coarse_chunk=PRESET_COARSE_CHUNK[args.preset])
            out = {"rgb": rgb}
        else:
            out = full_render.render_image(
                model, params, ref_info, data["que_imgs_info"]["c2w"],
                data["que_imgs_info"]["depth_range"],
                chunk=min(8192, H * W))
        jax.block_until_ready(out["rgb"])
        dt = time.perf_counter() - t0
        gt = s["rgb_panos"][imgs_info.QUE_ID]
        m = {k: float(v) for k, v in M.render_metrics(out["rgb"], gt).items()}
        if lpips_score is not None:
            m["lpips"] = float(lpips_score(gt[None], out["rgb"][None])[0])
        m["sec_per_frame"] = dt
        all_m.append(m)
        save_image(out_dir / f"{qi}-nr_fine.png", out["rgb"])
        save_image(out_dir / f"{qi}-gt.png", gt)
        print(f"[{qi}] " + " ".join(f"{k}={v:.3f}" for k, v in m.items()))

    if all_m:
        mean = {k: float(np.mean([m[k] for m in all_m])) for k in all_m[0]}
        (out_dir / "metric.txt").write_text(json.dumps(mean, indent=2))
        print("mean:", json.dumps(mean))


if __name__ == "__main__":
    main()
