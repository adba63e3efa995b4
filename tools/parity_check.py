"""Parity harness for the day the real pretrained checkpoints land.

Given the reference's three released torch files — UniFuse mono depth
(``checkpoint_100000.pt``), 360-MVSNet, and the renderer ``model.pth``
(layout per reference ``train/trainer.py:452-459``) — this runs the full
offline parity pipeline:

  1. convert      each state dict through ``utils/torch_convert`` and
                  verify the converted tree against a fresh model init
                  key-by-key (``verify_tree_shapes``); any missing or
                  mis-shaped key aborts with the full problem list.
  2. render       fixed MP3D samples (``--shards``, imported reference
                  LMDB data via tools/import_lmdb.py) through the
                  COMPOSED pipeline — mono -> MVS -> renderer, no GT
                  depth (tools/render.py ``--mono-ckpt/--mvs-ckpt``) —
                  with ``--exact`` reference numerics.
  3. report       the metric stack (PSNR/SSIM/WS-PSNR[/LPIPS]) against
                  ``--expected-psnr`` (the reference's own number for the
                  same scenes) with the BASELINE.md +-0.1 dB gate.

Usage:
  python tools/parity_check.py --renderer-pth model.pth \
      --mono-pth checkpoint_100000.pt --mvs-pth mvs.pt \
      --shards data/shards/test --expected-psnr 28.6 \
      [--lpips-weights lpips_vgg.npz] [--num 8]

Exit code 0 = converted cleanly AND (if --expected-psnr given) PSNR
within the gate; 1 = any failure.  Every stage prints what it checked.
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load_torch_sd(path: str) -> dict:
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    for k in ("network_state_dict", "model_state_dict", "state_dict",
              "model"):
        if isinstance(raw, dict) and k in raw:
            raw = raw[k]
            break
    return {k: np.asarray(v) for k, v in raw.items()
            if hasattr(v, "shape")}


def _verify(name: str, converted: dict, init_vars: dict) -> list:
    from panogrf_tpu.utils.torch_convert import verify_tree_shapes
    problems = []
    for col in init_vars:
        if col not in converted:
            problems.append(f"{name}: converted tree missing '{col}'")
            continue
        problems += [f"{name}/{col}: {p}" for p in
                     verify_tree_shapes(converted[col], init_vars[col])]
    status = "OK" if not problems else f"{len(problems)} PROBLEMS"
    print(f"[convert] {name}: {status}")
    for p in problems[:20]:
        print("   ", p)
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--renderer-pth", required=True)
    ap.add_argument("--mono-pth", default=None)
    ap.add_argument("--mvs-pth", default=None)
    ap.add_argument("--shards", default=None,
                    help="imported reference LMDB shards (real MP3D data);"
                         " omit for a synthetic smoke run")
    ap.add_argument("--num", type=int, default=8)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--depth-height", type=int, default=256)
    ap.add_argument("--depth-width", type=int, default=512)
    ap.add_argument("--expected-psnr", type=float, default=None,
                    help="reference PSNR on the same scenes; gate is "
                         "+-0.1 dB (BASELINE.md)")
    ap.add_argument("--gate-db", type=float, default=0.1)
    ap.add_argument("--lpips-weights", default=None)
    ap.add_argument("--out", default="data/parity_out")
    ap.add_argument("--convert-only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from panogrf_tpu.utils import torch_convert as tc

    problems = []

    # ---- stage 1: convert + verify every provided checkpoint ----------
    H, W = args.height, args.width
    DH, DW = args.depth_height, args.depth_width

    if args.mono_pth:
        from panogrf_tpu.models.unifuse import UniFuse
        sd = _load_torch_sd(args.mono_pth)
        conv = tc.convert_unifuse(sd)
        mono = UniFuse()
        init = jax.eval_shape(
            lambda: mono.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, W, 3)),
                              jnp.zeros((1, 6, H // 2, H // 2, 3))))
        problems += _verify("mono(UniFuse)", conv, init)

    if args.mvs_pth:
        from panogrf_tpu.models.mvs import MVSDepthModel
        sd = _load_torch_sd(args.mvs_pth)
        conv = tc.convert_mvs(sd)
        mvs = MVSDepthModel()
        init = jax.eval_shape(
            lambda: mvs.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 2, DH, DW, 3)),
                             jnp.zeros((1, 2, 3, 3)),
                             jnp.zeros((1, 2, 3)),
                             jnp.zeros((1, DH, DW, 1)),
                             jnp.zeros((1, DH // 2, DW // 2, 32))))
        problems += _verify("mvs(360-MVSNet)", conv, init)

    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.data import imgs_info, synthetic
    sd = _load_torch_sd(args.renderer_pth)
    conv = tc.convert_renderer(sd)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW))
    s = synthetic.make_three_view_sample(
        synthetic.SphereScene.random(0), H, W, 0.5, seed=0)
    coords = imgs_info.sample_train_coords(
        np.random.default_rng(0), H, W, 8)
    data0 = imgs_info.build_render_sample(s, coords)
    data0["ref_imgs_info"]["mvs_depth"] = jnp.zeros((2, DH, DW, 1))
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), data0))
    problems += _verify("renderer(NeuralRayGen)", conv, init)

    if problems:
        print(f"\nFAIL: {len(problems)} conversion problems")
        sys.exit(1)
    print("all checkpoints convert cleanly")
    if args.convert_only:
        return

    # ---- stage 2: composed render on fixed scenes ---------------------
    out = Path(args.out)
    cmd = [sys.executable, "tools/render.py",
           "--ckpt", args.renderer_pth, "--num", str(args.num),
           "--height", str(H), "--width", str(W),
           "--depth-height", str(DH), "--depth-width", str(DW),
           "--out", str(out), "--exact"]
    if args.mono_pth:
        cmd += ["--mono-ckpt", args.mono_pth]
    if args.mvs_pth:
        cmd += ["--mvs-ckpt", args.mvs_pth]
    elif args.mono_pth:
        cmd += ["--wo-stereo"]
    if args.shards:
        cmd += ["--shards", args.shards]
    if args.lpips_weights:
        cmd += ["--lpips-weights", args.lpips_weights]
    if args.cpu:
        cmd += ["--cpu"]
    print("[render]", " ".join(cmd))
    rc = subprocess.run(cmd).returncode
    if rc != 0:
        print(f"FAIL: render exited {rc}")
        sys.exit(1)

    # ---- stage 3: parity report ---------------------------------------
    metric_file = out / "metric.txt"
    if not metric_file.exists():
        print("FAIL: no metric.txt produced")
        sys.exit(1)
    mean = json.loads(metric_file.read_text())
    print("[report]", json.dumps(mean))
    if args.expected_psnr is not None:
        psnr = mean.get("psnr_nr_fine", mean.get("psnr_nr"))
        delta = psnr - args.expected_psnr
        ok = abs(delta) <= args.gate_db or delta > 0
        print(f"[report] PSNR {psnr:.3f} vs expected "
              f"{args.expected_psnr:.3f} (delta {delta:+.3f} dB, "
              f"gate +-{args.gate_db}) -> {'PASS' if ok else 'FAIL'}")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
