"""Score rendered image dirs: PSNR / SSIM / WS-PSNR / LPIPS.

Equivalent of reference ``eval.py``: reads ``{k}-nr_fine`` renders and
``{k}`` GT images from two directories, averages the metric stack, writes
``metric.txt``.  LPIPS needs converted VGG weights (see
``panogrf_tpu/train/lpips.py``); without ``--lpips-weights`` it is skipped
(reported as null).

Usage:
  python tools/eval_dirs.py --dir_gt render/gt --dir_pr render/pred \
      [--lpips-weights lpips_vgg.npz]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_image(path: Path) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path), np.float32) / 255.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir_gt", required=True)
    ap.add_argument("--dir_pr", required=True)
    ap.add_argument("--lpips-weights", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from panogrf_tpu.train import metrics as M

    lpips_score = None
    if args.lpips_weights:
        from panogrf_tpu.train import lpips as L
        lpips_score = L.lpips_fn(L.load_lpips_weights(args.lpips_weights))

    dir_gt, dir_pr = Path(args.dir_gt), Path(args.dir_pr)
    gts = sorted(dir_gt.glob("*.png")) + sorted(dir_gt.glob("*.jpg"))
    # GT files are "{k}.ext" (reference layout) or "{k}-gt.ext"
    # (tools/render.py layout, where renders live in the SAME dir) —
    # never the renders themselves.
    gts = [p for p in gts
           if "-" not in p.stem or p.stem.endswith("-gt")]
    rows = []
    for gt_path in gts:
        k = gt_path.stem.split("-")[0]
        pr_path = None
        for ext in (".png", ".jpg"):
            cand = dir_pr / f"{k}-nr_fine{ext}"
            if cand.exists():
                pr_path = cand
                break
        if pr_path is None:
            print(f"skip {k}: no render found")
            continue
        gt = load_image(gt_path)
        pr = load_image(pr_path)
        m = {kk: float(v)
             for kk, v in M.render_metrics(jnp.asarray(pr),
                                           jnp.asarray(gt)).items()}
        if lpips_score is not None:
            m["lpips"] = float(lpips_score(jnp.asarray(gt)[None],
                                           jnp.asarray(pr)[None])[0])
        rows.append(m)
        print(k, " ".join(f"{kk}={v:.4f}" for kk, v in m.items()))

    if not rows:
        print("no image pairs found")
        return
    mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    if lpips_score is None:
        mean["lpips"] = None
    msg = json.dumps(mean, indent=2)
    (dir_pr / "metric.txt").write_text(msg)
    print("mean:", msg)


if __name__ == "__main__":
    main()
