"""Pre-render a panorama dataset into array shards.

TPU-native replacement for the reference's LMDB writer CLI
(``lmdb_rw_render/lmdb_write_render.py``).  Without habitat-sim in the
image, the procedural scene generator supplies photo-consistent data; the
shard format is identical for any future habitat export.

Usage:
  python tools/prepare_data.py --out data/shards_train --num 256 \
      --height 256 --width 512 --m3d-dist 0.5
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--num", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--m3d-dist", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seq-len", type=int, default=3)
    ap.add_argument("--cubes", action="store_true",
                    help="also render + store the 6 cube faces per view "
                         "(rgb/depth/rots/trans_cubes, like the reference "
                         "LMDB writer's cube keys) via the online "
                         "generator; enables render_cubes --shards eval")
    ap.add_argument("--split", default="train",
                    choices=["train", "val", "test"],
                    help="--cubes path only: which online-generator split "
                         "seeds the scenes")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (default: default jax platform)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.cubes:
        from panogrf_tpu.data.online import OnlineImageGenerator
        gen = OnlineImageGenerator(
            args.split, args.height, args.width, seq_len=args.seq_len,
            m3d_dist=args.m3d_dist, with_cubes=True, seed=args.seed)
        gen.write_shards(args.out, args.num)
    else:
        from panogrf_tpu.data.shards import write_synthetic_dataset
        write_synthetic_dataset(args.out, args.num, args.height, args.width,
                                args.m3d_dist, args.seed)
    print(f"wrote {args.num} samples to {args.out}")


if __name__ == "__main__":
    main()
