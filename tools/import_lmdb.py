"""Convert a reference pre-rendered LMDB env into the shard dataset format.

Usage:
  python tools/import_lmdb.py --env /path/lmdb_render_train_1024x512_seq_len_3_m3d_dist_0.5 \
      --out data/shards/train_512
  # geometry flags override/replace name parsing:
  python tools/import_lmdb.py --env /path/env --out d --height 512 --width 1024 --seq-len 3

Replaces the reference's live-habitat path for environments produced by
``lmdb_rw_render/lmdb_write_render.py``; downstream training/render CLIs
read the shard dir unchanged (``--data`` flags).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from panogrf_tpu.data.lmdb_import import import_lmdb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True, help="LMDB env dir or data.mdb")
    ap.add_argument("--out", required=True, help="output shard dir")
    ap.add_argument("--height", type=int)
    ap.add_argument("--width", type=int)
    ap.add_argument("--seq-len", type=int)
    ap.add_argument("--max-samples", type=int)
    ap.add_argument("--samples-per-shard", type=int, default=64)
    args = ap.parse_args()
    n = import_lmdb(args.env, args.out, args.height, args.width,
                    args.seq_len, args.max_samples, args.samples_per_shard)
    print(f"imported {n} samples -> {args.out}")


if __name__ == "__main__":
    main()
