#!/usr/bin/env python
"""Track GCP targets across a season by OC template matching.

TPU-native counterpart of the reference's scripts/track_targets.py:1-70:
one batched FFT-correlation program per slave image instead of a
multiprocessing pool.

Usage:
  python scripts/track_targets.py --master path/to/master.jpg \
      --images "data/img/cam1/*.jpg" --targets targets.csv \
      --out res/targets [--template 32 --search 128 --snr 7]
targets.csv: label,x,y rows with the target positions in the master.
"""

import argparse
import glob
from pathlib import Path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--images", required=True,
                    help="glob of slave images")
    ap.add_argument("--targets", required=True,
                    help="csv with label,x,y in the master image")
    ap.add_argument("--out", default="res/targets")
    ap.add_argument("--template", type=int, default=32)
    ap.add_argument("--search", type=int, default=128)
    ap.add_argument("--snr", type=float, default=7.0)
    args = ap.parse_args()

    import pandas as pd

    from icepy4d_tpu.utils.track_targets import TrackTargets

    df = pd.read_csv(args.targets)
    xy = df[["x", "y"]].to_numpy(np.float64)
    names = df["label"].tolist()
    images = sorted(glob.glob(args.images))
    if not images:
        raise SystemExit(f"no images match {args.images!r}")

    tt = TrackTargets(
        Path(args.master), [Path(p) for p in images], xy,
        target_names=names, out_dir=args.out,
        template_width=args.template, search_width=args.search,
        snr_threshold=args.snr, verbose=True)
    results = tt.track()
    n_ok = sum(int(r["ok"].sum()) for r in results.values())
    print(f"tracked {n_ok} target observations over {len(results)} "
          f"images -> {args.out}")


if __name__ == "__main__":
    main()
