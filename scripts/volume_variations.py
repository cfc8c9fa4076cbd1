#!/usr/bin/env python
"""Volume variation time series between epoch point clouds.

TPU-native counterpart of the reference's
scripts/pcd_postprocessing/volume_variations.py:40-214: pairs clouds
`t_step` days apart, runs the native DEM-of-difference (device
scatter-binned DSMs instead of cloudComPy ComputeVolume25D), writes the
same CSV schema, and saves the daily/cumulative plots. The per-pair DOD
is one jitted program; no multiprocessing Pool is needed.

Usage:
  python scripts/volume_variations.py "res/point_clouds_meshed/sampled*.ply" \
      --out res/volumes_variations --tstep 5 --grid-step 0.3 --dir x
"""

import argparse
import glob
import json
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern", help="glob for epoch point clouds")
    ap.add_argument("--out", default="res/volumes_variations")
    ap.add_argument("--tstep", type=int, default=5)
    ap.add_argument("--grid-step", type=float, default=0.3)
    ap.add_argument("--dir", default="x", choices=["x", "y", "z"])
    ap.add_argument("--base-name", default=None,
                    help="cloud-name prefix before the date "
                         "(default: inferred from the pattern)")
    ap.add_argument("--date-format", default="%Y_%m_%d")
    ap.add_argument("--no-plots", action="store_true")
    args = ap.parse_args()

    from icepy4d_tpu.post_processing import volume_variations

    pcd_list = sorted(glob.glob(args.pattern))
    if not pcd_list:
        raise SystemExit(f"no clouds match {args.pattern}")
    base = args.base_name
    if base is None:
        base = Path(args.pattern).name.split("*")[0].rstrip("_")
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "parameters.json", "w") as f:
        json.dump(vars(args), f, indent=4)
    df = volume_variations(
        pcd_list, t_step=args.tstep, grid_step=args.grid_step,
        direction=args.dir, out_dir=out_dir, base_name=base,
        date_format=args.date_format, make_plots=not args.no_plots)
    print(df[["pcd0", "pcd1", "volume", "matchingPercent"]]
          .to_string(index=False))


if __name__ == "__main__":
    main()
