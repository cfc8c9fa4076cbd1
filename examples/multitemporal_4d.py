#!/usr/bin/env python
"""Multitemporal 4D workflow walkthrough.

Counterpart of the reference's notebooks/mutlitemporal_workflow.ipynb:
run the pipeline over a season of stereo epochs with temporal tracking,
then assemble tracked-point time series, displacements, and (optionally)
a DEM of difference between the first and last epoch's dense clouds.

Usage:
  python examples/multitemporal_4d.py [--assets DIR] [--out OUT]
      [--matcher nn] [--dense]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# test harness hook: the axon TPU plugin ignores JAX_PLATFORMS, so CPU
# forcing must go through jax.config before any backend touch
import os

if os.environ.get("ICEPY4D_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="/root/reference/assets")
    ap.add_argument("--out", default="res/multitemporal")
    ap.add_argument("--matcher", default="nn")
    ap.add_argument("--quality", default="high")
    ap.add_argument("--dense", action="store_true")
    args = ap.parse_args()
    A = Path(args.assets)

    from icepy4d_tpu import Pipeline
    from icepy4d_tpu.utils import (compute_displacements,
                                   tracked_points_time_series,
                                   tracked_time_series_to_df)
    from icepy4d_tpu.utils.config import DotDict

    cfg = DotDict.wrap({
        "paths": {"image_dir": str(A / "img"),
                  "calibration_dir": str(A / "calib"),
                  "results_dir": args.out},
        "proc": {"epoch_to_process": "all", "do_tracking": True,
                 "do_ba": True, "do_dense": bool(args.dense),
                 "save_checkpoints": True,
                 "load_existing_results": False},
        "georef": {
            "camera_centers_world": np.array(
                [[151.962, 99.065, 91.643],
                 [309.261, 301.051, 135.008]], np.float32),
            "target_dir": str(A / "targets"),
            "target_world_file": "target_world.csv",
            "targets_to_use": ["F2", "F12", "F13"],
        },
        "other": {"pydegensac_threshold": 2.0},
        "matching": {"matcher": args.matcher, "quality": args.quality,
                     "tile_selection": "none", "max_keypoints": 4096},
        "ba": {"camera_location_accuracy": 0.5, "max_iters": 60},
        "dense": {"n_planes": 128, "downscale": 2},
    })
    pipe = Pipeline(cfg)
    epoches = pipe.run()
    print(f"processed {len(epoches)} epochs")

    # 4D products: tracked-point time series + displacement table
    series = tracked_points_time_series(epoches, min_tracked_epoches=2)
    print(f"{len(series)} points tracked over >=2 epochs")
    if series:
        df = tracked_time_series_to_df(series, epoches)
        df.to_csv(Path(args.out) / "tracked_points.csv", index=False)
        disp = compute_displacements(series)
        disp.to_csv(Path(args.out) / "displacements.csv", index=False)
        print(disp.describe().loc[["mean", "max"]][["displacement"]])

    # DEM of difference between first and last dense clouds
    if args.dense and len(epoches) >= 2:
        from icepy4d_tpu.post_processing import DemOfDifference

        first, last = epoches[0], epoches[len(epoches) - 1]
        if first.point_cloud is not None and last.point_cloud is not None \
                and len(first.point_cloud) and len(last.point_cloud):
            dod = DemOfDifference(first.point_cloud.points,
                                  last.point_cloud.points, dsm_step=2.0)
            rep = dod.compute_volume()
            dod.write_result_to_file(Path(args.out) / "volumes.csv",
                                     label=f"{first.date_str}->"
                                     f"{last.date_str}")
            print(f"volume change: +{rep.added:.0f} / -{rep.removed:.0f} "
                  f"m3 over {rep.area:.0f} m2")


if __name__ == "__main__":
    main()
