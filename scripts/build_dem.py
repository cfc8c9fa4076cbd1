#!/usr/bin/env python
"""Build a DSM (and optional orthophoto) from a point cloud.

TPU-native counterpart of the reference's scripts/build_dem.py:1-43:
device scatter-add gridding instead of pandas groupby + scipy
interpolation.

Usage:
  python scripts/build_dem.py cloud.ply --step 0.5 --out dem.npz \
      [--utm2loc] [--geotiff dem.tif]
"""

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cloud", help="PLY point cloud")
    ap.add_argument("--step", type=float, default=0.5)
    ap.add_argument("--out", default="dem.npz")
    ap.add_argument("--geotiff", default=None)
    ap.add_argument("--utm2loc", action="store_true",
                    help="convert Belvedere UTM coords to the local frame")
    ap.add_argument("--fill-iters", type=int, default=10)
    args = ap.parse_args()

    from icepy4d_tpu.io.ply import read_ply
    from icepy4d_tpu.utils import build_dsm, save_dsm_npz
    from icepy4d_tpu.utils.dsm_orthophoto import save_dsm_geotiff
    from icepy4d_tpu.utils.rototranslation import belvedere_utm2loc

    pts, _ = read_ply(args.cloud)
    if args.utm2loc:
        pts = belvedere_utm2loc(pts)
    dsm = build_dsm(pts.astype(np.float32), dsm_step=args.step,
                    fill_iters=args.fill_iters)
    save_dsm_npz(dsm, args.out)
    print(f"DSM {dsm.z.shape} at {args.step} m -> {args.out}")
    if args.geotiff:
        ok = save_dsm_geotiff(dsm, args.geotiff)
        print(f"GeoTIFF: {'written' if ok else 'rasterio unavailable'}")


if __name__ == "__main__":
    main()
