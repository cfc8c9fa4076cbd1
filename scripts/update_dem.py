#!/usr/bin/env python
"""Merge a stereo DSM into a larger base DEM + report volume change.

Counterpart of the reference's scripts/update_dem.py:14-45 (rasterio
merge) plus the cloudComPy volume differencing
(post_processing/cloudcompare_fun.py) in one tool, operating on npz DSMs
written by build_dem.py.

Usage:
  python scripts/update_dem.py base.npz update.npz --out merged.npz
"""

import argparse

import numpy as np


def load(path):
    from icepy4d_tpu.utils.dsm_orthophoto import DSM

    d = np.load(path)
    return DSM(z=d["z"], mask=d["mask"], xx=d["xx"], yy=d["yy"],
               res=float(d["res"]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("update")
    ap.add_argument("--out", default="merged.npz")
    args = ap.parse_args()

    from icepy4d_tpu.utils import dem_of_difference, save_dsm_npz
    from icepy4d_tpu.utils.dsm_orthophoto import DSM

    base = load(args.base)
    upd = load(args.update)
    if base.z.shape == upd.z.shape:
        dz, rep = dem_of_difference(base, upd)
        print(f"volume added {rep.added:.1f} m3, removed "
              f"{rep.removed:.1f} m3, net {rep.net:.1f} m3 over "
              f"{rep.area:.0f} m2")
    # merge: update wins where valid
    z = np.where(upd.mask, upd.z, base.z)
    mask = base.mask | upd.mask
    save_dsm_npz(DSM(z=z, mask=mask, xx=base.xx, yy=base.yy,
                     res=base.res), args.out)
    print(f"merged DEM -> {args.out}")


if __name__ == "__main__":
    main()
