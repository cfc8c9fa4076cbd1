#!/usr/bin/env python
"""Transform point clouds between the Belvedere local and UTM frames.

TPU-native counterpart of the reference's scripts/pcd_rototranslation.py
(open3d IO + Rotrotranslation): native PLY IO + the same site 4x4.

Usage:
  python scripts/pcd_rototranslation.py "res/monthly_pcd/*.ply" \
      --mode loc2utm [--suffix _utm]
"""

import argparse
import glob
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern", help="glob for point clouds")
    ap.add_argument("--mode", choices=["loc2utm", "utm2loc"],
                    default="loc2utm")
    ap.add_argument("--suffix", default=None)
    args = ap.parse_args()

    from icepy4d_tpu.io.ply import read_ply, write_ply
    from icepy4d_tpu.utils.rototranslation import (belvedere_loc2utm,
                                                   belvedere_utm2loc)

    fn = belvedere_loc2utm if args.mode == "loc2utm" else belvedere_utm2loc
    suffix = args.suffix or ("_utm" if args.mode == "loc2utm" else "_loc")
    for fp in sorted(glob.glob(args.pattern)):
        fp = Path(fp)
        pts, cols = read_ply(fp)
        out = fp.with_name(f"{fp.stem}{suffix}.ply")
        write_ply(out, fn(pts), cols)
        print(f"{fp.name} -> {out.name}")


if __name__ == "__main__":
    main()
