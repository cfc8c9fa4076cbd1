#!/usr/bin/env python
"""Plot cross sections of epoch point clouds.

TPU-native counterpart of the reference's scripts/plot_sections.py:1-91
(which reads CloudCompare .bin section files and opens an interactive
window): sections are extracted natively as planar slabs and rendered
headlessly to PNG with the same orthographic XZ view.

Usage:
  python scripts/plot_sections.py "res/monthly_pcd/*.ply" \
      --axis y --stations 200 225 250 --thickness 2 --out sections.png
"""

import argparse
import glob
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern", help="glob for point clouds (one section "
                                    "set per cloud) ")
    ap.add_argument("--axis", default="y", choices=["x", "y", "z"])
    ap.add_argument("--stations", type=float, nargs="+", required=True)
    ap.add_argument("--thickness", type=float, default=1.0)
    ap.add_argument("--out", default="sections.png")
    ap.add_argument("--elev", type=float, default=0.0)
    ap.add_argument("--azim", type=float, default=-90.0)
    args = ap.parse_args()

    from icepy4d_tpu.io.ply import read_ply
    from icepy4d_tpu.post_processing import extract_sections, plot_sections

    sections = {}
    for fp in sorted(glob.glob(args.pattern)):
        fp = Path(fp)
        pts, _ = read_ply(fp)
        for st, sec in extract_sections(pts, args.axis, args.stations,
                                        args.thickness).items():
            sections[f"{fp.stem}@{args.axis}={st:g}"] = sec
    fig = plot_sections(sections, elev=args.elev, azim=args.azim,
                        out=args.out)
    print(f"wrote {args.out} ({len(sections)} sections)")


if __name__ == "__main__":
    main()
