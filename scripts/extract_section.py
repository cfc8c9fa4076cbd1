#!/usr/bin/env python
"""Detect the glacier top border and build its time series.

TPU-native counterpart of the reference's
scripts/pcd_postprocessing/extract_section.py (+ top_border.py): merges
sparse+dense clouds, detects the top border with device-computed
covariance features (linearity + verticality percentile bands instead
of CloudCompare computeFeature), and writes border clouds + the
top_border_coords.txt center time series.

Usage:
  python scripts/extract_section.py "res/point_clouds/dense_*.ply" \
      --out res/detect_top_border [--polyline poly.csv] [--k 32] \
      [--ylims 224 228]
"""

import argparse
import glob
import re
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern", help="glob for dense point clouds")
    ap.add_argument("--out", default="res/detect_top_border")
    ap.add_argument("--polyline", default=None,
                    help="CSV polygon to crop each cloud first")
    ap.add_argument("--k", type=int, default=32,
                    help="kNN size for geometric features")
    ap.add_argument("--ylims", type=float, nargs=2, default=None)
    ap.add_argument("--x-halfwidth", type=float, default=10.0)
    args = ap.parse_args()

    import numpy as np

    from icepy4d_tpu.io.ply import read_ply, write_ply
    from icepy4d_tpu.post_processing import (border_statistics,
                                             detect_border,
                                             filter_pcd_by_polyline,
                                             write_border_time_series)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for fp in sorted(glob.glob(args.pattern)):
        fp = Path(fp)
        pts, cols = read_ply(fp)
        # merge the matching sparse cloud when present (ref
        # extract_section.py:28-45 merge_sparse_dense)
        sparse = Path(str(fp).replace("dense", "sparse"))
        if sparse.exists() and sparse != fp:
            sp, sc = read_ply(sparse)
            pts = np.concatenate([pts, sp])
            if cols is not None and sc is not None:
                cols = np.concatenate([cols, sc])
        if args.polyline:
            poly = np.loadtxt(args.polyline, delimiter=",")
            m = filter_pcd_by_polyline(pts, poly)
            pts = pts[m]
            cols = cols[m] if cols is not None else None
        mask = detect_border(pts, k=args.k)
        border = pts[mask]
        m = re.search(r"(\d{4}[-_]\d{2}[-_]\d{2}.*)$", fp.stem)
        date = m.group(1) if m else fp.stem
        write_ply(out_dir / f"border_{date}.ply", border)
        rows.append((fp.name, date, border_statistics(
            border, y_lims=args.ylims, x_halfwidth=args.x_halfwidth)))
        print(f"{fp.name}: {mask.sum()} border points")
    fout = write_border_time_series(rows, out_dir / "top_border_coords.txt")
    print(f"wrote {fout}")


if __name__ == "__main__":
    main()
