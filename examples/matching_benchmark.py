#!/usr/bin/env python
"""Matcher comparison on one stereo pair.

Counterpart of the reference's notebooks/matching.ipynb benchmark:
run each matcher on the same pair with tiled matching + geometric
verification, report wall time and inlier counts.

Usage:
  python examples/matching_benchmark.py [--assets DIR]
      [--quality high] [--grid 2 3] [--weights-dir DIR]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# test harness hook: the axon TPU plugin ignores JAX_PLATFORMS, so CPU
# forcing must go through jax.config before any backend touch
import os

if os.environ.get("ICEPY4D_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="/root/reference/assets")
    ap.add_argument("--quality", default="high")
    ap.add_argument("--grid", type=int, nargs=2, default=[2, 3])
    ap.add_argument("--max-keypoints", type=int, default=4096)
    ap.add_argument("--weights-dir", default=None,
                    help="dir with superpoint_v1.pth etc. (optional)")
    ap.add_argument("--out", default=None,
                    help="optional dir for saved matches/plots")
    args = ap.parse_args()
    A = Path(args.assets)

    from icepy4d_tpu.matching import (GeometricVerification,
                                      LightGlueMatcher, LoFTRMatcher,
                                      NearestNeighborMatcher, Quality,
                                      SemiDenseMatcher, SuperGlueMatcher,
                                      TileSelection)

    img0 = cv2.imread(str(sorted((A / "img" / "cam1").glob("*"))[0]),
                      cv2.IMREAD_GRAYSCALE)
    img1 = cv2.imread(str(sorted((A / "img" / "cam2").glob("*"))[0]),
                      cv2.IMREAD_GRAYSCALE)

    opts = {"max_keypoints": args.max_keypoints}
    if args.weights_dir:
        wd = Path(args.weights_dir)
        if (wd / "superpoint_v1.pth").exists():
            opts["superpoint_weights"] = str(wd / "superpoint_v1.pth")

    matchers = {
        "NearestNeighbor": NearestNeighborMatcher(dict(opts)),
        "SemiDense": SemiDenseMatcher(dict(opts)),
        "LightGlue": LightGlueMatcher(dict(
            opts, **({"lightglue_weights":
                      str(Path(args.weights_dir) /
                          "superpoint_lightglue.pth")}
                     if args.weights_dir and
                     (Path(args.weights_dir) /
                      "superpoint_lightglue.pth").exists() else {}))),
        "SuperGlue": SuperGlueMatcher(dict(opts)),
        "LoFTR": LoFTRMatcher(dict(
            opts, **({"loftr_weights":
                      str(Path(args.weights_dir) / "outdoor_ds.ckpt")}
                     if args.weights_dir and
                     (Path(args.weights_dir) /
                      "outdoor_ds.ckpt").exists() else {}))),
    }
    kwargs = dict(
        quality=Quality[args.quality.upper()],
        tile_selection=TileSelection.PRESELECTION,
        grid=list(args.grid), overlap=100, threshold=2.0,
        geometric_verification=GeometricVerification.PYDEGENSAC,
    )

    print(f"{'matcher':<16} {'cold s':>8} {'warm s':>8} {'inliers':>8}")
    for name, m in matchers.items():
        t0 = time.perf_counter()
        m.match(img0, img1, **kwargs)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        m.match(img0, img1, **kwargs)
        warm = time.perf_counter() - t0
        print(f"{name:<16} {cold:>8.2f} {warm:>8.2f} "
              f"{len(m.mkpts0):>8d}")
        if args.out:
            m.save_mkpts_as_txt(Path(args.out) / name)


if __name__ == "__main__":
    main()
