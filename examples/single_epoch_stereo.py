#!/usr/bin/env python
"""Single-epoch stereo reconstruction walkthrough.

The counterpart of the reference's
notebooks/single_epoch_stereo_reconstruction.ipynb: one stereo pair ->
deep matching -> geometric verification -> relative orientation ->
triangulation -> absolute orientation on surveyed targets -> bundle
adjustment -> colored sparse cloud.

Run (uses the bundled sample assets by default):
  python examples/single_epoch_stereo.py [--assets DIR] [--out OUT]
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
    ap.add_argument("--out", default="res/single_epoch")
    ap.add_argument("--matcher", default="nn",
                    choices=["nn", "lightglue", "superglue", "semidense"])
    ap.add_argument("--superpoint-weights", default=None)
    ap.add_argument("--matcher-weights", default=None)
    args = ap.parse_args()
    A = Path(args.assets)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from icepy4d_tpu.core import Calibration, EpochDataMap, Targets
    from icepy4d_tpu.core.camera import Camera
    from icepy4d_tpu.io.ply import write_ply
    from icepy4d_tpu.matching import (GeometricVerification,
                                      LightGlueMatcher,
                                      NearestNeighborMatcher, Quality,
                                      SemiDenseMatcher, SuperGlueMatcher,
                                      TileSelection)
    from icepy4d_tpu.sfm import (AbsoluteOrientation, BAConfig,
                                 BundleAdjustment, RelativeOrientation,
                                 Triangulate)

    # --- 1. data ------------------------------------------------------------
    em = EpochDataMap(A / "img", time_tolerance_sec=1200)
    cams_names = em.cameras
    images = em.get_images(0)
    ims = {c: images[c].value for c in cams_names}
    h, w = ims[cams_names[0]].shape[:2]

    cameras = {}
    cal_width = w
    for c in cams_names:
        cal = Calibration(A / "calib" / f"{c}.txt").to_camera()
        K = np.asarray(cal.K)
        cal_width = cal.width or w   # target CSVs use CALIBRATED pixels
        if cal.width and cal.width != w:           # downscaled samples
            K = K * (w / cal.width)
            K[2, 2] = 1.0
        cameras[c] = Camera.create(width=w, height=h, K=K,
                                   dist=np.asarray(cal.dist))

    # --- 2. matching ----------------------------------------------------------
    opts = {"max_keypoints": 2048}
    if args.superpoint_weights:
        opts["superpoint_weights"] = args.superpoint_weights
    if args.matcher_weights:
        opts[f"{args.matcher}_weights"] = args.matcher_weights
    matcher = {
        "nn": NearestNeighborMatcher,
        "lightglue": LightGlueMatcher,
        "superglue": SuperGlueMatcher,
        "semidense": SemiDenseMatcher,
    }[args.matcher](opts)
    matcher.match(
        ims[cams_names[0]], ims[cams_names[1]],
        quality=Quality.HIGH,
        tile_selection=TileSelection.PRESELECTION,
        grid=[2, 3], overlap=100, threshold=2.0,
        geometric_verification=GeometricVerification.PYDEGENSAC,
        save_dir=out)
    mk0, mk1 = matcher.mkpts0, matcher.mkpts1
    print(f"matches after geometric verification: {len(mk0)}")
    if len(mk0) < 8:
        print("too few matches (no pretrained weights?) — stopping here")
        return

    # --- 3. relative orientation + triangulation ------------------------------
    centers = {  # surveyed camera centers (assets config.yaml georef)
        cams_names[0]: np.array([151.962, 99.065, 91.643], np.float32),
        cams_names[1]: np.array([309.261, 301.051, 135.008], np.float32),
    }
    baseline = float(np.linalg.norm(
        centers[cams_names[0]] - centers[cams_names[1]]))
    rel = RelativeOrientation(
        [cameras[cams_names[0]], cameras[cams_names[1]]], [mk0, mk1])
    valid = rel.estimate_pose(threshold=2.0, scale_factor=baseline)
    cameras[cams_names[1]] = rel.cameras[1]
    mk0, mk1 = mk0[valid], mk1[valid]
    tri = Triangulate(
        [cameras[cams_names[0]], cameras[cams_names[1]]], [mk0, mk1])
    pts = tri.triangulate_two_views(
        compute_colors=True, image=ims[cams_names[0]], cam_id=0)
    print(f"triangulated {len(pts)} points")

    # --- 4. absolute orientation on targets -----------------------------------
    targets = Targets(
        im_file_path=[A / "targets" / f"{images[c].path.stem}.csv"
                      for c in cams_names],
        obj_file_path=A / "targets" / "target_world.csv")
    t_world, found = targets.get_object_coor_by_label(
        ["F2", "F12", "F13"])
    t_im = [targets.get_image_coor_by_label(found, i)[0] * (w / cal_width)
            for i in range(2)]
    abso = AbsoluteOrientation(
        tuple(cameras[c] for c in cams_names),
        points3d_final=t_world, image_points=tuple(t_im),
        camera_centers_world=tuple(centers[c] for c in cams_names))
    abso.estimate_transformation_linear(estimate_scale=True)
    pts = abso.apply_transformation(points3d=pts)
    cameras = dict(zip(cams_names, abso.cameras))

    # --- 5. bundle adjustment ---------------------------------------------------
    ba = BundleAdjustment(
        cameras, {cams_names[0]: mk0, cams_names[1]: mk1}, pts,
        marker_image_points=dict(zip(cams_names, t_im)),
        marker_world=t_world, camera_centers=centers,
        cfg=BAConfig(camera_center_sigma_m=0.5, max_iters=60))
    res = ba.run()
    print(f"BA: {res.initial_cost:.1f} -> {res.cost:.1f} "
          f"({res.iterations} iters), rmse {res.reprojection_rmse_px:.3f} px")

    # --- 6. export ----------------------------------------------------------------
    write_ply(out / "sparse_cloud.ply", res.points, rgb=tri.colors)
    print(f"sparse cloud -> {out / 'sparse_cloud.ply'}")


if __name__ == "__main__":
    main()
