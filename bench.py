"""Headline benchmark: full-resolution stereo-pair LightGlue matching.

Protocol mirrors the reference's published notebook benchmark
(SURVEY.md §6: LightGlue full stereo pair, tiled, HIGH quality =
16.0 s end-to-end on the authors' CUDA box): one 6012x4008 stereo
pair, HIGH quality, 2x2 tile grid with overlap, 4096 keypoints/tile,
geometric verification included. We run EXHAUSTIVE tile pairing
(16 tile pairs — a strict superset of the reference's preselected
subset) and still report wall time per pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the reference.
"""

import json
import sys
import time
from pathlib import Path

REF_SECONDS = 16.0  # notebooks/matching.ipynb: "Function match took 16.0027"


def load_pair():
    import cv2

    root = Path("/root/reference/assets/img")
    p0 = sorted((root / "cam1").glob("*"))[0]
    p1 = sorted((root / "cam2").glob("*"))[0]
    img0 = cv2.imread(str(p0), cv2.IMREAD_GRAYSCALE)
    img1 = cv2.imread(str(p1), cv2.IMREAD_GRAYSCALE)
    # sample assets are downscaled; restore the reference's full
    # 6012x4008 px workload (compute cost is content-independent:
    # static tile/keypoint shapes)
    img0 = cv2.resize(img0, (6012, 4008), interpolation=cv2.INTER_CUBIC)
    img1 = cv2.resize(img1, (6012, 4008), interpolation=cv2.INTER_CUBIC)
    return img0, img1


def main() -> None:
    from icepy4d_tpu.matching import (
        GeometricVerification,
        LightGlueMatcher,
        Quality,
        TileSelection,
    )

    img0, img1 = load_pair()
    matcher = LightGlueMatcher({"max_keypoints": 4096})

    kwargs = dict(
        quality=Quality.HIGH,
        tile_selection=TileSelection.EXHAUSTIVE,
        grid=[2, 2],
        overlap=200,
        threshold=2.0,
        geometric_verification=GeometricVerification.JAX_RANSAC,
    )

    # compile warmup — retry once: remote-TPU compile services
    # occasionally drop a connection mid-stream
    for attempt in range(2):
        try:
            matcher.match(img0, img1, **kwargs)
            break
        except Exception:
            if attempt:
                raise
            time.sleep(5.0)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        matcher.match(img0, img1, **kwargs)
        times.append(time.perf_counter() - t0)
    best = min(times)

    print(json.dumps({
        "metric": "lightglue_fullres_pair_match",
        "value": round(best, 3),
        "unit": "s/pair (6012x4008, 2x2 tiles exhaustive, 4096 kpts, GV)",
        "vs_baseline": round(REF_SECONDS / best, 2),
    }))


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).parent))
    main()
