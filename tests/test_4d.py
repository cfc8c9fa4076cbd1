"""Numeric end-to-end 4D validation: a synthetic season with KNOWN
surface motion through the full pipeline (matching + temporal tracking +
time series), measured by the 4D products.

The reference never tests its 4D chain; this is the icepy4d_tpu
ground-truth equivalent of its velocity workflows.
"""

import os
import time

import numpy as np
import pytest

from icepy4d_tpu.utils.config import DotDict

SHIFT = 8  # px/epoch, SuperPoint-cell aligned (random weights in CI)
N_EPOCHS = 3
H, W = 240, 320


@pytest.fixture(scope="module")
def season(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("season")
    rng = np.random.default_rng(11)
    lo = rng.uniform(size=(30, (W + SHIFT * N_EPOCHS) // 8)).astype(
        np.float32)
    base = cv2.resize(lo, (W + SHIFT * N_EPOCHS, H),
                      interpolation=cv2.INTER_CUBIC)
    base = np.clip(base * 255, 0, 255).astype(np.uint8)

    ts = time.time()
    for cam in ("cam1", "cam2"):
        d = root / "img" / cam
        d.mkdir(parents=True)
        for e in range(N_EPOCHS):
            # the "glacier" flows left by SHIFT px per epoch
            img = base[:, e * SHIFT: e * SHIFT + W]
            p = d / f"IMG_{e:03d}.png"
            cv2.imwrite(str(p), img)
            os.utime(p, (ts + e * 3600, ts + e * 3600))
    (root / "calib").mkdir()
    for cam in ("cam1", "cam2"):
        with open(root / "calib" / f"{cam}.txt", "w") as f:
            f.write(f"{W} {H} 400. 0. {W/2} 0. 400. {H/2} 0. 0. 1. "
                    "0. 0. 0. 0.\n")
    return root


def test_4d_tracking_measures_surface_motion(season, tmp_path):
    from icepy4d_tpu import Pipeline
    from icepy4d_tpu.utils import (compute_displacements,
                                   tracked_features_time_series)

    cfg = DotDict.wrap({
        "paths": {"image_dir": str(season / "img"),
                  "calibration_dir": str(season / "calib"),
                  "results_dir": str(tmp_path)},
        "proc": {"epoch_to_process": "all", "do_tracking": True,
                 "do_orientation": False, "do_ba": False,
                 "save_checkpoints": False, "use_mtime_fallback": True},
        "matching": {"matcher": "nn", "quality": "high",
                     "tile_selection": "none", "max_keypoints": 512,
                     "geometric_verification": "none"},
    })
    pipe = Pipeline(cfg)
    epoches = pipe.run()
    assert len(epoches) == N_EPOCHS

    series = tracked_features_time_series(epoches, "cam1",
                                          min_tracked_epoches=2)
    assert len(series) > 30, "tracks must survive across epochs"

    disp = compute_displacements(series)
    full = disp[disp.n_epochs == N_EPOCHS]
    assert len(full) > 10, "some tracks must span the whole season"
    # surface flows left by SHIFT px/epoch -> dx = -SHIFT * (E-1)
    expected = -SHIFT * (N_EPOCHS - 1)
    assert abs(np.median(full.dx) - expected) < 1.0
    assert abs(np.median(full.dy)) < 1.0
    # per-epoch velocity from the time series
    tid = int(full.iloc[0].track_id)
    s = series[tid]
    eids = sorted(s)
    steps = [s[b][0] - s[a][0] for a, b in zip(eids[:-1], eids[1:])]
    np.testing.assert_allclose(steps, -SHIFT, atol=1.0)
