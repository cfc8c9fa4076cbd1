"""Matching IO helpers (ref matching/utils.py:107-223)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_matches_from_disk(folder) -> tuple[np.ndarray, np.ndarray]:
    """Read mkpts saved by Matcher.save_mkpts_as_txt
    (keypoints_0.txt / keypoints_1.txt)."""
    folder = Path(folder)
    mk0 = np.loadtxt(folder / "keypoints_0.txt", delimiter=",",
                     ndmin=2).astype(np.float32)
    mk1 = np.loadtxt(folder / "keypoints_1.txt", delimiter=",",
                     ndmin=2).astype(np.float32)
    if len(mk0) != len(mk1):
        raise ValueError("keypoint files disagree on match count")
    return mk0, mk1


def save_matches_as_npz(path, mkpts0, mkpts1, mconf=None) -> None:
    np.savez_compressed(path, mkpts0=np.asarray(mkpts0, np.float32),
                        mkpts1=np.asarray(mkpts1, np.float32),
                        mconf=(np.zeros(len(mkpts0), np.float32)
                               if mconf is None
                               else np.asarray(mconf, np.float32)))


def retrieve_matches_from_npz(path):
    """(mkpts0, mkpts1, mconf) from an npz written by
    save_matches_as_npz (ref matching/utils.py:181-223)."""
    d = np.load(path)
    return (d["mkpts0"], d["mkpts1"],
            d["mconf"] if "mconf" in d.files else None)
