"""Ground-control-point (target) store.

Mirrors the reference's Targets (core/targets.py:36-290): per-camera CSV
tables of image coordinates (label,x,y) plus one world-coordinate table
(label,X,Y,Z); query by label lists returning aligned numpy arrays.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


class Targets:
    def __init__(
        self,
        im_file_path: list[str | Path] | None = None,
        obj_file_path: str | Path | None = None,
    ):
        self.im_coor: list[pd.DataFrame] = []
        self.obj_coor: pd.DataFrame | None = None
        if im_file_path is not None:
            for p in im_file_path:
                self.im_coor.append(self._read_im_csv(p))
        if obj_file_path is not None:
            self.obj_coor = self._read_obj_csv(obj_file_path)

    @staticmethod
    def _read_im_csv(path) -> pd.DataFrame:
        df = pd.read_csv(path)
        need = {"label", "x", "y"}
        if not need.issubset(df.columns):
            raise ValueError(f"{path}: expected columns {need}, got {list(df.columns)}")
        return df

    @staticmethod
    def _read_obj_csv(path) -> pd.DataFrame:
        df = pd.read_csv(path)
        need = {"label", "X", "Y", "Z"}
        if not need.issubset(df.columns):
            raise ValueError(f"{path}: expected columns {need}, got {list(df.columns)}")
        return df

    def scale_image_coordinates(self, factor: float) -> None:
        """Rescale all image coordinates by `factor`.

        Target CSVs are digitized on the ORIGINAL (calibrated-resolution)
        imagery; when a dataset ships downscaled frames (the sample
        assets are 1/5 res) the pipeline rescales K — the target image
        coordinates must follow or triangulated-target AO silently uses
        coordinates in the wrong frame."""
        for df in self.im_coor:
            df["x"] = df["x"] * factor
            df["y"] = df["y"] * factor

    def get_im_coor_by_label(
        self, labels: list[str], cam_id: int
    ) -> tuple[np.ndarray, list[str]]:
        """(n, 2) image coords for the requested labels found on camera
        `cam_id`, plus the list of labels actually found
        (ref core/targets.py:136-170)."""
        df = self.im_coor[cam_id]
        rows, found = [], []
        for lab in labels:
            sel = df[df["label"] == lab]
            if len(sel):
                rows.append([float(sel.iloc[0]["x"]), float(sel.iloc[0]["y"])])
                found.append(lab)
        return np.array(rows, np.float32).reshape(-1, 2), found

    # reference name
    get_image_coor_by_label = get_im_coor_by_label

    def get_object_coor_by_label(
        self, labels: list[str]
    ) -> tuple[np.ndarray, list[str]]:
        if self.obj_coor is None:
            return np.zeros((0, 3), np.float32), []
        rows, found = [], []
        for lab in labels:
            sel = self.obj_coor[self.obj_coor["label"] == lab]
            if len(sel):
                r = sel.iloc[0]
                rows.append([float(r["X"]), float(r["Y"]), float(r["Z"])])
                found.append(lab)
        return np.array(rows, np.float32).reshape(-1, 3), found

    def append_obj_cord(self, new_obj_coor: pd.DataFrame) -> None:
        if self.obj_coor is None:
            self.obj_coor = new_obj_coor
        else:
            self.obj_coor = pd.concat([self.obj_coor, new_obj_coor],
                                      ignore_index=True)
