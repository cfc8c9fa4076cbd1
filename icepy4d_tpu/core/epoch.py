"""Epoch containers and the multi-camera time synchronisation map.

Re-implements the reference's Epoch / Epoches / EpochDataMap
(core/epoch.py:113-613): an Epoch bundles everything one timestamp
produced (images, cameras, features, points, targets, point cloud);
EpochDataMap scans per-camera image folders, picks the master camera,
and pairs each master image with the closest slave image within a time
tolerance, writing `epoch_map.csv`.
"""

from __future__ import annotations

import csv
import pickle
from datetime import datetime
from pathlib import Path

from icepy4d_tpu.core.constants import DATETIME_FMT
from icepy4d_tpu.core.images import Image, ImageDS


def parse_str_to_datetime(s: str | datetime) -> datetime:
    if isinstance(s, datetime):
        return s
    for fmt in (DATETIME_FMT, "%Y-%m-%d %H:%M:%S", "%Y:%m:%d %H:%M:%S"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"Unparseable timestamp: {s!r}")


def find_closest_timestamp(
    timestamps: list[datetime], target: datetime
) -> tuple[int, float]:
    """Index + |dt| seconds of the closest timestamp (ref epoch.py:84-110)."""
    best_i, best_dt = -1, float("inf")
    for i, ts in enumerate(timestamps):
        if ts is None:
            continue
        dt = abs((ts - target).total_seconds())
        if dt < best_dt:
            best_i, best_dt = i, dt
    return best_i, best_dt


class Epoch:
    """One-epoch container (ref core/epoch.py:327-500)."""

    def __init__(
        self,
        timestamp: str | datetime,
        images: dict | None = None,
        cameras: dict | None = None,
        features: dict | None = None,
        points=None,
        targets=None,
        point_cloud=None,
        epoch_dir: str | Path | None = None,
    ):
        self.timestamp = parse_str_to_datetime(timestamp)
        self.images = images or {}
        self.cameras = cameras or {}
        self.features = features or {}
        self.points = points
        self.targets = targets
        self.point_cloud = point_cloud
        self.epoch_dir = Path(epoch_dir) if epoch_dir else None
        # Season-level quality gate record (no reference counterpart —
        # the reference checkpoints whatever the epoch produced, incl.
        # garbage geometry). status: ok | degraded | failed; flags name
        # the gates that fired (e.g. "few_matches", "ba_failed").
        self.quality: dict = {"status": "ok", "flags": [], "stats": {}}

    def flag(self, flag: str, status: str = "degraded", **stats) -> None:
        """Record a failed quality gate. 'failed' dominates 'degraded'."""
        q = self.quality
        if flag not in q["flags"]:
            q["flags"].append(flag)
        order = {"ok": 0, "degraded": 1, "failed": 2}
        if order[status] > order[q["status"]]:
            q["status"] = status
        q["stats"].update(stats)

    def __setstate__(self, state):
        # checkpoints written before quality gates existed load as "ok"
        self.__dict__.update(state)
        if "quality" not in state:
            self.quality = {"status": "ok", "flags": [], "stats": {}}

    def __repr__(self) -> str:
        return f"Epoch({self.timestamp.strftime(DATETIME_FMT)})"

    @property
    def date_str(self) -> str:
        return self.timestamp.strftime(DATETIME_FMT)

    def save_pickle(self, path: str | Path | None = None) -> Path:
        if path is None:
            if self.epoch_dir is None:
                raise ValueError("No path or epoch_dir set")
            path = self.epoch_dir / f"{self.date_str}.pickle"
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self, f)
        return path

    @staticmethod
    def read_pickle(path) -> "Epoch":
        with open(path, "rb") as f:
            ep = pickle.load(f)
        if not isinstance(ep, Epoch):
            raise TypeError(f"{path} does not contain an Epoch")
        return ep


class Epoches:
    """Ordered collection of epochs (ref core/epoch.py:503-613)."""

    def __init__(self, starting_epoch: int = 0):
        self._starting = starting_epoch
        self._epochs: dict[int, Epoch] = {}
        self._by_ts: dict[datetime, int] = {}

    def __len__(self) -> int:
        return len(self._epochs)

    def __iter__(self):
        return iter(self._epochs.values())

    def __getitem__(self, epoch_id: int) -> Epoch:
        return self._epochs[epoch_id]

    def add_epoch(self, epoch: Epoch, epoch_id: int | None = None) -> int:
        if epoch_id is None:
            epoch_id = (max(self._epochs) + 1) if self._epochs else self._starting
        self._epochs[epoch_id] = epoch
        self._by_ts[epoch.timestamp] = epoch_id
        return epoch_id

    def get_epoch_by_date(self, ts: str | datetime) -> Epoch | None:
        ts = parse_str_to_datetime(ts)
        eid = self._by_ts.get(ts)
        return self._epochs.get(eid) if eid is not None else None

    def get_epoch_id(self, ts: str | datetime) -> int | None:
        return self._by_ts.get(parse_str_to_datetime(ts))


class EpochDataMap:
    """Multi-camera time-sync map (ref core/epoch.py:113-324).

    Scans `image_dir/<cam>/`, takes the master camera (given name, else
    first alphabetically), and for every master image finds each slave
    camera's closest-in-time image within `time_tolerance_sec`. Epochs
    with fewer than `min_images` synchronized cameras are dropped.
    """

    def __init__(
        self,
        image_dir: str | Path,
        master_camera: str | None = None,
        time_tolerance_sec: float = 180.0,
        min_images: int = 2,
        write_csv: bool = True,
        use_mtime_fallback: bool = False,
    ):
        """use_mtime_fallback: timestamp EXIF-less images from the file
        modification time (synthetic/consumer datasets; the reference is
        EXIF-only)."""
        self.image_dir = Path(image_dir)
        cams = sorted(p.name for p in self.image_dir.iterdir() if p.is_dir())
        if not cams:
            raise FileNotFoundError(f"No camera folders in {image_dir}")
        self.cams = cams
        self.master = master_camera if master_camera in cams else cams[0]
        self.time_tolerance = time_tolerance_sec
        self.min_images = min_images

        self._datastores = {c: ImageDS(self.image_dir / c) for c in cams}
        if use_mtime_fallback:
            from datetime import datetime as _dt
            import os

            for ds in self._datastores.values():
                for im in ds:
                    if im.datetime is None:
                        im._datetime = _dt.fromtimestamp(
                            os.path.getmtime(im.path))
        self._map: dict[int, dict] = {}
        self._build_map()
        if write_csv:
            self.write_csv(self.image_dir / "epoch_map.csv")

    def __len__(self) -> int:
        return len(self._map)

    def __getitem__(self, epoch_id: int) -> dict:
        return self._map[epoch_id]

    def __iter__(self):
        return iter(self._map.items())

    @property
    def cameras(self) -> list[str]:
        return list(self.cams)

    def _build_map(self) -> None:
        master_ds = self._datastores[self.master]
        slaves = [c for c in self.cams if c != self.master]
        slave_ts = {c: self._datastores[c].timestamps() for c in slaves}

        eid = 0
        for im in master_ds:
            ts = im.datetime
            if ts is None:
                continue
            entry = {
                "timestamp": ts,
                "images": {self.master: im},
                "dt": {self.master: 0.0},
            }
            for cam in slaves:
                idx, dt = find_closest_timestamp(slave_ts[cam], ts)
                if idx >= 0 and dt <= self.time_tolerance:
                    entry["images"][cam] = self._datastores[cam][idx]
                    entry["dt"][cam] = dt
            if len(entry["images"]) >= self.min_images:
                self._map[eid] = entry
                eid += 1

    def write_csv(self, path) -> None:
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["epoch", "timestamp"]
                + [f"{c}_image" for c in self.cams]
                + [f"{c}_dt_sec" for c in self.cams]
            )
            for eid, e in self._map.items():
                w.writerow(
                    [eid, e["timestamp"].strftime(DATETIME_FMT)]
                    + [
                        e["images"][c].name if c in e["images"] else ""
                        for c in self.cams
                    ]
                    + [f"{e['dt'].get(c, ''):.1f}" if c in e["dt"] else ""
                       for c in self.cams]
                )

    def get_images(self, epoch_id: int) -> dict[str, Image]:
        return self._map[epoch_id]["images"]

    def get_timestamp(self, epoch_id: int) -> datetime:
        return self._map[epoch_id]["timestamp"]
