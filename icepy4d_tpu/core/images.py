"""Image loading + folder datastore.

Replaces the reference's cv2/exifread stack (core/images.py) with
PIL-based host IO: lazy pixel loading, EXIF datetime/focal parsing,
patch extraction, plus `ImageDS` (sorted-folder datastore with
timestamps and an iterator). Device-side image processing (resize,
pyramids, grayscale, tiling, undistortion warps) lives in
`icepy4d_tpu.ops.image` — host code only decodes bytes.
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import numpy as np
from PIL import Image as PILImage
from PIL.ExifTags import TAGS

from icepy4d_tpu.core.constants import DATE_FMT, DATETIME_FMT, TIME_FMT

IMAGE_EXT = (".jpg", ".jpeg", ".png", ".tif", ".tiff", ".bmp")
EXIF_DATETIME_FMT = "%Y:%m:%d %H:%M:%S"


def read_image(path, color: bool = True,
               resize: tuple[int, int] | None = None) -> np.ndarray:
    """Decode an image to RGB (or grayscale) uint8 numpy array."""
    im = PILImage.open(path)
    im = im.convert("RGB" if color else "L")
    if resize is not None:
        im = im.resize(resize, PILImage.BILINEAR)
    return np.asarray(im)


def read_exif_tags(path) -> dict:
    try:
        im = PILImage.open(path)
        ex = im._getexif()
        if not ex:
            return {}
        return {TAGS.get(k, k): v for k, v in ex.items()}
    except Exception:
        return {}


class Image:
    """Lazy image with EXIF metadata (ref core/images.py:108-414)."""

    def __init__(self, path: str | Path):
        self._path = Path(path)
        self._value: np.ndarray | None = None
        self._exif = None
        self._datetime: datetime | None = None
        self._width = self._height = None

    # -- metadata -----------------------------------------------------------
    @property
    def path(self) -> Path:
        return self._path

    @property
    def name(self) -> str:
        return self._path.name

    @property
    def stem(self) -> str:
        return self._path.stem

    @property
    def exif(self) -> dict:
        if self._exif is None:
            self._exif = read_exif_tags(self._path)
        return self._exif

    def _read_size(self) -> None:
        with PILImage.open(self._path) as im:
            self._width, self._height = im.size

    @property
    def width(self) -> int:
        if self._width is None:
            self._read_size()
        return self._width

    @property
    def height(self) -> int:
        if self._height is None:
            self._read_size()
        return self._height

    @property
    def datetime(self) -> datetime | None:
        """Capture time parsed from EXIF (DateTimeOriginal | DateTime)."""
        if self._datetime is None:
            raw = self.exif.get("DateTimeOriginal") or self.exif.get("DateTime")
            if raw:
                try:
                    self._datetime = datetime.strptime(
                        str(raw).strip(), EXIF_DATETIME_FMT
                    )
                except ValueError:
                    self._datetime = None
        return self._datetime

    @property
    def date(self) -> str | None:
        dt = self.datetime
        return dt.strftime(DATE_FMT) if dt else None

    @property
    def time(self) -> str | None:
        dt = self.datetime
        return dt.strftime(TIME_FMT) if dt else None

    @property
    def timestamp(self) -> str | None:
        dt = self.datetime
        return dt.strftime(DATETIME_FMT) if dt else None

    # -- pixels ----------------------------------------------------------------
    @property
    def value(self) -> np.ndarray:
        if self._value is None:
            self._value = read_image(self._path)
        return self._value

    def read_image(self) -> np.ndarray:
        self._value = read_image(self._path)
        return self._value

    def reset_value(self) -> None:
        self._value = None

    def extract_patch(self, limits: tuple[int, int, int, int]) -> np.ndarray:
        """Crop [xmin, ymin, xmax, ymax] (ref core/images.py:344-363)."""
        x0, y0, x1, y1 = (int(v) for v in limits)
        return self.value[y0:y1, x0:x1]

    def get_intrinsics_from_exif(self) -> np.ndarray | None:
        """Approximate K from EXIF focal length + sensor width DB
        (ref core/images.py:365-414)."""
        from icepy4d_tpu.core.sensor_width_database import SensorWidthDatabase

        ex = self.exif
        focal = ex.get("FocalLength")
        make, model = ex.get("Make"), ex.get("Model")
        if focal is None or make is None or model is None:
            return None
        try:
            sensor_w = SensorWidthDatabase().lookup(str(make), str(model))
        except Exception:
            return None
        f_px = float(focal) * self.width / sensor_w
        return np.array(
            [[f_px, 0, self.width / 2.0],
             [0, f_px, self.height / 2.0],
             [0, 0, 1]], np.float32)


class ImageDS:
    """Sorted folder datastore of images (ref core/images.py:416-690)."""

    def __init__(self, folder: str | Path, ext: str | None = None):
        self.folder = Path(folder)
        if not self.folder.is_dir():
            raise FileNotFoundError(f"Image folder {folder} not found")
        exts = (f".{ext.lstrip('.')}".lower(),) if ext else IMAGE_EXT
        self.files = sorted(
            p for p in self.folder.iterdir() if p.suffix.lower() in exts
        )
        self._images = [Image(p) for p in self.files]
        self._prescan_exif()

    def _prescan_exif(self) -> None:
        """Batch-timestamp the whole datastore with the native threaded
        EXIF scanner (one call for the season instead of the reference's
        per-image python parse loop, ref core/images.py:592-609)."""
        try:
            from icepy4d_tpu.native import exif_scan_batch, native_available

            if not native_available() or not self.files:
                return
            dts, _ = exif_scan_batch(self.files)
            for im, dt in zip(self._images, dts):
                if dt is not None:
                    im._datetime = dt
        except Exception:  # never let the fast path break loading
            pass

    def __len__(self) -> int:
        return len(self._images)

    def __getitem__(self, idx: int) -> Image:
        return self._images[idx]

    def __iter__(self):
        return iter(self._images)

    def read_image(self, idx: int) -> Image:
        return self._images[idx]

    def get_image_path(self, idx: int) -> Path:
        return self.files[idx]

    def get_image_stem(self, idx: int) -> str:
        return self.files[idx].stem

    def timestamps(self) -> list[datetime | None]:
        return [im.datetime for im in self._images]

    def write_exif_to_csv(self, path) -> None:
        import csv

        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["name", "date", "time"])
            for im in self._images:
                w.writerow([im.name, im.date, im.time])
