"""ctypes wrapper + on-demand build of the native EXIF scanner."""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from datetime import datetime
from pathlib import Path

import numpy as np

logger = logging.getLogger("icepy4d_tpu")

_SRC = Path(__file__).resolve().parents[2] / "native" / "exif_scan.cpp"
_LIB = _SRC.parent / "libexif_scan.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.info("native exif scanner unavailable (%s)", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or (
                _SRC.exists()
                and _LIB.stat().st_mtime < _SRC.stat().st_mtime):
            if not _SRC.exists() or not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
            lib.exif_scan_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
            ]
            lib.exif_scan_batch.restype = ctypes.c_int
            _lib = lib
        except OSError as e:
            logger.info("failed to load native exif scanner: %s", e)
        return _lib


def native_available() -> bool:
    return _load() is not None


def exif_scan_batch(
    paths: list, n_threads: int = 0
) -> tuple[list, np.ndarray]:
    """Scan EXIF of many JPEGs at once.

    Returns ([datetime | None per file], focal lengths (mm, NaN if
    absent)). Uses the threaded C++ scanner when available, otherwise
    PIL one file at a time."""
    paths = [str(p) for p in paths]
    n = len(paths)
    lib = _load()
    if lib is None:
        from icepy4d_tpu.core.images import read_exif_tags

        dts, focals = [], np.full(n, np.nan)
        for i, p in enumerate(paths):
            tags = read_exif_tags(p)
            raw = tags.get("DateTimeOriginal") or tags.get("DateTime")
            dt = None
            if raw:
                try:
                    dt = datetime.strptime(str(raw)[:19],
                                           "%Y:%m:%d %H:%M:%S")
                except ValueError:
                    pass
            dts.append(dt)
            f = tags.get("FocalLength")
            if f is not None:
                try:
                    focals[i] = float(f)
                except (TypeError, ValueError):
                    pass
        return dts, focals

    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out_dt = ctypes.create_string_buffer(20 * n)
    out_f = (ctypes.c_double * n)()
    lib.exif_scan_batch(arr, n, out_dt, out_f, int(n_threads))
    dts = []
    for i in range(n):
        raw = out_dt.raw[20 * i: 20 * i + 19].split(b"\x00")[0].decode(
            "ascii", "ignore")
        dt = None
        if len(raw) == 19:
            try:
                dt = datetime.strptime(raw, "%Y:%m:%d %H:%M:%S")
            except ValueError:
                pass
        dts.append(dt)
    return dts, np.ctypeslib.as_array(out_f).copy()
