"""Sensor-width lookup for EXIF-based intrinsics.

Counterpart of ref core/sensor_width_database.py:17-63 backed by the
same openMVG CameraSensorSizeDatabase (BSD-licensed data file bundled
at core/data/sensor_database.csv, ~3,600 camera rows, see
core/data/SENSOR_DATABASE_LICENSE; ref
thirdparty/CameraSensorSizeDatabase/sensor_database.csv). A small
override table keeps a few modern bodies the 2014 CSV predates; a
user-supplied CSV ("make;model;width_mm" or "make,model,width_mm"
rows) layers on top of both.
"""

from __future__ import annotations

import csv
from pathlib import Path

_BUNDLED_CSV = Path(__file__).parent / "data" / "sensor_database.csv"

_BUILTIN = {
    ("canon", "canon eos 2000d"): 22.3,
    ("canon", "canon eos 1200d"): 22.3,
    ("canon", "canon eos 6d"): 35.8,
    ("canon", "canon eos 5d mark iii"): 36.0,
    ("nikon", "nikon d850"): 35.9,
    ("nikon", "nikon d750"): 35.9,
    ("sony", "ilce-7m3"): 35.6,
    ("dji", "fc330"): 6.17,
    ("dji", "fc6310"): 13.2,
    ("gopro", "hero8 black"): 6.17,
}


class SensorWidthDatabase:
    def __init__(self, csv_path: str | Path | None = None):
        self.table = {}
        if _BUNDLED_CSV.exists():
            self._load_csv(_BUNDLED_CSV)
        self.table.update(_BUILTIN)
        if csv_path is not None:
            self._load_csv(csv_path)

    def _load_csv(self, csv_path: str | Path) -> None:
        with open(csv_path, newline="") as f:
            sniff = f.read(2048)
            f.seek(0)
            delim = ";" if sniff.count(";") > sniff.count(",") else ","
            for row in csv.reader(f, delimiter=delim):
                if len(row) >= 2:
                    try:
                        width = float(row[-1])
                    except ValueError:
                        continue
                    if len(row) >= 3:
                        key = (row[0].strip().lower(), row[1].strip().lower())
                    else:
                        key = ("", row[0].strip().lower())
                    self.table[key] = width

    def lookup(self, make: str, model: str) -> float:
        make_l, model_l = make.strip().lower(), model.strip().lower()
        for key in ((make_l, model_l), ("", model_l)):
            if key in self.table:
                return self.table[key]
        # Fall back to substring match on model.
        for (mk, md), w in self.table.items():
            if model_l and (model_l in md or md in model_l):
                return w
        raise LookupError(f"Sensor width unknown for {make} {model}")
