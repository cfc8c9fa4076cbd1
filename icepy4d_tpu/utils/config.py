"""YAML config parsing (ref utils/initialization.py:60-161).

Schema keeps the reference's sections (log, paths, proc, images, georef,
other, matching, ba/dense instead of metashape) and returns a nested
attribute-accessible dict.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml


class DotDict(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj


def parse_cfg(cfg_file: str | Path, root_path: str | Path | None = None) -> DotDict:
    cfg_file = Path(cfg_file)
    if not cfg_file.exists():
        raise FileNotFoundError(f"Config file {cfg_file} not found")
    with open(cfg_file) as f:
        raw = yaml.safe_load(f)
    cfg = DotDict.wrap(raw)

    root = Path(root_path) if root_path else cfg_file.parent

    # Resolve paths relative to root.
    if "paths" in cfg:
        for key in ("image_dir", "calibration_dir", "results_dir"):
            if key in cfg.paths:
                p = Path(cfg.paths[key])
                cfg.paths[key] = p if p.is_absolute() else root / p
        if "camera_names" not in cfg.paths and "image_dir" in cfg.paths:
            cfg.paths["camera_names"] = sorted(
                d.name for d in Path(cfg.paths.image_dir).iterdir() if d.is_dir()
            )

    # georef arrays -> numpy.
    if "georef" in cfg and "camera_centers_world" in cfg.georef:
        cfg.georef.camera_centers_world = np.asarray(
            cfg.georef.camera_centers_world, np.float32
        )

    # Expand epoch range.
    if "proc" in cfg and "epoch_to_process" in cfg.proc:
        etp = cfg.proc.epoch_to_process
        if etp == "all":
            cfg.proc.epoch_to_process = "all"
        elif isinstance(etp, list) and len(etp) == 2:
            cfg.proc.epoch_to_process = list(range(int(etp[0]), int(etp[1]) + 1))
    return cfg
