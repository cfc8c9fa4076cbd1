"""Matching configuration enums.

API parity with the reference enums (matching/enums.py:4-27); values keep
their names so existing configs translate 1:1, and each name keeps its
reference SEMANTICS on device:

  PYDEGENSAC -> hypothesis-parallel F-RANSAC with DEGENSAC-style
                plane-degeneracy detection + plane-and-parallax recovery
                (ops/ransac.py::ransac_fundamental_degensac)
  MAGSAC     -> sigma-consensus (threshold-marginalized) scoring with
                weighted polish (ops/ransac.py::ransac_fundamental_magsac)
  JAX_RANSAC -> plain fixed-threshold Sampson RANSAC
                (ops/ransac.py::ransac_fundamental)
"""

from enum import Enum


class TileSelection(Enum):
    """Tile selection methods (ref matching/enums.py:4-10)."""

    NONE = 0
    EXHAUSTIVE = 1
    GRID = 2
    PRESELECTION = 3


class GeometricVerification(Enum):
    """Geometric verification methods (ref matching/enums.py:13-18)."""

    NONE = 0
    PYDEGENSAC = 1
    MAGSAC = 2
    JAX_RANSAC = 3


class Quality(Enum):
    """Image resolution ladder for matching (ref matching/enums.py:21-27)."""

    LOW = 0
    MEDIUM = 1
    HIGH = 2
    HIGHEST = 3


QUALITY_NAMES = {
    Quality.LOW: "low",
    Quality.MEDIUM: "medium",
    Quality.HIGH: "high",
    Quality.HIGHEST: "highest",
}

# px scale of matched keypoints relative to the original image for each
# quality level (ref matchers.py:612-639 divides/multiplies by 2 per step).
QUALITY_SCALE = {
    Quality.LOW: 0.25,
    Quality.MEDIUM: 0.5,
    Quality.HIGH: 1.0,
    Quality.HIGHEST: 2.0,
}
