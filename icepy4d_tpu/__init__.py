"""icepy4d_tpu — TPU-native 4D photogrammetry framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`franioli/icepy4d` (4D Image-based Continuous monitoring of glaciers'
Evolution): deep feature extraction + matching, geometric verification,
relative/absolute orientation, triangulation, bundle adjustment, dense
stereo, DEM/orthophoto products and multi-epoch (4D) feature/target
tracking — all as batched, statically-shaped JAX programs that shard over
TPU device meshes.

Public API parity targets (reference: /root/reference/src/icepy4d):
  - core:     Camera, Calibration, Image, ImageDS, Features, Points,
              PointCloud, Targets, Epoch, Epoches, EpochDataMap
  - matching: Matcher (SuperPoint+LightGlue / SuperGlue / LoFTR-style),
              geometric_verification, Tiler, TemplateMatch
  - sfm:      RelativeOrientation, Triangulate, AbsoluteOrientation,
              SpaceResection, BundleAdjustment (replaces Metashape BA),
              PlaneSweepStereo (replaces Metashape dense)
  - utils:    config parsing, logging, timing, DSM/orthophoto builders
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/SfM kernels need true float32 matmuls; on TPU the default is
# bfloat16-accumulate which costs ~3 decimal digits (fatal for projection
# matrices with 1e3-scale focals). Hot model paths opt into bf16
# explicitly via dtypes, so this only affects f32 x f32 contractions.
_jax.config.update("jax_default_matmul_precision", "highest")

from icepy4d_tpu.core import (  # noqa: F401
    Calibration,
    Camera,
    Epoch,
    Epoches,
    EpochDataMap,
    Features,
    FeatureSet,
    Image,
    ImageDS,
    PointCloud,
    Points,
    PointSet,
    Targets,
)


_LAZY_SUBMODULES = ("core", "io", "matching", "models", "parallel",
                    "sfm", "utils", "visualization")


def __getattr__(name):
    # lazy: Pipeline pulls the full matching/sfm stack; keep base import
    # light. Submodules resolve lazily too, so the reference's
    # `from icepy4d import sfm` style works here unchanged.
    if name == "Pipeline":
        from icepy4d_tpu.pipeline import Pipeline

        return Pipeline
    if name in _LAZY_SUBMODULES:
        import importlib

        return importlib.import_module(f"icepy4d_tpu.{name}")
    raise AttributeError(name)
