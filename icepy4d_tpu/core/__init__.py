"""Core data model: cameras, images, features, points, targets, epochs.

Design: every container that touches device compute is a padded,
masked struct-of-arrays `flax.struct` pytree (FeatureSet, PointSet,
Camera) so it drops straight into jit/vmap/shard_map with static shapes.
Host-side convenience wrappers (Features, Points) keep the reference's
growable-dict ergonomics and convert to/from the padded pytrees.
"""

from icepy4d_tpu.core.calibration import Calibration, read_opencv_calibration
from icepy4d_tpu.core.camera import Camera
from icepy4d_tpu.core.constants import DATE_FMT, DATETIME_FMT, TIME_FMT
from icepy4d_tpu.core.epoch import Epoch, EpochDataMap, Epoches
from icepy4d_tpu.core.features import Features, FeatureSet
from icepy4d_tpu.core.images import Image, ImageDS, read_image
from icepy4d_tpu.core.point_cloud import PointCloud
from icepy4d_tpu.core.points import Points, PointSet
from icepy4d_tpu.core.targets import Targets

__all__ = [
    "Calibration",
    "read_opencv_calibration",
    "Camera",
    "DATETIME_FMT",
    "DATE_FMT",
    "TIME_FMT",
    "Epoch",
    "Epoches",
    "EpochDataMap",
    "Features",
    "FeatureSet",
    "Image",
    "ImageDS",
    "read_image",
    "PointCloud",
    "Points",
    "PointSet",
    "Targets",
]
