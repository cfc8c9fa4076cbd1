"""Structure-from-motion layer (ref src/icepy4d/sfm/__init__.py:2-4).

Same public classes as the reference — RelativeOrientation, Triangulate,
AbsoluteOrientation (alias Absolute_orientation), SpaceResection — but
every numeric path is a jitted, hypothesis/point-batched JAX kernel from
icepy4d_tpu.ops instead of sequential OpenCV/pydegensac/lmfit calls.
"""

from icepy4d_tpu.sfm.geometry import (  # noqa: F401
    estimate_pose,
    fundamental_from_cameras,
    project_points,
    undistort_points,
)
from icepy4d_tpu.sfm.two_view_geometry import RelativeOrientation  # noqa: F401
from icepy4d_tpu.sfm.triangulation import Triangulate  # noqa: F401
from icepy4d_tpu.sfm.absolute_orientation import (  # noqa: F401
    AbsoluteOrientation,
    Absolute_orientation,
    SpaceResection,
    Space_resection,
    pose_from_known_center,
)
from icepy4d_tpu.sfm.bundle import (  # noqa: F401
    BAConfig,
    BAOutput,
    BundleAdjustment,
)
