"""Point-cloud post-processing (ref src/icepy4d/post_processing/).

Polyline cropping, cloud merging, meshing, and DEM differencing
(dem_of_difference lives in utils.dsm_orthophoto). open3d is optional:
self-contained implementations are used everywhere; the Poisson mesher
delegates to open3d when present and otherwise falls back to a
DSM-grid mesh.
"""

from icepy4d_tpu.post_processing.point_clouds import (  # noqa: F401
    DemOfDifference,
    filter_pcd_by_polyline,
    mesh_from_dsm_grid,
    meshing_poisson,
    read_and_merge_point_clouds,
)
