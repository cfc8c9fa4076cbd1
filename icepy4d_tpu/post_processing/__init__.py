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
from icepy4d_tpu.post_processing.analysis import (  # noqa: F401
    VoxelGrid,
    border_statistics,
    detect_border,
    extract_section,
    extract_sections,
    geometric_features,
    make_pairs,
    plot_sections,
    volume_variations,
    voxel_mesh,
    voxelize,
    write_border_time_series,
    write_voxel_centers,
)
