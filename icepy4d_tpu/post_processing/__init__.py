"""Point-cloud post-processing (ref src/icepy4d/post_processing/).

Polyline cropping, cloud merging, meshing, and DEM differencing
(dem_of_difference lives in utils.dsm_orthophoto). Fully
self-contained: Poisson meshing runs a native screened-Poisson
pipeline (poisson.py — FFT solve on device + marching tetrahedra);
open3d is only used when explicitly requested.
"""

from icepy4d_tpu.post_processing.point_clouds import (  # noqa: F401
    DemOfDifference,
    filter_pcd_by_polyline,
    mesh_from_dsm_grid,
    meshing_poisson,
    read_and_merge_point_clouds,
)
from icepy4d_tpu.post_processing.poisson import (  # noqa: F401
    estimate_normals,
    marching_tetrahedra,
    poisson_reconstruct,
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
