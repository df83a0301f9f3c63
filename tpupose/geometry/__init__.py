"""Geometry kernels: cameras, projection, epipolar distances, rays, triangulation.

All functions are pure jax.numpy, vmap/jit friendly, and use the standard
image convention (x = column, y = row) for 2D points. 3D is in dataset units
(meters for Campus/Shelf).
"""
from tpupose.geometry.cameras import (
    CameraSet,
    fundamental_from_krt,
    fundamental_matrices,
    make_camera_set,
    project_points,
)
from tpupose.geometry.epipolar import (
    epipolar_distance_directed,
    epipolar_distance_matrix,
    point_line_distance_2d,
)
from tpupose.geometry.rays import (
    back_project_rays,
    line_point_distance_3d,
    line_line_distance_3d,
)
from tpupose.geometry.triangulation import (
    dlt_design_rows,
    fuse_pairwise_humans,
    triangulate_joints,
    triangulate_pairwise,
    triangulate_top_down,
)

__all__ = [
    "CameraSet",
    "fundamental_from_krt",
    "fundamental_matrices",
    "make_camera_set",
    "project_points",
    "epipolar_distance_directed",
    "epipolar_distance_matrix",
    "point_line_distance_2d",
    "back_project_rays",
    "line_point_distance_3d",
    "line_line_distance_3d",
    "dlt_design_rows",
    "fuse_pairwise_humans",
    "triangulate_joints",
    "triangulate_pairwise",
    "triangulate_top_down",
]
