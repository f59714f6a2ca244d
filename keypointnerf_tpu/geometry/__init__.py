from .cameras import (
    compose_krt,
    world_to_cam,
    cam_to_world,
    camera_center,
    project_points,
    ndc_xy,
    ndc_z,
    pixel_grid,
    camera_rays,
)
from .aabb import ray_aabb_intersection, rays_at_box_mask
from .sampling import (
    stratified_z,
    importance_z,
    union_sorted_z,
    merge_sorted_payloads,
)
from .compositing import composite

__all__ = [
    "compose_krt",
    "world_to_cam",
    "cam_to_world",
    "camera_center",
    "project_points",
    "ndc_xy",
    "ndc_z",
    "pixel_grid",
    "camera_rays",
    "ray_aabb_intersection",
    "rays_at_box_mask",
    "stratified_z",
    "importance_z",
    "union_sorted_z",
    "merge_sorted_payloads",
    "composite",
]
