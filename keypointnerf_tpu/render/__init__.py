from .empty_cull import suggest_cull_budget
from .renderer import (
    render_cameras_scanned,
    render_image,
    render_images_batched,
    render_rays_chunked,
)
from .video import orbit_cameras, render_orbit, write_video, zju_orbit_schedule

__all__ = [
    "suggest_cull_budget",
    "render_cameras_scanned",
    "render_image",
    "render_images_batched",
    "render_rays_chunked",
    "orbit_cameras",
    "render_orbit",
    "write_video",
    "zju_orbit_schedule",
]
