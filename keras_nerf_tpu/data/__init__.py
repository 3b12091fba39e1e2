"""Data tier: Blender scene loading, device-side ray generation, batching."""

from keras_nerf_tpu.data.image import load_image, load_images
from keras_nerf_tpu.data.loader import DatasetLoader, NeRFDataset
from keras_nerf_tpu.data.rays import (
    camera_plane_directions,
    generate_ray_batch,
    generate_rays,
)
from keras_nerf_tpu.data.synthetic import render_pose, write_synthetic_scene
from keras_nerf_tpu.data.utils import (
    get_focal_from_fov,
    get_rotation_phi,
    get_rotation_theta,
    get_translation_t,
    pose_spherical,
)

__all__ = [
    "DatasetLoader",
    "NeRFDataset",
    "camera_plane_directions",
    "generate_ray_batch",
    "generate_rays",
    "get_focal_from_fov",
    "get_rotation_phi",
    "get_rotation_theta",
    "get_translation_t",
    "load_image",
    "load_images",
    "pose_spherical",
    "render_pose",
    "write_synthetic_scene",
]
