"""Synthetic Blender-format scene generator.

Produces a tiny ray-traced scene in the exact directory layout of
`nerf_synthetic` (``transforms_{train,val,test}.json`` + RGBA PNGs), so the
full pipeline — loader, training, inference, monitors — runs hermetically with
no dataset download (the reference's tests require the real lego scene on
disk; SURVEY.md §4 calls for synthetic fixtures instead).

The scene is a fixed arrangement of colored Lambertian spheres inside the
standard Blender camera orbit (near=2, far=6, cameras at radius ~4). Sphere
geometry is analytic, so ground truth is exact and view-consistent — a NeRF
trained on it must reproduce it, which gives tests and benchmarks a real
signal (PSNR climbing) rather than noise fitting.
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from keras_nerf_tpu.data.utils import get_focal_from_fov, pose_spherical

# (center xyz, radius, albedo rgb)
_SPHERES = (
    ((0.0, 0.0, 0.0), 0.9, (0.85, 0.25, 0.2)),
    ((0.8, 0.8, 0.3), 0.45, (0.2, 0.7, 0.9)),
    ((-0.8, -0.5, 0.5), 0.35, (0.95, 0.85, 0.2)),
)
_LIGHT_DIR = np.array([0.5, 0.6, 0.62])
_BLENDER_FOV = 0.6911112070083618  # camera_angle_x used by nerf_synthetic


def _trace(origin: np.ndarray, direction: np.ndarray) -> np.ndarray:
    """Ray-trace the sphere scene -> ``[H, W, 4]`` float RGBA in [0, 1]."""
    h, w, _ = direction.shape
    best_t = np.full((h, w), np.inf, dtype=np.float64)
    color = np.zeros((h, w, 3), dtype=np.float64)
    alpha = np.zeros((h, w), dtype=np.float64)
    light = _LIGHT_DIR / np.linalg.norm(_LIGHT_DIR)

    for center, radius, albedo in _SPHERES:
        oc = origin - np.asarray(center)
        b = np.sum(oc * direction, axis=-1)
        c = np.sum(oc * oc, axis=-1) - radius ** 2
        disc = b * b - c
        hit = disc > 0
        sqrt_disc = np.sqrt(np.where(hit, disc, 0.0))
        t = -b - sqrt_disc
        hit &= (t > 1e-6) & (t < best_t)
        point = origin + direction * t[..., None]
        normal = (point - np.asarray(center)) / radius
        lambert = 0.35 + 0.65 * np.clip(np.sum(normal * light, axis=-1), 0, 1)
        shaded = lambert[..., None] * np.asarray(albedo)
        best_t = np.where(hit, t, best_t)
        color = np.where(hit[..., None], shaded, color)
        alpha = np.where(hit, 1.0, alpha)

    return np.concatenate(
        [np.clip(color, 0, 1), alpha[..., None]], axis=-1).astype(np.float32)


def _camera_rays(c2w: np.ndarray, h: int, w: int, focal: float,
                 offset: float = 0.0):
    """Host-side pinhole rays matching :mod:`keras_nerf_tpu.data.rays`.

    ``offset`` shifts every pixel coordinate (used by supersampling so the
    box-filter footprint is CENTERED on the base pixel's ray)."""
    x, y = np.meshgrid(np.arange(w, dtype=np.float64) - offset,
                       np.arange(h, dtype=np.float64) - offset,
                       indexing="xy")
    x_c = (x - w * 0.5) / focal
    y_c = (y - h * 0.5) / focal
    cam = np.stack([x_c, -y_c, -np.ones_like(x_c)], axis=-1)
    direction = np.einsum("ij,hwj->hwi", c2w[:3, :3].astype(np.float64), cam)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    origin = np.broadcast_to(c2w[:3, -1].astype(np.float64), direction.shape)
    return origin, direction


def render_pose(c2w: np.ndarray, image_wh: int,
                supersample: int = 1) -> np.ndarray:
    """Render one ground-truth RGBA frame for a camera-to-world matrix.

    ``supersample > 1`` traces at that multiple and box-downsamples —
    antialiased, view-CONSISTENT edges like Blender's renders of
    `nerf_synthetic` (point-sampled hard silhouettes are not representable
    by any radiance field and cap the scene's reachable PSNR at ~29 dB)."""
    ss = max(int(supersample), 1)
    focal = get_focal_from_fov(_BLENDER_FOV, image_wh * ss)
    # Sub-sample k of base pixel i sits at fine coordinate ss*i + k; the
    # box filter's mean is ss*i + (ss-1)/2, i.e. HALF A PIXEL past the
    # base ray at coordinate i (data/rays.py uses no half-pixel offset).
    # Shifting the fine grid by (ss-1)/2 centers every footprint exactly
    # on its base pixel's training/eval ray.
    origin, direction = _camera_rays(c2w, image_wh * ss, image_wh * ss,
                                     focal, offset=(ss - 1) / 2.0)
    rgba = _trace(origin, direction)
    if ss == 1:
        return rgba
    return rgba.reshape(image_wh, ss, image_wh, ss, 4).mean(
        axis=(1, 3)).astype(np.float32)


def random_ray_batch(batch: int, height: int, width: int, n_coarse: int,
                     key, near: float = 2.0, far: float = 6.0):
    """A random (images, (origin, direction, points)) training batch.

    Shared by bench.py, the driver entry points, and tests — one place for
    the 'random pixels + fixed origin + unit directions + sorted depths'
    contract.
    """
    import jax
    import jax.numpy as jnp

    k1, k2, k3 = jax.random.split(key, 3)
    images = jax.random.uniform(k1, (batch, height, width, 4))
    origin = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (batch, height, width, 1))
    d = jax.random.normal(k2, (batch, height, width, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        k3, (batch, height, width, n_coarse), minval=near, maxval=far),
        axis=-1)
    return images, (origin, d, t)


def write_synthetic_scene(
    out_dir: str,
    image_wh: int = 64,
    n_train: int = 20,
    n_val: int = 4,
    n_test: int = 4,
    seed: int = 0,
    supersample: int = 1,
) -> str:
    """Write a Blender-format scene directory and return its path."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    counts = {"train": n_train, "val": n_val, "test": n_test}

    for split, n in counts.items():
        split_dir = os.path.join(out_dir, split)
        os.makedirs(split_dir, exist_ok=True)
        frames = []
        for i in range(n):
            theta = float(rng.uniform(0.0, 360.0))
            phi = float(rng.uniform(-60.0, -10.0))
            c2w = pose_spherical(theta, phi, 4.0)
            rgba = render_pose(c2w, image_wh, supersample)
            # Round to the nearest 8-bit code (truncation would bias every
            # mid-tone ~0.5 LSB dark, capping the scene's reachable PSNR).
            img = Image.fromarray(
                np.clip(np.round(rgba * 255), 0, 255).astype(np.uint8),
                mode="RGBA")
            img.save(os.path.join(split_dir, f"r_{i}.png"))
            frames.append({
                "file_path": f"./{split}/r_{i}",
                "transform_matrix": c2w.tolist(),
            })
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": _BLENDER_FOV, "frames": frames}, f)

    return out_dir
