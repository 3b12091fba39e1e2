"""Per-pixel pinhole ray generation.

JAX replacement for the reference ``RaysGenerator``
(`keras_nerf/data/rays.py:69-130`) as pure jit-able functions. The pinhole
model is matched exactly:

* camera coords ``x_c = (x - W/2) / f``, ``y_c = (y - H/2) / f``
  (`rays.py:89-90`) — no half-pixel offset, as in the reference;
* OpenGL-style camera vector ``[x_c, -y_c, -1]`` (`rays.py:93-94`);
* world direction ``R @ v`` then L2-normalized (`rays.py:99-109`);
* origin = broadcast ``c2w[:3, -1]`` (`rays.py:112-113`);
* stratified depths from :func:`keras_nerf_tpu.ops.stratified_sample_points`
  (`rays.py:116-127`) with correct ``[H, W, N]`` noise shape (the reference's
  ``[W, H, N]`` is a bug that is benign only for square images — SURVEY.md §7
  "known quirks").

TPU notes: ray generation is folded into the device-side input pipeline — a
single jitted call per batch of poses (meshgrid + one tiny matmul per pixel),
so the host only ever ships ``[B, 4, 4]`` pose matrices and image batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from keras_nerf_tpu.ops.sampling import stratified_sample_points


def camera_plane_directions(
    image_height: int, image_width: int, focal: float, dtype=jnp.float32
) -> jnp.ndarray:
    """``[H, W, 3]`` per-pixel camera-space view vectors ``[x_c, -y_c, -1]``."""
    x = jnp.arange(image_width, dtype=dtype)
    y = jnp.arange(image_height, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")  # [H, W]
    x_c = (xx - image_width * 0.5) / focal
    y_c = (yy - image_height * 0.5) / focal
    return jnp.stack([x_c, -y_c, -jnp.ones_like(x_c)], axis=-1)


def generate_rays(
    camera2world: jnp.ndarray,
    image_height: int,
    image_width: int,
    focal: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for one pose: ``[4, 4] -> (origin [H, W, 3], direction [H, W, 3])``.

    Directions are unit-norm; origins broadcast the camera position.
    """
    cam = camera_plane_directions(image_height, image_width, focal,
                                  camera2world.dtype)
    rotation = camera2world[:3, :3]
    translation = camera2world[:3, -1]
    # R @ v per pixel: contract the camera vector with the rotation rows.
    direction = jnp.einsum("ij,hwj->hwi", rotation, cam)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    origin = jnp.broadcast_to(translation, direction.shape)
    return origin, direction


@functools.partial(
    jax.jit,
    static_argnames=("image_height", "image_width", "n_samples"),
)
def generate_ray_batch(
    camera2world: jnp.ndarray,
    key: jax.Array,
    *,
    image_height: int,
    image_width: int,
    focal: float | jnp.ndarray,
    near: float,
    far: float,
    n_samples: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched rays + stratified depths: ``[B, 4, 4] -> ([B, H, W, 3] x2,
    [B, H, W, N])``.

    One jitted call per batch — the device-side input pipeline that replaces
    the reference's tf.data map of ``RaysGenerator`` (`loader.py:96-98`).
    Each pose in the batch gets an independent jitter key.
    """
    batch = camera2world.shape[0]

    def one(c2w):
        return generate_rays(c2w, image_height, image_width, focal)

    origin, direction = jax.vmap(one)(camera2world)
    keys = jax.random.split(key, batch)
    points = jax.vmap(
        lambda k: stratified_sample_points(
            k, (image_height, image_width), n_samples, near, far)
    )(keys)
    return origin, direction, points


@functools.partial(
    jax.jit,
    static_argnames=("batch", "image_height", "image_width", "n_samples"),
)
def sample_random_ray_batch(
    images: jnp.ndarray,
    poses: jnp.ndarray,
    key: jax.Array,
    *,
    batch: int,
    image_height: int,
    image_width: int,
    focal: float | jnp.ndarray,
    near: float,
    far: float,
    n_samples: int,
):
    """A training batch of rays drawn at RANDOM (image, pixel) pairs across
    the WHOLE split — the pixel-sampling mode (``--pixel_sampling``).

    The reference batches whole images (`loader.py:101-107`), so every
    optimizer step sees rays of only ``batch_size`` viewpoints; sampling
    rays across all views gives each step full gradient diversity (the
    original NeRF paper trains this way) and reaches a given PSNR in far
    less wall-clock. Everything stays device-side: pixel/pose gathers and
    ray math run in this one jitted call.

    Returns ``(pixels [batch, H, W, 4], (origin, direction, points))`` — a
    "virtual image" batch with exactly the shapes of a whole-image batch,
    so the engine, ray chunking and mesh sharding are unchanged. Pixel-wise
    losses/PSNR are exact; SSIM is computed over scrambled pixels and is
    not meaningful in this mode.
    """
    n = images.shape[0]
    r = batch * image_height * image_width
    k_idx, k_t = jax.random.split(key)
    flat = jax.random.randint(k_idx, (r,), 0, n * image_height * image_width)
    img_idx = flat // (image_height * image_width)
    py = (flat // image_width) % image_height
    px = flat % image_width

    pixels = images[img_idx, py, px]                       # [R, 4]
    c2w = poses[img_idx]                                   # [R, 4, 4]
    x_c = (px.astype(jnp.float32) - image_width * 0.5) / focal
    y_c = (py.astype(jnp.float32) - image_height * 0.5) / focal
    cam = jnp.stack([x_c, -y_c, -jnp.ones_like(x_c)], axis=-1)
    direction = jnp.einsum("rij,rj->ri", c2w[:, :3, :3], cam)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    origin = c2w[:, :3, -1]
    points = stratified_sample_points(k_t, (r,), n_samples, near, far)

    shape = (batch, image_height, image_width)
    return (pixels.reshape(*shape, 4),
            (origin.reshape(*shape, 3), direction.reshape(*shape, 3),
             points.reshape(*shape, n_samples)))
