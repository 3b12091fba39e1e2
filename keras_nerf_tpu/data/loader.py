"""Blender `nerf_synthetic` dataset assembly and batching.

Replaces the reference's tf.data pipeline (`keras_nerf/data/loader.py:13-113`)
with a host-array + device-compute design that fits both the data scale
(~100 images/split) and the TPU:

* all PNGs of a split are decoded once into one contiguous host array;
* pose matrices are parsed from ``transforms_{split}.json``
  (`loader.py:35-53` — ``.png`` appended to each frame's ``file_path``);
* per-batch ray origins/directions/stratified depths are computed ON DEVICE by
  a single jitted call (:func:`keras_nerf_tpu.data.rays.generate_ray_batch`) —
  the host only ships ``[B, H, W, 4]`` pixels and ``[B, 4, 4]`` poses;
* batch elements are whole images, batched with ``drop_remainder`` semantics
  (`loader.py:101-107`).

Deviation from the reference: its ``.shuffle(batch_size)`` buffer equals the
batch size, which barely shuffles (SURVEY.md §2 D4); the train split here gets
a full per-epoch permutation instead. Jitter is re-drawn every epoch from a
split-and-epoch-derived PRNG key.
"""

from __future__ import annotations

import json
import logging
import os
from collections.abc import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from keras_nerf_tpu.data.image import load_images
from keras_nerf_tpu.data.rays import (
    generate_ray_batch,
    sample_random_ray_batch,
)
from keras_nerf_tpu.data.utils import get_focal_from_fov

Batch = tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]


class NeRFDataset:
    """One split: host pixels + poses, iterated as device-ready ray batches.

    Iterating yields ``(images [B, H, W, 4], (ray_origin [B, H, W, 3],
    ray_direction [B, H, W, 3], sample_points [B, H, W, N]))`` — the same
    element contract as the reference's zipped tf.data dataset
    (`loader.py:100`).
    """

    def __init__(
        self,
        images: np.ndarray,
        poses: np.ndarray,
        *,
        focal: float,
        near: float,
        far: float,
        n_samples: int,
        batch_size: int,
        shuffle: bool,
        seed: int = 42,
        sharding=None,
    ):
        if images.shape[0] != poses.shape[0]:
            raise ValueError(
                f"images ({images.shape[0]}) and poses ({poses.shape[0]}) "
                "must have the same leading dimension")
        self.images = images
        self.poses = jnp.asarray(poses, dtype=jnp.float32)
        self.focal = float(focal)
        self.near = float(near)
        self.far = float(far)
        self.n_samples = int(n_samples)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.image_height = images.shape[1]
        self.image_width = images.shape[2]
        self.seed = int(seed)
        self._root_key = jax.random.PRNGKey(seed)
        self._epoch = 0
        self.sharding = sharding

    def __len__(self) -> int:
        return self.images.shape[0] // self.batch_size  # drop_remainder

    @property
    def num_examples(self) -> int:
        return self.images.shape[0]

    def __iter__(self) -> Iterator[Batch]:
        epoch_key = jax.random.fold_in(self._root_key, self._epoch)
        self._epoch += 1
        n = self.num_examples
        if self.shuffle:
            perm = np.asarray(
                jax.random.permutation(jax.random.fold_in(epoch_key, 0), n))
        else:
            perm = np.arange(n)
        for b in range(len(self)):
            idx = perm[b * self.batch_size:(b + 1) * self.batch_size]
            # Which images this batch holds (batch order) — consumed by
            # the occupancy probe-row cache (`NeRF._run_train_step`).
            self.last_indices = idx
            images = jnp.asarray(self.images[idx])
            rays = generate_ray_batch(
                self.poses[idx],
                jax.random.fold_in(epoch_key, 1 + b),
                image_height=self.image_height,
                image_width=self.image_width,
                focal=self.focal,
                near=self.near,
                far=self.far,
                n_samples=self.n_samples,
            )
            if self.sharding is not None:
                images = jax.device_put(images, self.sharding)
                rays = tuple(jax.device_put(r, self.sharding) for r in rays)
            yield images, rays

    def rebatch(self, batch_size: int) -> "NeRFDataset":
        """A view over the same images/poses with a different batch size
        (used by monitors when the split is smaller than the global batch)."""
        ds = NeRFDataset(
            self.images, np.asarray(self.poses),
            focal=self.focal, near=self.near, far=self.far,
            n_samples=self.n_samples, batch_size=batch_size,
            shuffle=self.shuffle, seed=self.seed, sharding=self.sharding)
        return ds

    def take(self, count: int) -> list[Batch]:
        """First ``count`` batches (tf.data ``take`` equivalent for monitors)."""
        out = []
        for i, batch in enumerate(self):
            if i >= count:
                break
            out.append(batch)
        return out


class RayBatchDataset:
    """Pixel-sampling train split: every batch draws ``batch*H*W`` rays at
    random (image, pixel) pairs across ALL images (``--pixel_sampling``;
    see :func:`keras_nerf_tpu.data.rays.sample_random_ray_batch`).

    Batches have exactly the whole-image element contract — ``(pixels
    [B, H, W, 4], (origin, direction, points))`` — so the engine, monitor
    and mesh paths need no changes. An epoch is ``len(self)`` steps, sized
    so the total rays per epoch equal one pass over every pixel.
    """

    # Batches are scrambled pixels, not images: windowed metrics (SSIM)
    # over them are not meaningful — NeRF.fit warns once (loss/PSNR exact).
    PIXELWISE_METRICS_ONLY = True

    def __init__(self, images: np.ndarray, poses: np.ndarray, *,
                 focal: float, near: float, far: float, n_samples: int,
                 batch_size: int, seed: int = 42, sharding=None):
        self.images = jnp.asarray(images)
        self.poses = jnp.asarray(poses, dtype=jnp.float32)
        self.focal = float(focal)
        self.near = float(near)
        self.far = float(far)
        self.n_samples = int(n_samples)
        self.batch_size = int(batch_size)
        self.image_height = images.shape[1]
        self.image_width = images.shape[2]
        self.seed = int(seed)
        self._root_key = jax.random.PRNGKey(seed)
        self._epoch = 0
        self.sharding = sharding

    def __len__(self) -> int:
        return max(1, self.images.shape[0] // self.batch_size)

    @property
    def num_examples(self) -> int:
        return self.images.shape[0]

    def __iter__(self) -> Iterator[Batch]:
        epoch_key = jax.random.fold_in(self._root_key, self._epoch)
        self._epoch += 1
        for b in range(len(self)):
            images, rays = sample_random_ray_batch(
                self.images, self.poses, jax.random.fold_in(epoch_key, b),
                batch=self.batch_size,
                image_height=self.image_height,
                image_width=self.image_width,
                focal=self.focal, near=self.near, far=self.far,
                n_samples=self.n_samples)
            if self.sharding is not None:
                images = jax.device_put(images, self.sharding)
                rays = tuple(jax.device_put(r, self.sharding) for r in rays)
            yield images, rays


class DatasetLoader:
    """Parses a Blender scene directory into per-split :class:`NeRFDataset`.

    API mirrors the reference ``DatasetLoader``
    (`keras_nerf/data/loader.py:13-113`).
    """

    def __init__(self, data_dir: str, white_background: bool = False,
                 resize_method: str = "lanczos", **_):
        self.data_dir = data_dir
        self.white_background = white_background
        self.resize_method = resize_method

    def _load_json(self, filename: str) -> dict:
        with open(filename) as f:
            return json.load(f)

    def _load_image_path_and_camera_param(
        self, json_config: dict
    ) -> tuple[list[str], np.ndarray]:
        """(paths, c2w [N, 4, 4]) — `.png` appended per `loader.py:48-49`."""
        image_paths = []
        camera_params = []
        for frame in json_config["frames"]:
            image_paths.append(
                os.path.join(self.data_dir, f"{frame['file_path']}.png"))
            camera_params.append(frame["transform_matrix"])
        return image_paths, np.asarray(camera_params, dtype=np.float32)

    def load_dataset(
        self,
        batch_size: int,
        image_width: int,
        image_height: int,
        near: float,
        far: float,
        n_sample: int,
        seed: int = 42,
        sharding=None,
        pixel_sampling: bool = False,
    ) -> list[NeRFDataset]:
        """Load ``(train, val, test)`` datasets (`loader.py:55-113`).

        ``pixel_sampling=True`` swaps the TRAIN split for a
        :class:`RayBatchDataset` (random rays across all views per step —
        faster wall-clock convergence than the reference's whole-image
        batches); val/test stay whole-image so their metrics are exact.
        """
        datasets = []
        for split_idx, subset in enumerate(["train", "val", "test"]):
            json_config = self._load_json(
                os.path.join(self.data_dir, f"transforms_{subset}.json"))
            focal = get_focal_from_fov(
                json_config["camera_angle_x"], image_width)
            image_paths, camera_params = \
                self._load_image_path_and_camera_param(json_config)
            images = load_images(
                image_paths, image_height, image_width, self.white_background,
                self.resize_method)
            # Per-split seed offset so --seed controls all data RNG (shuffle
            # order + stratified jitter) without correlating the splits.
            if pixel_sampling and subset == "train":
                datasets.append(RayBatchDataset(
                    images, camera_params,
                    focal=focal, near=near, far=far, n_samples=n_sample,
                    batch_size=batch_size, seed=seed + split_idx,
                    sharding=sharding,
                ))
            else:
                datasets.append(NeRFDataset(
                    images, camera_params,
                    focal=focal, near=near, far=far, n_samples=n_sample,
                    batch_size=batch_size, shuffle=(subset == "train"),
                    seed=seed + split_idx, sharding=sharding,
                ))
            logging.info("Loaded %s dataset. %d images.",
                         subset, len(image_paths))
        return datasets
