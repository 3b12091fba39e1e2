"""Image loading and alpha compositing.

Host-side replacement for the reference's TF ``ImageLoader``
(`keras_nerf/data/image.py:5-35`): read PNG -> float32 RGBA in [0, 1], resize
with antialiasing, composite RGB over a white or black background using the
alpha channel, re-append alpha, clip.

Runs on the host with PIL + NumPy (the dataset is ~100 images per split —
decode cost is trivial and images are cached as one contiguous array). The
reference's resize takes ``(width, height)`` where TF expects
``(height, width)`` (`image.py:22-23`) — benign for its square-only inputs; we
are H/W-correct (SURVEY.md §7 "known quirks").
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_image(
    path: str,
    image_height: int,
    image_width: int,
    white_background: bool = False,
) -> np.ndarray:
    """Load one PNG -> ``[H, W, 4]`` float32 RGBA in [0, 1], composited.

    Reference: `keras_nerf/data/image.py:18-35`.
    """
    with Image.open(path) as im:
        im = im.convert("RGBA")
        if im.size != (image_width, image_height):
            im = im.resize((image_width, image_height), Image.Resampling.LANCZOS)
        rgba = np.asarray(im, dtype=np.float32) / 255.0

    alpha = rgba[..., 3:4]
    rgb = rgba[..., :3]
    background = 1.0 if white_background else 0.0
    rgb = alpha * rgb + (1.0 - alpha) * background
    out = np.concatenate([rgb, alpha], axis=-1)
    return np.clip(out, 0.0, 1.0)


def load_images(
    paths: list[str],
    image_height: int,
    image_width: int,
    white_background: bool = False,
) -> np.ndarray:
    """Load a list of PNGs into one ``[N, H, W, 4]`` float32 array."""
    out = np.empty((len(paths), image_height, image_width, 4), dtype=np.float32)
    for i, p in enumerate(paths):
        out[i] = load_image(p, image_height, image_width, white_background)
    return out
