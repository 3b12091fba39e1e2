"""Image metrics: MSE, PSNR, SSIM.

JAX equivalents of the TF metrics used by the reference training loop
(`keras_nerf/model/nerf/nerf.py:306-330`): ``tf.image.psnr`` and
``tf.image.ssim`` with ``max_val=1`` and TF defaults
(``filter_size=11, filter_sigma=1.5, k1=0.01, k2=0.03``).

SSIM follows tf.image.ssim's computation: separable 11x11 Gaussian windows
applied per channel with VALID padding, uncorrected (biased) moments, the
luminance * contrast-structure product averaged over space and channels.
The Gaussian blurs are depthwise convs — MXU-friendly and fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Global mean squared error (scalar)."""
    return jnp.mean(jnp.square(pred - target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR over ``[B, H, W, C]`` -> ``[B]`` (tf.image.psnr parity).

    Reference use: `keras_nerf/model/nerf/nerf.py:309-310`.
    """
    axes = tuple(range(1, pred.ndim))
    err = jnp.mean(jnp.square(pred - target), axis=axes)
    return 10.0 * (jnp.log10(max_val ** 2) - jnp.log10(err))


def _gaussian_kernel(filter_size: int, filter_sigma: float) -> np.ndarray:
    """1-D Gaussian window, normalized, matching tf.image.ssim's fspecial."""
    coords = np.arange(filter_size, dtype=np.float64) - (filter_size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * filter_sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur_1d(x: jnp.ndarray, window: jnp.ndarray, axis: int) -> jnp.ndarray:
    """VALID depthwise 1-D convolution of ``[B, H, W, C]`` along H or W."""
    c = x.shape[-1]
    if axis == 1:
        kernel = window.reshape(-1, 1, 1, 1)
    else:
        kernel = window.reshape(1, -1, 1, 1)
    kernel = jnp.tile(kernel.astype(x.dtype), (1, 1, 1, c))  # HWIO, I=1 (depthwise)
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # TPU lowers f32 convs to bf16 MXU passes by default; the blur must
        # stay f32 or the sigma^2 = blur(x^2) - mu^2 cancellation loses to
        # the +-C2 stabilizers and the SSIM map blows past [-1, 1]
        # (observed 1.3-2.7 on real training renders).
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Per-image SSIM over ``[B, H, W, C]`` -> ``[B]`` (tf.image.ssim parity).

    Reference use: `keras_nerf/model/nerf/nerf.py:311-312`.

    Deviation from tf.image.ssim: for images smaller than ``filter_size``
    (where TF raises), the window is clamped to ``min(filter_size, H, W)`` so
    small debug renders still produce a finite value.
    """
    filter_size = min(filter_size, img1.shape[1], img1.shape[2])
    window = jnp.asarray(_gaussian_kernel(filter_size, filter_sigma))

    def blur(x):
        return _depthwise_blur_1d(_depthwise_blur_1d(x, window, 1), window, 2)

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu12

    luminance = (2.0 * mu12 + c1) / (mu1_sq + mu2_sq + c1)
    cs = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = luminance * cs
    return jnp.mean(ssim_map, axis=tuple(range(1, ssim_map.ndim)))
