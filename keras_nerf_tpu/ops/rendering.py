"""Volume-rendering quadrature.

Pure, shape-polymorphic JAX replacement for the reference's chunked and batched
TF renderers (`keras_nerf/model/nerf/utils.py:17-58,100-134`). One
implementation serves every leading shape (``[rays, S]`` chunks or
``[B, H, W, S]`` images) instead of the reference's two near-duplicates.

Numerical semantics are matched exactly to the production (chunk) variant:

* the last delta is padded with ``epsilon = 1e-10`` (reference `utils.py:35-37`
  — note this is the reference's quirk; the original paper pads with 1e10);
* transmittance is the *exclusive* cumulative product of ``1 - alpha + eps``
  (`utils.py:46-47`);
* white-background completion adds ``1 - sum(weights)`` (`utils.py:53-54`);
* the image is clipped to ``[0, 1]`` (`utils.py:56`).

TPU notes: everything here is VPU elementwise plus a tiny (S <= ~192)
cumulative product along the trailing sample axis; XLA keeps the whole
quadrature fused in registers/VMEM after the MLP matmuls. The sample axis
stays entirely on-chip — no cross-device traffic (SURVEY.md §5, long-context
note).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RenderOutput(NamedTuple):
    """Rendered quantities for a set of rays."""

    image: jnp.ndarray   # [..., 3]
    depth: jnp.ndarray   # [...]
    weights: jnp.ndarray  # [..., S]


def exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative product along the last axis.

    ``out[..., i] = prod(x[..., :i])`` with ``out[..., 0] == 1``. Implemented
    as an inclusive cumprod shifted right by one, which XLA lowers to a single
    fused scan on TPU.
    """
    inclusive = jnp.cumprod(x, axis=-1)
    ones = jnp.ones_like(x[..., :1])
    return jnp.concatenate([ones, inclusive[..., :-1]], axis=-1)


def render_rays(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    sample_points: jnp.ndarray,
    *,
    white_background: bool = False,
    epsilon: float = 1e-10,
) -> RenderOutput:
    """Volume-render radiance/density samples into image, depth and weights.

    Args:
      rgb: ``[..., S, 3]`` per-sample radiance in [0, 1].
      sigma: ``[..., S, 1]`` or ``[..., S]`` per-sample density (>= 0).
      sample_points: ``[..., S]`` depths of the samples along each ray.
      white_background: complete the image over white using the residual
        transmittance (static).
      epsilon: stabilizer used both in the delta pad and inside the cumprod.

    Returns:
      :class:`RenderOutput` of ``(image [..., 3], depth [...], weights [..., S])``.

    Reference: `keras_nerf/model/nerf/utils.py:17-58`.
    """
    if sigma.ndim == rgb.ndim:
        sigma = sigma[..., 0]
    compute_dtype = sample_points.dtype
    sigma = sigma.astype(compute_dtype)

    delta = sample_points[..., 1:] - sample_points[..., :-1]
    pad = jnp.full_like(sample_points[..., :1], epsilon)
    delta = jnp.concatenate([delta, pad], axis=-1)

    alpha = 1.0 - jnp.exp(-sigma * delta)
    transmittance = exclusive_cumprod(1.0 - alpha + epsilon)
    weights = alpha * transmittance

    image = jnp.sum(weights[..., None] * rgb.astype(compute_dtype), axis=-2)
    depth = jnp.sum(weights * sample_points, axis=-1)

    if white_background:
        image = image + (1.0 - jnp.sum(weights, axis=-1))[..., None]

    image = jnp.clip(image, 0.0, 1.0)
    return RenderOutput(image=image, depth=depth, weights=weights)
