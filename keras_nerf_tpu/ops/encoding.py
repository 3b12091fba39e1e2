"""Positional encoding and ray-point expansion.

Pure, jit-able JAX functions replacing the TF kernels in the reference
(`keras_nerf/model/nerf/utils.py:177-210`). Semantics are bit-matched:

* frequencies are exactly ``2**i`` (NOT the pi-scaled variant of the paper) —
  reference `utils.py:183`;
* the raw coordinate is prepended, then for each frequency ``i`` the pair
  ``sin(2**i x), cos(2**i x)`` is appended — output dim ``D * (1 + 2 L)``.

TPU notes: the encoding is pure VPU work and fuses into the first MLP matmul
under XLA; we compute sin/cos from a single broadcast multiply so the
intermediate ``[..., L, D]`` tensor is laid out contiguously on the lane axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """``[x] ++ [sin(2^i x), cos(2^i x) for i in 0..L-1]`` along the last axis.

    Args:
      x: ``[..., D]`` coordinates.
      num_freqs: L, the number of frequency octaves (static).

    Returns:
      ``[..., D * (1 + 2 * L)]`` encoded features, same dtype as ``x``.

    Reference: `keras_nerf/model/nerf/utils.py:177-186`.
    """
    if num_freqs == 0:
        return x
    dtype = x.dtype
    freqs = (2.0 ** jnp.arange(num_freqs, dtype=dtype))  # [L]
    # [..., 1, D] * [L, 1] -> [..., L, D]
    scaled = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # Interleave per-frequency (sin_i, cos_i) pairs to match the reference's
    # concat order: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...].
    pairs = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    # [..., L, 2, D] -> [..., L * 2 * D]
    encoded = pairs.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    return jnp.concatenate([x, encoded], axis=-1)


def encoded_dim(d: int, num_freqs: int) -> int:
    """Output feature size of :func:`positional_encoding` for ``d`` input dims."""
    return d * (1 + 2 * num_freqs)


def encode_position_and_directions(
    ray_origin: jnp.ndarray,
    ray_direction: jnp.ndarray,
    sample_points: jnp.ndarray,
    pos_emb_xyz: int,
    pos_emb_dir: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand rays into per-sample world points and encode points + directions.

    ``p = o + t * d`` (reference `utils.py:189-210`): directions are broadcast
    per-sample (every sample of a ray shares its ray's encoded direction).

    Args:
      ray_origin: ``[..., 3]``.
      ray_direction: ``[..., 3]`` (unit norm).
      sample_points: ``[..., S]`` depths along each ray.

    Returns:
      ``(enc_xyz [..., S, 3(1+2Lx)], enc_dir [..., S, 3(1+2Ld)])``.
    """
    positions = (
        ray_origin[..., None, :]
        + ray_direction[..., None, :] * sample_points[..., None]
    )
    enc_xyz = positional_encoding(positions, pos_emb_xyz)
    directions = jnp.broadcast_to(
        ray_direction[..., None, :], positions.shape)
    enc_dir = positional_encoding(directions, pos_emb_dir)
    return enc_xyz, enc_dir
