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


def positional_encoding_block(
    x: jnp.ndarray, num_freqs: int, pad_to: int | None = None
) -> jnp.ndarray:
    """TPU-layout variant: ``[x, sin-block, cos-block]`` instead of the
    reference's per-frequency interleave.

    Produces the same feature SET as :func:`positional_encoding` in a
    different order — ``out[..., i] == positional_encoding(x)[..., block_permutation(D, L)[i]]``
    — but avoids the interleaving relayout (measured ~1.5x faster on VPU) and
    is the representation the fused Pallas ray-march kernel consumes (its
    packed first-layer weights are row-permuted to match). Optionally
    zero-pads the feature axis to ``pad_to`` for lane alignment.
    """
    dtype = x.dtype
    if num_freqs == 0:
        out = x
    else:
        freqs = (2.0 ** jnp.arange(num_freqs, dtype=dtype))
        scaled = (x[..., None, :] * freqs[:, None]).reshape(
            *x.shape[:-1], num_freqs * x.shape[-1])
        out = jnp.concatenate([x, jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    if pad_to is not None and out.shape[-1] < pad_to:
        pad = jnp.zeros((*out.shape[:-1], pad_to - out.shape[-1]), dtype)
        out = jnp.concatenate([out, pad], axis=-1)
    return out


def block_permutation(d: int, num_freqs: int) -> "list[int]":
    """Index map from block order to reference order.

    ``enc_block[..., i] == enc_ref[..., perm[i]]`` — used to permute the rows
    of reference-ordered first-layer weights when packing them for the fused
    kernel (and to realign parity tests).
    """
    perm = list(range(d))  # raw coords first in both orders
    for trig in (0, 1):  # sin block then cos block
        for l in range(num_freqs):
            for i in range(d):
                perm.append(d + l * 2 * d + trig * d + i)
    return perm


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
