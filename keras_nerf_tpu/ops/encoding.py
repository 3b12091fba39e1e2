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

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _selection_constants(d: int, num_freqs: int, order: str):
    """Per-lane frequency/selection constants for a one-matmul encoding.

    ``B [D, n]`` has exactly one nonzero per column (``2^l`` on the source
    coordinate), so ``x @ B`` produces every scaled argument EXACTLY (a
    single f32 product — bit-identical to the broadcast-multiply). The 0/1
    masks pick raw / sin / cos per lane. This formulation replaces the
    ``[..., L, D]`` broadcast + reshape, whose tiny trailing lane dim costs
    more in TPU relayouts than the entire sin/cos evaluation (measured ~6x).
    """
    n = d * (1 + 2 * num_freqs)
    b = np.zeros((d, n), np.float32)
    masks = np.zeros((3, n), np.float32)  # raw / sin / cos

    def put(lane, src, freq, kind):
        b[src, lane] = freq
        masks[kind, lane] = 1.0

    for i in range(d):
        put(i, i, 1.0, 0)
    for l in range(num_freqs):
        for i in range(d):
            if order == "interleave":
                sin_lane = d + (2 * l) * d + i
                cos_lane = d + (2 * l + 1) * d + i
            else:  # block: [x | all sin | all cos]
                sin_lane = d + l * d + i
                cos_lane = d + (num_freqs + l) * d + i
            put(sin_lane, i, 2.0 ** l, 1)
            put(cos_lane, i, 2.0 ** l, 2)
    return b, masks


def _encode(x: jnp.ndarray, num_freqs: int, order: str,
            pad_to: int | None = None) -> jnp.ndarray:
    if num_freqs == 0:
        out = x
    else:
        b, masks = _selection_constants(x.shape[-1], num_freqs, order)
        b = jnp.asarray(b, dtype=x.dtype)
        masks = jnp.asarray(masks, dtype=x.dtype)
        # HIGHEST precision is load-bearing: a DEFAULT-precision f32 dot on
        # TPU uses single-pass bf16 operands, which quantizes the coordinate
        # to ~2^-9 relative BEFORE the 2^l scaling — at the top octave
        # (2^9) that is a multi-radian phase error that turns the highest
        # encoding bands into noise. K is 3, so exactness costs nothing.
        rep = jnp.dot(x, b, preferred_element_type=x.dtype,
                      precision=jax.lax.Precision.HIGHEST)
        out = (masks[0] * rep + masks[1] * jnp.sin(rep)
               + masks[2] * jnp.cos(rep))
    if pad_to is not None and out.shape[-1] < pad_to:
        pad = jnp.zeros((*out.shape[:-1], pad_to - out.shape[-1]), x.dtype)
        out = jnp.concatenate([out, pad], axis=-1)
    return out


def positional_encoding(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """``[x] ++ [sin(2^i x), cos(2^i x) for i in 0..L-1]`` along the last axis.

    Args:
      x: ``[..., D]`` coordinates.
      num_freqs: L, the number of frequency octaves (static).

    Returns:
      ``[..., D * (1 + 2 * L)]`` encoded features, same dtype as ``x``.

    Reference: `keras_nerf/model/nerf/utils.py:177-186` (per-frequency
    (sin_i, cos_i) interleave; frequencies exactly ``2^i``, no pi scaling).
    """
    return _encode(x, num_freqs, "interleave")


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
    return _encode(x, num_freqs, "block", pad_to=pad_to)


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
