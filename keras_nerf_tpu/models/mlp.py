"""The NeRF radiance-field MLP as a functional init/apply pair.

Replaces the reference's Keras ``NeRFMLP`` (`keras_nerf/model/nerf/mlp.py:4-59`)
with a plain parameter pytree + pure apply function — the idiomatic JAX shape
that jits, vmaps, shards, and feeds Pallas kernels without framework wrappers.

Architecture (matched to `mlp.py:11-50`):

* trunk: ``n_layers`` x Dense(dense_units, relu);
* skip: the *encoded xyz input* is re-concatenated after trunk layer ``i``
  whenever ``i % skip_layer == 0 and i > 0`` (`mlp.py:36-38`) — at defaults
  (8 layers, skip 4) that is exactly once, after layer 4;
* ``sigma = Dense(1, relu)`` from the trunk output (`mlp.py:17-18,40`);
* ``features = Dense(dense_units, linear)`` concat encoded view direction
  (`mlp.py:20-21,42-44`);
* ``rgb_features = Dense(dense_units // 2, linear)`` (`mlp.py:23-24,46` — NO
  activation in the reference);
* ``rgb = Dense(3, sigmoid)`` (`mlp.py:26-27,48`).

Initialization: glorot-uniform kernels, zero biases (Keras Dense defaults,
`mlp.py:5`).

TPU notes: parameters are kept in float32 (master copy); ``apply_mlp`` casts
activations and kernels to ``compute_dtype`` (bfloat16 by default on TPU) so
every matmul hits the MXU at full rate, with float32 ``preferred_element_type``
accumulation. At 256-wide the full weight set is ~1.5 MB fp32 — it stays
VMEM-resident across a whole ray chunk.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Static architecture hyperparameters (reference `mlp.py:5-9`)."""

    n_layers: int = 8
    dense_units: int = 256
    skip_layer: int = 4

    def skip_indices(self) -> tuple[int, ...]:
        return tuple(
            i for i in range(self.n_layers)
            if i % self.skip_layer == 0 and i > 0
        )


def _glorot_uniform(key: jax.Array, fan_in: int, fan_out: int) -> jnp.ndarray:
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        key, (fan_in, fan_out), minval=-limit, maxval=limit, dtype=jnp.float32)


def _dense_init(key: jax.Array, fan_in: int, fan_out: int) -> Params:
    return {
        "kernel": _glorot_uniform(key, fan_in, fan_out),
        "bias": jnp.zeros((fan_out,), dtype=jnp.float32),
    }


def init_mlp(
    key: jax.Array,
    config: MLPConfig,
    in_xyz: int,
    in_dir: int,
) -> Params:
    """Initialize the parameter pytree.

    Args:
      key: PRNG key.
      config: static architecture config.
      in_xyz: encoded-position feature size (``3 * (1 + 2 * pos_emb_xyz)``).
      in_dir: encoded-direction feature size (``3 * (1 + 2 * pos_emb_dir)``).
    """
    n_keys = config.n_layers + 4
    keys = jax.random.split(key, n_keys)
    skip = set(config.skip_indices())

    trunk = []
    width = in_xyz
    for i in range(config.n_layers):
        trunk.append(_dense_init(keys[i], width, config.dense_units))
        width = config.dense_units
        if i in skip:
            width += in_xyz

    k = config.n_layers
    return {
        "trunk": trunk,
        "sigma": _dense_init(keys[k], width, 1),
        "features": _dense_init(keys[k + 1], width, config.dense_units),
        "rgb_features": _dense_init(
            keys[k + 2], config.dense_units + in_dir, config.dense_units // 2),
        "rgb": _dense_init(keys[k + 3], config.dense_units // 2, 3),
    }


def _dense(x: jnp.ndarray, p: Params, compute_dtype) -> jnp.ndarray:
    kernel = p["kernel"].astype(compute_dtype)
    bias = p["bias"].astype(compute_dtype)
    return jnp.dot(x, kernel, preferred_element_type=compute_dtype) + bias


def apply_mlp(
    params: Params,
    enc_xyz: jnp.ndarray,
    enc_dir: jnp.ndarray,
    config: MLPConfig,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass: ``(enc_xyz [..., Dx], enc_dir [..., Dd]) -> (rgb [..., 3],
    sigma [..., 1])``, both returned in float32.

    Reference: `keras_nerf/model/nerf/mlp.py:29-50`.
    """
    skip = set(config.skip_indices())
    inputs = enc_xyz.astype(compute_dtype)
    dirs = enc_dir.astype(compute_dtype)

    x = inputs
    for i, layer in enumerate(params["trunk"]):
        x = jax.nn.relu(_dense(x, layer, compute_dtype))
        if i in skip:
            x = jnp.concatenate([x, inputs], axis=-1)

    sigma = jax.nn.relu(_dense(x, params["sigma"], compute_dtype))

    features = _dense(x, params["features"], compute_dtype)
    features = jnp.concatenate([features, dirs], axis=-1)
    rgb_features = _dense(features, params["rgb_features"], compute_dtype)
    rgb = jax.nn.sigmoid(_dense(rgb_features, params["rgb"], compute_dtype))

    return rgb.astype(jnp.float32), sigma.astype(jnp.float32)


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
