import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_nerf_tpu.ops import (
    encode_position_and_directions,
    encoded_dim,
    positional_encoding,
)


def naive_positional_encoding(x, num_freqs):
    """Literal transcription of the reference loop semantics for testing."""
    parts = [x]
    for i in range(num_freqs):
        for fn in (np.sin, np.cos):
            parts.append(fn(2.0 ** i * x))
    return np.concatenate(parts, axis=-1)


@pytest.mark.parametrize("num_freqs", [0, 1, 4, 10])
def test_positional_encoding_matches_naive(num_freqs):
    x = np.random.default_rng(0).normal(size=(5, 7, 3)).astype(np.float32)
    got = np.asarray(positional_encoding(jnp.asarray(x), num_freqs))
    want = naive_positional_encoding(x, num_freqs)
    assert got.shape == want.shape == (5, 7, 3 * (1 + 2 * num_freqs))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_encoded_dim():
    assert encoded_dim(3, 10) == 63
    assert encoded_dim(3, 4) == 27
    assert encoded_dim(3, 0) == 3


def test_encode_position_and_directions_shapes_and_values():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    origin = jax.random.normal(k1, (4, 3))
    direction = jax.random.normal(k2, (4, 3))
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    points = jnp.sort(jax.random.uniform(k3, (4, 6), minval=2.0, maxval=6.0))

    enc_xyz, enc_dir = encode_position_and_directions(
        origin, direction, points, pos_emb_xyz=10, pos_emb_dir=4)
    assert enc_xyz.shape == (4, 6, 63)
    assert enc_dir.shape == (4, 6, 27)

    # The raw (un-encoded) leading 3 dims must equal o + t*d.
    want_pos = np.asarray(origin)[:, None, :] + \
        np.asarray(direction)[:, None, :] * np.asarray(points)[..., None]
    np.testing.assert_allclose(
        np.asarray(enc_xyz[..., :3]), want_pos, rtol=1e-6, atol=1e-6)
    # Every sample of a ray shares the ray's direction.
    np.testing.assert_allclose(
        np.asarray(enc_dir[..., :3]),
        np.broadcast_to(np.asarray(direction)[:, None, :], (4, 6, 3)),
        rtol=1e-6)


def test_encoding_jits():
    f = jax.jit(lambda x: positional_encoding(x, 10))
    out = f(jnp.ones((2, 3)))
    assert out.shape == (2, 63)
