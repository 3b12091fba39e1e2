import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_nerf_tpu.ops import exclusive_cumprod, render_rays


def test_exclusive_cumprod():
    x = jnp.asarray([[2.0, 3.0, 4.0]])
    out = np.asarray(exclusive_cumprod(x))
    np.testing.assert_allclose(out, [[1.0, 2.0, 6.0]])


def test_render_golden_tiny():
    """Hand-computed 1-ray, 3-sample case with the reference's epsilon rules."""
    eps = 1e-10
    t = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    sigma = np.array([[[0.5], [1.0], [2.0]]], dtype=np.float32)
    rgb = np.array([[[1.0, 0.0, 0.0],
                     [0.0, 1.0, 0.0],
                     [0.0, 0.0, 1.0]]], dtype=np.float32)

    delta = np.array([1.0, 1.0, eps])
    alpha = 1.0 - np.exp(-sigma[0, :, 0] * delta)
    trans = np.array([
        1.0,
        (1.0 - alpha[0] + eps),
        (1.0 - alpha[0] + eps) * (1.0 - alpha[1] + eps),
    ])
    weights = alpha * trans
    image = (weights[:, None] * rgb[0]).sum(0)
    depth = (weights * t[0]).sum()

    out = render_rays(jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t))
    # atol covers the last sample's fp32-degenerate weight (~1e-11: the
    # epsilon-padded final delta underflows to alpha == 0 in float32).
    np.testing.assert_allclose(
        np.asarray(out.weights[0]), weights, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(out.image[0]), image, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.depth[0]), depth, rtol=1e-5)


def test_render_zero_sigma_is_black():
    t = jnp.linspace(2.0, 6.0, 8)[None, :]
    rgb = jnp.ones((1, 8, 3)) * 0.7
    sigma = jnp.zeros((1, 8, 1))
    out = render_rays(rgb, sigma, t)
    np.testing.assert_allclose(np.asarray(out.image), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.weights), 0.0, atol=1e-6)


def test_render_white_background_completion():
    t = jnp.linspace(2.0, 6.0, 8)[None, :]
    rgb = jnp.zeros((1, 8, 3))
    sigma = jnp.zeros((1, 8, 1))
    out = render_rays(rgb, sigma, t, white_background=True)
    # Empty space over white background renders white.
    np.testing.assert_allclose(np.asarray(out.image), 1.0, atol=1e-5)


def test_render_opaque_first_sample():
    t = jnp.linspace(2.0, 6.0, 16)[None, :]
    rgb = jnp.broadcast_to(
        jnp.asarray([0.2, 0.4, 0.8]), (1, 16, 3))
    sigma = jnp.full((1, 16, 1), 1e6)
    out = render_rays(rgb, sigma, t)
    np.testing.assert_allclose(
        np.asarray(out.image[0]), [0.2, 0.4, 0.8], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth[0]), 2.0, atol=1e-3)


@pytest.mark.parametrize("shape", [(32,), (2, 4, 4)])
def test_render_shape_polymorphic(shape):
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    s = 12
    t = jnp.sort(jax.random.uniform(k1, (*shape, s), minval=2.0, maxval=6.0))
    rgb = jax.random.uniform(k2, (*shape, s, 3))
    sigma = jax.random.uniform(k3, (*shape, s, 1))
    out = render_rays(rgb, sigma, t, white_background=True)
    assert out.image.shape == (*shape, 3)
    assert out.depth.shape == shape
    assert out.weights.shape == (*shape, s)
    img = np.asarray(out.image)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # Weight sums are in (0, 1].
    wsum = np.asarray(out.weights).sum(-1)
    assert (wsum >= 0).all() and (wsum <= 1 + 1e-5).all()


def test_render_grad_finite():
    def loss(sigma):
        t = jnp.linspace(2.0, 6.0, 8)[None, :]
        rgb = jnp.full((1, 8, 3), 0.5)
        out = render_rays(rgb, sigma, t)
        return jnp.sum(out.image)

    g = jax.grad(loss)(jnp.full((1, 8, 1), 0.3))
    assert np.isfinite(np.asarray(g)).all()
