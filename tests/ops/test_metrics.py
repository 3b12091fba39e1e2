import jax
import jax.numpy as jnp
import numpy as np

from keras_nerf_tpu.ops import mse, psnr, ssim


def test_mse():
    a = jnp.zeros((2, 4, 4, 3))
    b = jnp.full((2, 4, 4, 3), 0.5)
    np.testing.assert_allclose(float(mse(a, b)), 0.25, rtol=1e-6)


def test_psnr_golden():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20 dB at max_val 1.
    np.testing.assert_allclose(np.asarray(psnr(a, b)), [20.0], rtol=1e-4)


def test_psnr_identical_is_large():
    a = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    p = np.asarray(psnr(a, a))
    assert (p > 60).all() or np.isinf(p).all()


def test_ssim_identity():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    s = np.asarray(ssim(img, img))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_ssim_constant_images_analytic():
    """For constant images a, b: variance terms vanish, ssim = luminance."""
    a_val, b_val = 0.3, 0.7
    a = jnp.full((1, 24, 24, 3), a_val)
    b = jnp.full((1, 24, 24, 3), b_val)
    c1 = 0.01 ** 2
    want = (2 * a_val * b_val + c1) / (a_val ** 2 + b_val ** 2 + c1)
    np.testing.assert_allclose(np.asarray(ssim(a, b)), [want], rtol=1e-4)


def test_ssim_ordering():
    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (1, 32, 32, 3))
    small_noise = img + 0.01 * jax.random.normal(jax.random.PRNGKey(2), img.shape)
    big_noise = img + 0.2 * jax.random.normal(jax.random.PRNGKey(3), img.shape)
    s_small = float(ssim(img, jnp.clip(small_noise, 0, 1))[0])
    s_big = float(ssim(img, jnp.clip(big_noise, 0, 1))[0])
    assert s_small > s_big


def test_metrics_jit():
    f = jax.jit(lambda a, b: (psnr(a, b), ssim(a, b)))
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.full((1, 16, 16, 3), 0.2)
    p, s = f(a, b)
    assert p.shape == (1,) and s.shape == (1,)
