import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_nerf_tpu.data import generate_ray_batch, generate_rays, pose_spherical


@pytest.fixture
def c2w():
    # A real lego-style pose: orbit camera at radius 4.
    return jnp.asarray(pose_spherical(30.0, -30.0, 4.0))


def test_ray_shapes_and_norms(c2w):
    origin, direction = generate_rays(c2w, 32, 32, focal=34.72)
    assert origin.shape == (32, 32, 3)
    assert direction.shape == (32, 32, 3)
    norms = np.linalg.norm(np.asarray(direction), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # All origins equal the camera translation.
    np.testing.assert_allclose(
        np.asarray(origin),
        np.broadcast_to(np.asarray(c2w[:3, -1]), (32, 32, 3)), rtol=1e-6)


def test_rays_deterministic(c2w):
    o1, d1 = generate_rays(c2w, 16, 16, 17.0)
    o2, d2 = generate_rays(c2w, 16, 16, 17.0)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_center_pixel_looks_forward(c2w):
    """The pixel at (W/2, H/2) has camera vector [0,0,-1] -> world -R[:,2]."""
    _, direction = generate_rays(c2w, 33, 33, 16.5)
    # pixel x=16,y=16 -> x_c=(16-16.5)/f small offset; use a big focal to
    # make the center ray nearly the -z camera axis.
    _, direction = generate_rays(c2w, 32, 32, 1e6)
    want = -np.asarray(c2w[:3, 2])
    want = want / np.linalg.norm(want)
    got = np.asarray(direction[16, 16])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rays_no_nan(c2w):
    origin, direction = generate_rays(c2w, 64, 64, 69.44)
    assert np.isfinite(np.asarray(origin)).all()
    assert np.isfinite(np.asarray(direction)).all()


def test_generate_ray_batch(c2w):
    poses = jnp.stack([c2w, jnp.asarray(pose_spherical(120.0, -40.0, 4.0))])
    key = jax.random.PRNGKey(0)
    o, d, t = generate_ray_batch(
        poses, key, image_height=16, image_width=16,
        focal=17.0, near=2.0, far=6.0, n_samples=8)
    assert o.shape == (2, 16, 16, 3)
    assert d.shape == (2, 16, 16, 3)
    assert t.shape == (2, 16, 16, 8)
    arr = np.asarray(t)
    assert arr.min() >= 2.0 and arr.max() <= 6.0
    assert (np.diff(arr, axis=-1) > 0).all()
    # Batch elements get independent jitter.
    assert not np.allclose(arr[0], arr[1])


def test_ray_batch_jitter_bounds(c2w):
    """Mirror of reference `tests/data/test_rays.py:50-87`: jitter within one
    interval of the linspace grid."""
    near, far, n = 2.0, 6.0, 32
    o, d, t = generate_ray_batch(
        c2w[None], jax.random.PRNGKey(1), image_height=32, image_width=32,
        focal=34.72, near=near, far=far, n_samples=n)
    base = np.linspace(near, far, n)
    interval = (far - near) / n
    assert np.abs(np.asarray(t)[0] - base).max() <= interval / 2 + 1e-6


def test_non_square_rays():
    """H != W must be handled correctly (reference was square-only)."""
    c2w = jnp.asarray(pose_spherical(10.0, -20.0, 4.0))
    origin, direction = generate_rays(c2w, 8, 16, 10.0)
    assert origin.shape == (8, 16, 3)
    o, d, t = generate_ray_batch(
        c2w[None], jax.random.PRNGKey(0), image_height=8, image_width=16,
        focal=10.0, near=2.0, far=6.0, n_samples=4)
    assert t.shape == (1, 8, 16, 4)


def test_sample_random_ray_batch_matches_dense_rays():
    """Pixel-sampled rays must agree exactly with the dense per-image ray
    grid at the sampled (image, pixel) coordinates, and pixels with the
    source images."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from keras_nerf_tpu.data.rays import (generate_rays,
                                          sample_random_ray_batch)
    from keras_nerf_tpu.data.utils import pose_spherical

    h = w = 8
    focal = 10.0
    poses = np.stack([np.asarray(pose_spherical(t, -30.0, 4.0))
                      for t in (0.0, 90.0, 200.0)])
    images = np.random.default_rng(0).uniform(
        size=(3, h, w, 4)).astype(np.float32)

    pixels, (o, d, t) = sample_random_ray_batch(
        jnp.asarray(images), jnp.asarray(poses), jax.random.PRNGKey(3),
        batch=1, image_height=h, image_width=w, focal=focal,
        near=2.0, far=6.0, n_samples=4)
    assert pixels.shape == (1, h, w, 4)
    assert o.shape == d.shape == (1, h, w, 3)
    assert t.shape == (1, h, w, 4)
    # directions unit-norm, depths sorted within [near, far] envelope
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                       atol=1e-5)
    assert (np.diff(np.asarray(t), axis=-1) >= 0).all()

    # Cross-check a handful of rays against the dense grid: find which
    # (image, pixel) each sampled pixel came from via exact pixel match.
    dense = [generate_rays(jnp.asarray(p), h, w, focal) for p in poses]
    px = np.asarray(pixels).reshape(-1, 4)
    ov = np.asarray(o).reshape(-1, 3)
    dv = np.asarray(d).reshape(-1, 3)
    flat_imgs = images.reshape(3, -1, 4)
    for r in range(0, h * w, 7):
        hits = np.argwhere(
            (np.abs(flat_imgs - px[r]).sum(-1) < 1e-7))
        assert len(hits) >= 1
        ok = False
        for n_i, flat_p in hits:
            py_, px_ = divmod(int(flat_p), w)
            do, dd = dense[n_i]
            if (np.allclose(ov[r], np.asarray(do)[py_, px_], atol=1e-5)
                    and np.allclose(dv[r], np.asarray(dd)[py_, px_],
                                    atol=1e-5)):
                ok = True
        assert ok, f"ray {r} does not match any dense (image, pixel) ray"


def test_ray_batch_dataset_epochs_differ():
    import jax.numpy as jnp
    import numpy as np

    from keras_nerf_tpu.data.loader import RayBatchDataset
    from keras_nerf_tpu.data.utils import pose_spherical

    poses = np.stack([np.asarray(pose_spherical(t, -30.0, 4.0))
                      for t in (0.0, 120.0)])
    images = np.random.default_rng(1).uniform(
        size=(2, 8, 8, 4)).astype(np.float32)
    ds = RayBatchDataset(images, poses, focal=10.0, near=2.0, far=6.0,
                         n_samples=4, batch_size=1, seed=5)
    assert len(ds) == 2
    b1 = list(ds)
    b2 = list(ds)
    assert len(b1) == 2
    # Fresh randomness every epoch and every step.
    assert not np.allclose(np.asarray(b1[0][0]), np.asarray(b1[1][0]))
    assert not np.allclose(np.asarray(b1[0][0]), np.asarray(b2[0][0]))
