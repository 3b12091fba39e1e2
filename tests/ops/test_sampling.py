import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_nerf_tpu.ops import (
    batched_searchsorted_right,
    midpoints,
    sample_pdf,
    stratified_sample_points,
)


def test_stratified_bounds_and_jitter():
    key = jax.random.PRNGKey(0)
    near, far, n = 2.0, 6.0, 32
    pts = stratified_sample_points(key, (16, 16), n, near, far)
    assert pts.shape == (16, 16, n)
    arr = np.asarray(pts)
    assert arr.min() >= near and arr.max() <= far
    # Jitter is bounded by half an interval around the linspace grid.
    base = np.linspace(near, far, n)
    interval = (far - near) / n
    assert np.abs(arr - base).max() <= interval / 2 + 1e-6
    # Monotone non-decreasing along the sample axis (jitter < grid spacing).
    # linspace spacing is (far-near)/(n-1) > interval, so order is preserved.
    assert (np.diff(arr, axis=-1) >= -1e-6).all()


def test_stratified_determinism_and_variation():
    key = jax.random.PRNGKey(7)
    a = stratified_sample_points(key, (4, 4), 8, 2.0, 6.0)
    b = stratified_sample_points(key, (4, 4), 8, 2.0, 6.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = stratified_sample_points(jax.random.PRNGKey(8), (4, 4), 8, 2.0, 6.0)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_batched_searchsorted_matches_numpy():
    rng = np.random.default_rng(0)
    cdf = np.sort(rng.uniform(size=(5, 9)), axis=-1).astype(np.float32)
    u = rng.uniform(size=(5, 13)).astype(np.float32)
    got = np.asarray(batched_searchsorted_right(
        jnp.asarray(cdf), jnp.asarray(u)))
    want = np.stack([
        np.searchsorted(cdf[i], u[i], side="right") for i in range(5)
    ])
    np.testing.assert_array_equal(got, want)


def test_midpoints():
    t = jnp.asarray([[1.0, 2.0, 4.0]])
    np.testing.assert_allclose(np.asarray(midpoints(t)), [[1.5, 3.0]])


def test_sample_pdf_range_and_shape():
    key = jax.random.PRNGKey(0)
    mids = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 63), (128, 63))
    weights = jax.random.uniform(jax.random.PRNGKey(1), (128, 64))
    samples = sample_pdf(key, mids, weights, 128)
    assert samples.shape == (128, 128)
    arr = np.asarray(samples)
    assert arr.min() >= 2.0 - 1e-5 and arr.max() <= 6.0 + 1e-5


def test_sample_pdf_concentrates_on_heavy_bins():
    """A delta-like weight distribution concentrates nearly all samples there."""
    key = jax.random.PRNGKey(3)
    n_bins = 64
    mids = jnp.broadcast_to(jnp.linspace(2.0, 6.0, n_bins - 1), (256, n_bins - 1))
    weights = np.full((256, n_bins), 1e-4, dtype=np.float32)
    weights[:, 30] = 100.0  # heavy bin around mids ~ 2 + 4*30/62 ≈ 3.94
    samples = np.asarray(
        sample_pdf(key, mids, jnp.asarray(weights), 64))
    heavy_center = 2.0 + 4.0 * 30 / 62
    frac_near = np.mean(np.abs(samples - heavy_center) < 0.15)
    assert frac_near > 0.9


def test_sample_pdf_uniform_weights_roughly_uniform():
    key = jax.random.PRNGKey(4)
    mids = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 63), (512, 63))
    weights = jnp.ones((512, 64))
    samples = np.asarray(sample_pdf(key, mids, weights, 64))
    # Mean should be near the middle of [2, 6].
    assert abs(samples.mean() - 4.0) < 0.1


def test_sample_pdf_deterministic_under_key():
    key = jax.random.PRNGKey(5)
    mids = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 31), (8, 31))
    w = jax.random.uniform(jax.random.PRNGKey(6), (8, 32))
    a = sample_pdf(key, mids, w, 16)
    b = sample_pdf(key, mids, w, 16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_invert_cdf_matches_gather_reference():
    """The mask-reduce implementation must be bit-equivalent to the original
    searchsorted+gather formulation (the reference's math, with clamping)."""
    from keras_nerf_tpu.ops import invert_cdf

    rng = np.random.default_rng(0)
    for trial in range(3):
        n_bins = [8, 64, 33][trial]
        mids = np.sort(rng.uniform(2, 6, size=(64, n_bins)), -1).astype(
            np.float32)
        weights = rng.uniform(size=(64, n_bins + 1)).astype(np.float32)
        u = rng.uniform(size=(64, 32)).astype(np.float32)

        w = weights + 1e-5
        pdf = w / w.sum(-1, keepdims=True)
        cdf = np.cumsum(pdf, -1)
        cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
        idx = np.stack([np.searchsorted(cdf[i], u[i], side="right")
                        for i in range(64)])
        below = np.maximum(0, idx - 1)
        above = np.minimum(cdf.shape[-1] - 1, idx)
        take = np.take_along_axis
        cb, ca = take(cdf, below, -1), take(cdf, above, -1)
        ml = mids.shape[-1] - 1
        mb = take(mids, np.minimum(below, ml), -1)
        ma = take(mids, np.minimum(above, ml), -1)
        den = np.where(ca - cb < 1e-5, 1.0, ca - cb)
        t = (u - cb) / den
        want = mb + t * (ma - mb)

        got = np.asarray(invert_cdf(
            jnp.asarray(u), jnp.asarray(mids), jnp.asarray(weights)))
        # atol covers XLA-vs-numpy cumsum association differences.
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_merge_sorted_equals_sort_of_concat():
    from keras_nerf_tpu.ops import merge_sorted

    rng = np.random.default_rng(0)
    a = np.sort(rng.uniform(2, 6, size=(32, 16)), -1).astype(np.float32)
    b = np.sort(rng.uniform(2, 6, size=(32, 24)), -1).astype(np.float32)
    got = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    want = np.sort(np.concatenate([a, b], -1), -1)
    np.testing.assert_allclose(got, want)


def test_merge_sorted_with_ties():
    from keras_nerf_tpu.ops import merge_sorted

    a = jnp.asarray([[1.0, 2.0, 2.0, 3.0]])
    b = jnp.asarray([[2.0, 2.0, 4.0]])
    got = np.asarray(merge_sorted(a, b))
    np.testing.assert_allclose(got, [[1.0, 2.0, 2.0, 2.0, 2.0, 3.0, 4.0]])


def test_sample_pdf_sorted_is_sorted_and_same_distribution():
    from keras_nerf_tpu.ops import sample_pdf_sorted

    key = jax.random.PRNGKey(0)
    mids = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 63), (512, 63))
    weights = np.full((512, 64), 1e-4, dtype=np.float32)
    weights[:, 30] = 100.0
    samples = np.asarray(
        sample_pdf_sorted(key, mids, jnp.asarray(weights), 64))
    assert (np.diff(samples, axis=-1) >= 0).all()
    # Same concentration behavior as the unsorted variant.
    heavy_center = 2.0 + 4.0 * 30 / 62
    assert np.mean(np.abs(samples - heavy_center) < 0.15) > 0.9
    # Uniform weights -> mean near the middle (order statistics are still
    # marginally uniform).
    uni = np.asarray(sample_pdf_sorted(
        jax.random.PRNGKey(1), mids, jnp.ones((512, 64)), 64))
    assert abs(uni.mean() - 4.0) < 0.1


def test_sample_pdf_jits():
    f = jax.jit(lambda k, m, w: sample_pdf(k, m, w, 8))
    out = f(jax.random.PRNGKey(0),
            jnp.broadcast_to(jnp.linspace(2.0, 6.0, 7), (4, 7)),
            jnp.ones((4, 8)))
    assert out.shape == (4, 8)
