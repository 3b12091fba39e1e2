"""Numerical parity against the TF2 reference implementation.

These tests IMPORT the reference package from /root/reference (read-only) and
compare outputs on identical inputs. They are the strongest guarantee that the
TPU rebuild reproduces the reference's training math (SURVEY.md §7 "exact
semantic parity of the quirky bits"). Skipped automatically when TF or the
reference checkout is unavailable.
"""

import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

tf = pytest.importorskip("tensorflow")

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

try:
    from keras_nerf.data.rays import RaysGenerator as TFRaysGenerator
    from keras_nerf.data.utils import pose_spherical as tf_pose_spherical
    from keras_nerf.model.nerf.mlp import NeRFMLP as TFNeRFMLP
    from keras_nerf.model.nerf.utils import NeRFUtils as TFNeRFUtils
except Exception:  # pragma: no cover - reference not importable
    pytest.skip("reference keras_nerf not importable", allow_module_level=True)

import jax
import jax.numpy as jnp

from keras_nerf_tpu.data import generate_rays, pose_spherical
from keras_nerf_tpu.models import MLPConfig, apply_mlp, init_mlp
from keras_nerf_tpu.ops import (
    encode_position_and_directions,
    invert_cdf,
    positional_encoding,
    render_rays,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_pose_spherical_parity():
    for theta, phi, t in [(0, 0, 4), (30, -30, 4), (123.4, -57.8, 3.2),
                          (350, -30, 4)]:
        ours = pose_spherical(theta, phi, t)
        ref = tf_pose_spherical(
            tf.constant(theta, tf.float32), tf.constant(phi, tf.float32),
            tf.constant(t, tf.float32)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_positional_encoding_parity(rng):
    x = rng.normal(size=(7, 5, 3)).astype(np.float32)
    utils = TFNeRFUtils(1, 4, 4, 16, 10, 4)
    ref = utils.positional_encoding(tf.constant(x), 10).numpy()
    ours = np.asarray(positional_encoding(jnp.asarray(x), 10))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_encode_position_and_directions_parity(rng):
    chunk, n = 16, 6
    utils = TFNeRFUtils(1, 4, 4, chunk, 10, 4)
    origin = rng.normal(size=(chunk, 3)).astype(np.float32)
    direction = rng.normal(size=(chunk, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    points = np.sort(rng.uniform(2, 6, size=(chunk, n))).astype(np.float32)

    ref_xyz, ref_dir = utils.encode_position_and_directions(
        tf.constant(origin), tf.constant(direction), tf.constant(points))
    got_xyz, got_dir = encode_position_and_directions(
        jnp.asarray(origin), jnp.asarray(direction), jnp.asarray(points),
        10, 4)
    np.testing.assert_allclose(
        np.asarray(got_xyz), ref_xyz.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_dir), ref_dir.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("white_bg", [False, True])
def test_render_parity(rng, white_bg):
    chunk, n = 32, 12
    utils = TFNeRFUtils(1, 4, 8, chunk, 10, 4, white_background=white_bg)
    rgb = rng.uniform(size=(chunk, n, 3)).astype(np.float32)
    sigma = rng.uniform(0, 3, size=(chunk, n, 1)).astype(np.float32)
    points = np.sort(rng.uniform(2, 6, size=(chunk, n)), axis=-1).astype(
        np.float32)

    ref_img, ref_depth, ref_w = utils.render_image_depth_chunk(
        tf.constant(rgb), tf.constant(sigma), tf.constant(points))
    out = render_rays(jnp.asarray(rgb), jnp.asarray(sigma),
                      jnp.asarray(points), white_background=white_bg)
    np.testing.assert_allclose(
        np.asarray(out.image), ref_img.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.depth), ref_depth.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.weights), ref_w.numpy(), rtol=1e-4, atol=1e-5)


def test_rays_parity():
    """Ray origins/directions match the TF RaysGenerator (jitter is RNG-
    dependent and excluded; its bounds are covered in tests/data)."""
    c2w = tf_pose_spherical(
        tf.constant(30.0), tf.constant(-30.0), tf.constant(4.0))
    gen = TFRaysGenerator(
        focal_length=34.72, image_width=32, image_height=32,
        near=2.0, far=6.0, n_sample=8)
    ref_o, ref_d, _ = gen(c2w)
    got_o, got_d = generate_rays(jnp.asarray(c2w.numpy()), 32, 32, 34.72)
    np.testing.assert_allclose(
        np.asarray(got_o), ref_o.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_d), ref_d.numpy(), rtol=1e-5, atol=1e-6)


def test_inverse_cdf_parity_via_manual_math(rng):
    """The reference's fine_hierarchical_sampling_chunk draws its own uniforms
    (ungated TF RNG), so exact parity needs the math replicated with injected
    u — mirror of `utils.py:61-97` in NumPy, including its gather clamping,
    restricted to draws that stay in-range (where reference behavior is
    well-defined)."""
    chunk, n_bins, n_fine = 8, 16, 32
    mids = np.sort(rng.uniform(2, 6, size=(chunk, n_bins))).astype(np.float32)
    weights = rng.uniform(size=(chunk, n_bins + 1)).astype(np.float32)
    u = rng.uniform(size=(chunk, n_fine)).astype(np.float32) * 0.8  # in-range

    w = weights + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, axis=-1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], axis=-1)
    idx = np.stack([np.searchsorted(cdf[i], u[i], side="right")
                    for i in range(chunk)])
    below = np.maximum(0, idx - 1)
    above = np.minimum(cdf.shape[-1] - 1, idx)
    take = np.take_along_axis
    cdf_b, cdf_a = take(cdf, below, -1), take(cdf, above, -1)
    m_last = mids.shape[-1] - 1
    mid_b = take(mids, np.minimum(below, m_last), -1)
    mid_a = take(mids, np.minimum(above, m_last), -1)
    denom = cdf_a - cdf_b
    denom = np.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    want = mid_b + t * (mid_a - mid_b)

    got = np.asarray(invert_cdf(
        jnp.asarray(u), jnp.asarray(mids), jnp.asarray(weights)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mlp_forward_parity(rng):
    """Architecture wiring check: inject identical weights into the reference
    Keras NeRFMLP and our pytree MLP; outputs must match."""
    cfg = MLPConfig(n_layers=8, dense_units=256, skip_layer=4)
    params = init_mlp(jax.random.PRNGKey(0), cfg, 63, 27)

    ref = TFNeRFMLP(n_layers=8, dense_units=256, skip_layer=4)
    xyz = rng.normal(size=(4, 8, 63)).astype(np.float32)
    dirs = rng.normal(size=(4, 8, 27)).astype(np.float32)
    ref((tf.constant(xyz), tf.constant(dirs)))  # build

    # Copy our params into the Keras model, layer by layer.
    for i in range(8):
        ref.mlp_layers[i].set_weights([
            np.asarray(params["trunk"][i]["kernel"]),
            np.asarray(params["trunk"][i]["bias"])])
    for name in ["sigma", "features", "rgb_features", "rgb"]:
        getattr(ref, name).set_weights([
            np.asarray(params[name]["kernel"]),
            np.asarray(params[name]["bias"])])

    ref_rgb, ref_sigma = ref((tf.constant(xyz), tf.constant(dirs)))
    got_rgb, got_sigma = apply_mlp(
        params, jnp.asarray(xyz), jnp.asarray(dirs), cfg)
    np.testing.assert_allclose(
        np.asarray(got_rgb), ref_rgb.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_sigma), ref_sigma.numpy(), rtol=1e-4, atol=1e-4)


def test_psnr_parity_vs_tf_image(rng):
    """The logged PSNR curves come from tf.image.psnr in the reference
    (`nerf.py:309-310`); ours must match on identical inputs."""
    from keras_nerf_tpu.ops.metrics import psnr
    a = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    want = tf.image.psnr(tf.constant(a), tf.constant(b), max_val=1.0).numpy()
    got = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ssim_parity_vs_tf_image(rng):
    """tf.image.ssim with its defaults (11x11 Gaussian, k1=0.01, k2=0.03,
    max_val=1) — the reference's metric (`nerf.py:311-312`)."""
    from keras_nerf_tpu.ops.metrics import ssim
    a = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    # Correlated pair: SSIM of independent noise is ~0 everywhere and would
    # under-test the structural term.
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    want = tf.image.ssim(tf.constant(a), tf.constant(b), max_val=1.0).numpy()
    got = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_parity_vs_tf_image(rng):
    """The antialias-bilinear resize path must reproduce the reference's
    tf.image.resize(..., antialias=True) pixels (`image.py:22-23`) so PSNR
    comparisons on real scenes are input-identical."""
    from keras_nerf_tpu.data.image import resize_antialias_bilinear
    for in_hw, out_hw in [((800, 800), (128, 128)), ((64, 48), (32, 24)),
                          ((16, 16), (32, 32))]:
        img = rng.uniform(size=(*in_hw, 4)).astype(np.float32)
        want = tf.image.resize(
            tf.constant(img), out_hw, method="bilinear",
            antialias=True).numpy()
        got = resize_antialias_bilinear(img, *out_hw)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
