"""int8 quantized render tier tests (interpret mode on CPU).

The tier's quality contract is measured on a trained checkpoint
(`scripts/quantize_sim_ptq.py`, docs/QUALITY.md); these tests guard the
MACHINERY: scale/packing round trips, the Pallas kernel computing the
same function as the pure-XLA int8 reference implementation
(`kernels/quantize.py: forward_core_int8`), and the engine/NeRF plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_nerf_tpu.kernels import pack_mlp_params
from keras_nerf_tpu.kernels import quantize as qz
from keras_nerf_tpu.kernels.ray_march import encode_block128, fused_train_chunk
from keras_nerf_tpu.models import engine
from keras_nerf_tpu.models.engine import NeRFConfig
from keras_nerf_tpu.ops.rendering import render_rays


@pytest.fixture(scope="module")
def setup():
    cfg = NeRFConfig(n_coarse=8, n_fine=8, n_layers=3, dense_units=256,
                     skip_layer=2, white_background=True, use_pallas=True)
    pc, pf = engine.init_params(jax.random.PRNGKey(2), cfg)
    r = 32
    o = jnp.zeros((r, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(jax.random.PRNGKey(1), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (r, cfg.n_coarse),
                                    minval=2.0, maxval=6.0), axis=-1)
    return cfg, pc, pf, o, d, t


def _quantize_one(params, cfg, o, d, t):
    packed = pack_mlp_params(params, cfg.mlp, cfg.pos_emb_xyz,
                             cfg.pos_emb_dir)
    pos = o[:, None, :] + d[:, None, :] * t[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pos.shape)
    enc = encode_block128(pos.reshape(-1, 3), dirs.reshape(-1, 3),
                          cfg.pos_emb_xyz, cfg.pos_emb_dir)
    last_skip = (cfg.mlp.n_layers - 1) in set(cfg.mlp.skip_indices())
    amax = qz.collect_act_amax(packed, enc, cfg.mlp, last_skip)
    return qz.quantize_packed(packed, amax, cfg.mlp, last_skip), enc, \
        last_skip


@pytest.fixture(scope="module")
def quantized_fine(setup):
    """Calibrate+quantize the shared fine params ONCE per module (four
    tests consume the identical result; re-deriving it cost ~8 s each on
    the 1-core CI box — the round-5 suite-wall-time trim)."""
    cfg, pc, pf, o, d, t = setup
    return _quantize_one(pf, cfg, o, d, t)


def test_flatten_roundtrip(setup, quantized_fine):
    cfg, pc, pf, o, d, t = setup
    q, _, last_skip = quantized_fine
    flat = qz.flatten_quantized(q)
    q2, rest = qz.unflatten_quantized(cfg.mlp, last_skip, flat)
    assert not rest
    for k in q:
        a = q[k] if isinstance(q[k], list) else [q[k]]
        b = q2[k] if isinstance(q2[k], list) else [q2[k]]
        for x, y in zip(a, b):
            assert (x is None) == (y is None)
            if x is not None:
                assert x is y


def test_int8_reference_close_to_f32(setup, quantized_fine):
    """The XLA int8 reference forward must track the f32 MLP (PTQ noise
    budget on random params) and its sigma_only path must be exact."""
    cfg, pc, pf, o, d, t = setup
    from keras_nerf_tpu.kernels.ray_march import _forward_core

    q, enc, last_skip = quantized_fine
    packed = pack_mlp_params(pf, cfg.mlp, cfg.pos_emb_xyz, cfg.pos_emb_dir)
    rgb32, sig32, _ = _forward_core(cfg.mlp, last_skip, enc, packed)
    rgb8, sig8, _ = qz.forward_core_int8(cfg.mlp, last_skip,
                                         enc.astype(jnp.float32), q)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(rgb8[:, :3])),
        np.asarray(jax.nn.sigmoid(rgb32[:, :3])), atol=0.05)
    _, sig8b, _ = qz.forward_core_int8(cfg.mlp, last_skip,
                                       enc.astype(jnp.float32), q,
                                       sigma_only=True)
    np.testing.assert_array_equal(np.asarray(sig8), np.asarray(sig8b))


def test_kernel_matches_int8_reference(setup, quantized_fine):
    """The Pallas quantized kernel (interpret) must compute the same
    function as forward_core_int8 + render_rays — the only divergence is
    the kernel's in-kernel encoding (polynomial sin off base/slope
    coefficients), the same budget the bf16 kernel tests carry."""
    cfg, pc, pf, o, d, t = setup
    q, enc, _ = quantized_fine

    img, depth, weights = fused_train_chunk(
        q, o, d, t, None, cfg.mlp, white_background=True,
        with_grad=False, quantized=True, interpret=True)

    last_skip = (cfg.mlp.n_layers - 1) in set(cfg.mlp.skip_indices())
    rgb_pre, sig_pre, _ = qz.forward_core_int8(
        cfg.mlp, last_skip, enc.astype(jnp.float32), q)
    ref = render_rays(
        jax.nn.sigmoid(rgb_pre[:, :3]).reshape(*t.shape, 3),
        jax.nn.relu(sig_pre[:, 0]).reshape(*t.shape),
        t, white_background=True)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image),
                               atol=0.03)
    np.testing.assert_allclose(np.asarray(weights), np.asarray(ref.weights),
                               atol=0.02)


def test_engine_quantized_render(setup):
    """packed_q plumbing: quantized render close to (but not identical
    to) the f32 fused render, across the fused-sampling fine pass and
    the sigma-only coarse pass."""
    cfg, pc, pf, o, d, t = setup
    b, h, w = 1, 4, 8
    rays = (o.reshape(b, h, w, 3), d.reshape(b, h, w, 3),
            t.reshape(b, h, w, cfg.n_coarse))
    key = jax.random.PRNGKey(5)
    pq = engine.quantize_render_params(pc, pf, rays, key, cfg)
    _, f32 = engine.render_image_batch(pc, pf, rays, key, cfg,
                                       ray_chunks=32)
    _, q8 = engine.render_image_batch(pc, pf, rays, key, cfg,
                                      ray_chunks=32, packed_q=pq)
    a, b_ = np.asarray(f32["image"]), np.asarray(q8["image"])
    assert np.abs(a - b_).max() < 0.1
    assert not np.array_equal(a, b_)
    # sigma-only coarse + no-weights combo must leave the fine render
    # unchanged (same guarantee as the bf16 path).
    _, q8b = engine.render_image_batch(pc, pf, rays, key, cfg,
                                       ray_chunks=32, packed_q=pq,
                                       coarse_image=False,
                                       with_weights=False)
    np.testing.assert_array_equal(np.asarray(q8b["image"]), b_)


def test_quantized_composes_with_fast_render(setup):
    """--quantized_render + --fast_render: the int8 MLP runs under the
    importance-only fine pass too (orthogonal tiers)."""
    import dataclasses
    cfg, pc, pf, o, d, t = setup
    cfg_fast = dataclasses.replace(cfg, fast_render=4)
    b, h, w = 1, 4, 8
    rays = (o.reshape(b, h, w, 3), d.reshape(b, h, w, 3),
            t.reshape(b, h, w, cfg.n_coarse))
    key = jax.random.PRNGKey(5)
    pq = engine.quantize_render_params(pc, pf, rays, key, cfg_fast)
    _, f32 = engine.render_image_batch(pc, pf, rays, key, cfg_fast,
                                       ray_chunks=32)
    _, q8 = engine.render_image_batch(pc, pf, rays, key, cfg_fast,
                                      ray_chunks=32, packed_q=pq)
    a, b_ = np.asarray(f32["image"]), np.asarray(q8["image"])
    # With only 4 importance samples, a quantized-coarse density shift
    # can move a sample across a (random-params) density spike — large
    # single-pixel diffs are sampling sensitivity, not broken math;
    # the mean must stay tight.
    assert np.abs(a - b_).mean() < 0.02
    assert np.abs(a - b_).max() < 0.5
    assert not np.array_equal(a, b_)


def test_quantized_composes_with_occupancy(setup, quantized_fine):
    """--quantized_render + --occupancy_grid: the int8 fine MLP runs over
    the occupancy-placed samples. Identical points and quadrature math
    (same key, same grid), so the f32/int8 gap is pure PTQ noise."""
    cfg, pc, pf, o, d, t = setup
    from keras_nerf_tpu.ops import occupancy as occ

    q, _, _ = quantized_fine
    g = np.zeros((8, 8, 8), np.float32)
    g[2:6, 2:6, 2:6] = 1.0
    grid = jnp.asarray(g)
    rays = (o.reshape(1, 4, 8, 3), d.reshape(1, 4, 8, 3),
            t.reshape(1, 4, 8, cfg.n_coarse))
    key = jax.random.PRNGKey(5)
    f32 = occ.render_image_batch_occ(pf, rays, grid, key, cfg,
                                     n_samples=8, ray_chunks=32)
    i8 = occ.render_image_batch_occ(pf, rays, grid, key, cfg,
                                    n_samples=8, ray_chunks=32, packed_q=q)
    np.testing.assert_allclose(np.asarray(i8["image"]),
                               np.asarray(f32["image"]), atol=0.06)
    np.testing.assert_allclose(np.asarray(i8["depth"]),
                               np.asarray(f32["depth"]), atol=0.25)
    assert not np.array_equal(np.asarray(i8["image"]),
                              np.asarray(f32["image"]))


def test_nerf_quantized_occupancy_under_mesh():
    """NeRF with quantized_render + bake_occupancy on a mesh: the banded
    int8 occupancy render (the CLI's --quantized_render --occupancy_grid
    --num_gpus composition) runs and caches per-tier."""
    from keras_nerf_tpu.models import NeRF
    from keras_nerf_tpu.parallel import make_mesh

    m = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=10, pos_emb_dir=4,
             n_layers=2, dense_units=256, skip_layer=1)
    m.compile(batch_size=1, image_height=16, image_width=8, ray_chunks=16,
              is_training=False, use_pallas=True, quantized_render=True,
              mesh=make_mesh(8), seed=3)
    m.bake_occupancy(8, sigma_threshold=0.0)
    key = jax.random.PRNGKey(0)
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (1, 16, 8, 1))
    d = jax.random.normal(key, (1, 16, 8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(1), (1, 16, 8, 8), minval=2.0, maxval=6.0), -1)
    out = m.render_occupancy((o, d, t), key=key, n_samples=8, n_probe=8)
    assert out["image"].shape == (1, 16, 8, 3)
    assert np.isfinite(np.asarray(out["image"])).all()
    assert (2.0, 6.0, 8, 8, True) in m._mesh_occ_cache


def test_nerf_quantized_render_flag():
    """NeRF.compile(quantized_render=True): lazy one-time calibration,
    render stays close to the unquantized model."""
    from keras_nerf_tpu.models import NeRF

    def build(quantized):
        m = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=10, pos_emb_dir=4,
                 n_layers=2, dense_units=256, skip_layer=1)
        m.compile(batch_size=1, image_height=8, image_width=8,
                  ray_chunks=64, is_training=False, use_pallas=True,
                  quantized_render=quantized)
        return m

    key = jax.random.PRNGKey(0)
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (1, 8, 8, 1))
    d = jax.random.normal(key, (1, 8, 8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(1), (1, 8, 8, 8), minval=2.0, maxval=6.0), -1)
    rays = (o, d, t)

    m = build(True)
    assert m.quantized_render and m._packed_q is None
    _, fine_q = m.predict_and_render_images(rays, key)
    assert m._packed_q is not None          # calibrated once
    _, fine_q2 = m.predict_and_render_images(rays, key)
    np.testing.assert_array_equal(np.asarray(fine_q["image"]),
                                  np.asarray(fine_q2["image"]))

    # Weight change invalidates the baked int8 cache: a new state object
    # must trigger recalibration (guards the stale-weights hazard).
    old_pq = m._packed_q
    m.state = engine.init_train_state(
        jax.random.PRNGKey(99), m.config,
        engine.make_optimizer("sgd", 1e-2))
    _, fine_new = m.predict_and_render_images(rays, key)
    assert m._packed_q is not old_pq
    assert not np.array_equal(np.asarray(fine_new["image"]),
                              np.asarray(fine_q["image"]))

    m0 = build(False)
    m0.state = m.state                      # same (post-swap) weights
    _, fine_f = m0.predict_and_render_images(rays, key)
    # RANDOM (untrained) params maximize PTQ noise; the tier's real
    # quality contract is measured on a trained checkpoint
    # (scripts/quantize_sim_ptq.py, docs/QUALITY.md).
    assert np.abs(np.asarray(fine_f["image"])
                  - np.asarray(fine_new["image"])).max() < 0.25


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 (fake) devices")
def test_nerf_quantized_render_under_mesh():
    """quantized_render over a mesh: calibrate once, replicate the baked
    int8 weights, render height bands — matches the single-device
    quantized render (same per-band RNG as the f32 mesh path)."""
    from keras_nerf_tpu.models import NeRF
    from keras_nerf_tpu.parallel import make_mesh

    def build(mesh):
        m = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=10, pos_emb_dir=4,
                 n_layers=2, dense_units=256, skip_layer=1)
        m.compile(batch_size=1, image_height=16, image_width=8,
                  ray_chunks=16, is_training=False, use_pallas=True,
                  quantized_render=True, mesh=mesh, seed=3)
        return m

    key = jax.random.PRNGKey(0)
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (1, 16, 8, 1))
    d = jax.random.normal(key, (1, 16, 8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(1), (1, 16, 8, 8), minval=2.0, maxval=6.0), -1)
    rays = (o, d, t)

    m8 = build(make_mesh(8))
    assert m8.quantized_render          # mesh no longer disables the tier
    _, fine8 = m8.predict_and_render_images(rays, key, with_weights=False,
                                            coarse_image=False)
    assert "weights" not in fine8
    assert (True, True, False) in m8._mesh_render_cache  # seed entry
    assert (False, False, True) in m8._mesh_render_cache

    # Single-device reference for the same bands: calibrate on the SAME
    # full-image rays (band rays would change the int8 scales), then fold
    # the key per band exactly as the sharded render does and compare
    # band-for-band.
    m1 = build(None)
    m1._ensure_packed_q(rays, key)
    band_imgs = []
    for band in range(8):
        br = jax.tree.map(lambda x: x[:, 2 * band:2 * (band + 1)], rays)
        _, f = m1.predict_and_render_images(
            br, jax.random.fold_in(key, band), with_weights=False,
            coarse_image=False)
        band_imgs.append(np.asarray(f["image"]))
    ref = np.concatenate(band_imgs, axis=1)
    np.testing.assert_allclose(np.asarray(fine8["image"]), ref,
                               atol=1e-5)
