"""Occupancy-accelerated training tier (opt-in `--occupancy_train`).

The fine pass trains on grid-placed depths (NerfAcc-style empty-space
skipping, PAPERS.md) while the coarse pass and all eval metrics keep the
exact reference math — see `engine.train_step`'s `occupancy` contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from keras_nerf_tpu.models import engine
from keras_nerf_tpu.models.engine import NeRFConfig
from keras_nerf_tpu.ops import occupancy as occ_mod


def _cfg():
    return NeRFConfig(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                      n_layers=2, dense_units=16, skip_layer=1)


def _batch(b, h, w, n_coarse, seed=0):
    key = jax.random.PRNGKey(seed)
    images = jax.random.uniform(key, (b, h, w, 4))
    origin = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (b, h, w, 1))
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, h, w, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(seed + 2), (b, h, w, n_coarse),
        minval=2.0, maxval=6.0), axis=-1)
    return images, (origin, d, t)


def _occ_spec(n_samples=8, merge=True):
    return (n_samples, 8, 2.0, 6.0, occ_mod.DEFAULT_AABB, merge)


def test_occupancy_train_step_updates_both_models():
    cfg = _cfg()
    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    batch = _batch(2, 8, 8, cfg.n_coarse)
    grid = jnp.ones((8, 8, 8), jnp.float32)

    for merge in (True, False):
        new_state, metrics = engine.train_step(
            state, batch, jax.random.PRNGKey(1), grid, optimizer=opt,
            config=cfg, ray_chunks=64, occupancy=_occ_spec(merge=merge))
        assert np.isfinite(float(metrics["fine_loss"]))
        assert float(metrics["coarse_grad_norm"]) > 0
        assert float(metrics["fine_grad_norm"]) > 0
        # Both param trees moved.
        dc = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.coarse_params, new_state.coarse_params))
        df = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.fine_params, new_state.fine_params))
        assert max(dc) > 0 and max(df) > 0


def test_occupancy_train_coarse_grads_match_exact_step():
    """The coarse pass is untouched by the tier: its gradients equal the
    exact step's coarse gradients for the same key/batch."""
    cfg = _cfg()
    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    batch = _batch(2, 8, 8, cfg.n_coarse)
    key = jax.random.PRNGKey(3)
    grid = jnp.ones((8, 8, 8), jnp.float32)

    s_exact, _ = engine.train_step(state, batch, key, optimizer=opt,
                                   config=cfg, ray_chunks=64)
    s_occ, _ = engine.train_step(state, batch, key, grid, optimizer=opt,
                                 config=cfg, ray_chunks=64,
                                 occupancy=_occ_spec())
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=2e-6),
        s_exact.coarse_params, s_occ.coarse_params)


def test_occupancy_train_loss_decreases():
    """~40 occupancy-train steps on a constant-color target reduce the
    fine loss (the tier actually trains)."""
    cfg = _cfg()
    opt = engine.make_optimizer("adam", 5e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    images, rays = _batch(2, 8, 8, cfg.n_coarse)
    images = jnp.full_like(images, 0.7)
    grid = jnp.ones((8, 8, 8), jnp.float32)

    step = jax.jit(lambda s, k: engine.train_step(
        s, (images, rays), k, grid, optimizer=opt, config=cfg,
        ray_chunks=64, occupancy=_occ_spec()))
    key = jax.random.PRNGKey(1)
    _, m0 = step(state, key)
    for i in range(40):
        state, m = step(state, jax.random.fold_in(key, i))
    assert float(m["fine_loss"]) < 0.5 * float(m0["fine_loss"])


def test_nerf_fit_occupancy_train_bakes_and_trains():
    """NeRF.fit with occupancy_train: exact steps through warmup, grid
    baked at the warmup epoch, loss keeps decreasing after the switch."""
    from keras_nerf_tpu.models import NeRF

    cfg_batches = [_batch(2, 8, 8, 8, seed=s) for s in range(3)]
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=2, image_height=8, image_width=8,
                  ray_chunks=128, occupancy_train=8,
                  occupancy_train_samples=8, occupancy_train_warmup=1,
                  near=2.0, far=6.0)
    assert model._train_step_occ is not None
    hist = model.fit(cfg_batches, epochs=3, verbose=False)
    assert model._occ_train_grid is not None
    assert model._occ_train_grid.shape == (8, 8, 8)
    losses = [h["fine_loss"] for h in hist]
    assert losses[-1] < losses[0]


def test_occupancy_train_probe_flag_plumbs_through():
    """compile(occupancy_train_probe=N) must reach the occ spec: the fine
    pass's CDF then uses N probe bins (observable via a grid that the
    default 64-bin probe would sample differently)."""
    from keras_nerf_tpu.models import NeRF

    batches = [_batch(2, 8, 8, 8, seed=0)]
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=2, image_height=8, image_width=8,
                  ray_chunks=128, occupancy_train=8,
                  occupancy_train_samples=8, occupancy_train_warmup=0,
                  occupancy_train_probe=24, near=2.0, far=6.0)
    spec = model._train_step_occ.__wrapped__.keywords["occupancy"]
    assert spec[0] == 8 and spec[1] == 24  # (n_samples, n_probe, ...)
    hist = model.fit(batches, epochs=1, verbose=False)
    assert np.isfinite(hist[-1]["fine_loss"])


def test_occupancy_train_dilate_flag_plumbs_through():
    """compile(occupancy_train_dilate=k) must reach the per-epoch bake
    (grid shell widened k voxels — the thin-geometry knob, QUALITY.md
    hard-scene A/B) and the persisted train_config (resume drift
    warning)."""
    from keras_nerf_tpu.models import NeRF

    batches = [_batch(2, 8, 8, 8, seed=0)]

    def build(dilate):
        model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                     n_layers=2, dense_units=16, skip_layer=1)
        model.compile(batch_size=2, image_height=8, image_width=8,
                      ray_chunks=128, occupancy_train=16,
                      occupancy_train_samples=8, occupancy_train_warmup=0,
                      occupancy_train_dilate=dilate, near=2.0, far=6.0)
        return model

    m1, m3 = build(1), build(3)
    assert m1._occ_train_cfg["dilate"] == 1
    assert m3._occ_train_cfg["dilate"] == 3
    assert m3._train_config["occupancy_train_dilate"] == 3
    m1.fit(batches, epochs=1, verbose=False)
    m3.fit(batches, epochs=1, verbose=False)
    g1, g3 = m1._occ_train_grid, m3._occ_train_grid
    assert g1 is not None and g3 is not None
    # Same weights init/seed -> same raw bake; more dilation can only
    # mark more voxels occupied (strictly more unless already saturated).
    assert float(g3.sum()) >= float(g1.sum())
    assert float((g3 - g1).min()) >= 0.0


def test_nerf_fit_occupancy_train_under_mesh():
    """NeRF.fit with occupancy_train on the fake mesh: the per-epoch bake
    replicates the grid and the occ step runs sharded (the train.py
    --occupancy_train --num_gpus composition)."""
    from keras_nerf_tpu.models import NeRF
    from keras_nerf_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(8)
    batches = [shard_batch(_batch(8, 8, 8, 8, seed=s), mesh)
               for s in range(2)]
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=8, image_height=8, image_width=8,
                  ray_chunks=64, mesh=mesh, occupancy_train=8,
                  occupancy_train_samples=8, occupancy_train_warmup=1,
                  near=2.0, far=6.0)
    hist = model.fit(batches, epochs=2, verbose=False)
    assert model._occ_train_grid is not None
    assert np.isfinite(hist[-1]["fine_loss"])


def test_occupancy_train_update_cadence():
    """--occupancy_train_update N: the grid is re-baked only every N
    epochs after the warmup bake (NerfAcc periodic update), and the knob
    is persisted in train_config for the resume drift warning."""
    from keras_nerf_tpu.models import NeRF

    batches = [_batch(2, 8, 8, 8, seed=s) for s in range(2)]
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=2, image_height=8, image_width=8,
                  ray_chunks=128, occupancy_train=8,
                  occupancy_train_samples=8, occupancy_train_warmup=1,
                  occupancy_train_update=2, near=2.0, far=6.0)
    assert model._occ_train_cfg["update"] == 2
    assert model._train_config["occupancy_train_update"] == 2

    grid_ids = {}

    class Probe:
        def on_epoch_end(self, epoch, logs):
            g = model._occ_train_grid
            grid_ids[epoch] = None if g is None else id(g)

    model.fit(batches, epochs=5, callbacks=[Probe()], verbose=False)
    # epoch 0: warmup (no grid); 1: first bake; 2: stale (same object);
    # 3: re-bake ((3-1) % 2 == 0); 4: stale again.
    assert grid_ids[0] is None
    assert grid_ids[1] is not None
    assert grid_ids[2] == grid_ids[1]
    assert grid_ids[3] is not None and grid_ids[3] != grid_ids[1]
    assert grid_ids[4] == grid_ids[3]


def test_occupancy_train_cached_rows_step_is_bit_identical():
    """engine.train_step with cached occ_rows must reproduce the grid-probe
    step exactly: same probe bins, same RNG stream, uint8 exact for a
    binary grid (`--occupancy_train_cache` contract)."""
    cfg = _cfg()
    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    batch = _batch(2, 8, 8, cfg.n_coarse)
    key = jax.random.PRNGKey(5)
    grid = jax.random.bernoulli(
        jax.random.PRNGKey(9), 0.4, (8, 8, 8)).astype(jnp.float32)
    spec = _occ_spec()

    _, rays = batch
    o, d = rays[0].reshape(-1, 3), rays[1].reshape(-1, 3)
    _, rows = occ_mod.occupancy_along_rays(o, d, grid, 2.0, 6.0, spec[1])
    rows = rows.astype(jnp.uint8)

    s_grid, m_grid = engine.train_step(state, batch, key, grid,
                                       optimizer=opt, config=cfg,
                                       ray_chunks=64, occupancy=spec)
    s_rows, m_rows = engine.train_step(state, batch, key, optimizer=opt,
                                       config=cfg, ray_chunks=64,
                                       occupancy=spec, occ_rows=rows)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_grid.fine_params, s_rows.fine_params)
    np.testing.assert_array_equal(np.asarray(m_grid["fine_loss"]),
                                  np.asarray(m_rows["fine_loss"]))


def _tiny_dataset(n=4, hw=8, seed=0):
    from keras_nerf_tpu.data.loader import NeRFDataset
    from keras_nerf_tpu.data.utils import pose_spherical

    rng = np.random.default_rng(seed)
    images = rng.uniform(size=(n, hw, hw, 4)).astype(np.float32)
    poses = np.stack([pose_spherical(360.0 * i / n, -30.0, 4.0)
                      for i in range(n)])
    return NeRFDataset(images, poses, focal=10.0, near=2.0, far=6.0,
                       n_samples=8, batch_size=2, shuffle=True, seed=seed)


def test_occupancy_train_cache_fit_matches_uncached_fit():
    """NeRF.fit with --occupancy_train_cache: the probe-row cache is built
    at each bake and the whole training history matches the uncached
    tier's run (the cached step is the same math)."""
    from keras_nerf_tpu.models import NeRF

    def run(cache):
        model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                     n_layers=2, dense_units=16, skip_layer=1)
        model.compile(batch_size=2, image_height=8, image_width=8,
                      ray_chunks=128, occupancy_train=8,
                      occupancy_train_samples=8, occupancy_train_warmup=1,
                      occupancy_train_probe=8,
                      occupancy_train_cache=cache, near=2.0, far=6.0)
        hist = model.fit(_tiny_dataset(), epochs=3, verbose=False)
        return model, hist

    m_cache, h_cache = run(True)
    m_plain, h_plain = run(False)
    assert m_cache._occ_probe_cache is not None
    assert m_cache._occ_probe_cache.shape == (4, 64, 8)
    assert m_cache._occ_probe_cache.dtype == jnp.uint8
    assert m_plain._occ_probe_cache is None
    for hc, hp in zip(h_cache, h_plain):
        np.testing.assert_allclose(hc["fine_loss"], hp["fine_loss"],
                                   rtol=1e-5)


def test_occupancy_train_cache_rejects_mesh_and_pixel_sampling():
    """The cache indexes whole images on one device; unsupported
    compositions must fail loudly at compile (VERDICT r3 #6 policy)."""
    import pytest
    from keras_nerf_tpu.models import NeRF
    from keras_nerf_tpu.parallel import make_mesh

    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    with pytest.raises(ValueError, match="single-device"):
        model.compile(batch_size=8, image_height=8, image_width=8,
                      ray_chunks=64, mesh=make_mesh(8), occupancy_train=8,
                      occupancy_train_cache=True, near=2.0, far=6.0)
    with pytest.raises(ValueError, match="pixel_sampling"):
        model.compile(batch_size=2, image_height=8, image_width=8,
                      ray_chunks=128, occupancy_train=8,
                      occupancy_train_cache=True, pixel_sampling=True,
                      near=2.0, far=6.0)


def test_occupancy_train_until_hybrid_schedule():
    """--occupancy_train_until E: grid-placed fine samples until epoch E,
    exact reference math for the decay tail (VERDICT r3 #3). The grid must
    exist during [warmup, until) and be cleared from epoch E on."""
    from keras_nerf_tpu.models import NeRF

    batches = [_batch(2, 8, 8, 8, seed=s) for s in range(2)]
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=2, image_height=8, image_width=8,
                  ray_chunks=128, occupancy_train=8,
                  occupancy_train_samples=8, occupancy_train_warmup=1,
                  occupancy_train_until=2, near=2.0, far=6.0)

    grid_by_epoch = {}

    class Probe:
        def on_epoch_end(self, epoch, logs):
            grid_by_epoch[epoch] = model._occ_train_grid is not None

    hist = model.fit(batches, epochs=4, callbacks=[Probe()], verbose=False)
    # epoch 0: warmup (exact); 1: grid baked (occ steps); 2+: until hit,
    # back to exact math.
    assert grid_by_epoch == {0: False, 1: True, 2: False, 3: False}
    assert np.isfinite(hist[-1]["fine_loss"])


def test_sharded_occupancy_train_step():
    """The tier under a mesh: grid replicated, one DP step executes and
    the state stays replicated/finite."""
    from keras_nerf_tpu.parallel import (make_mesh, replicate, shard_batch,
                                         sharded_train_step)

    cfg = _cfg()
    opt = engine.make_optimizer("adam", 1e-3)
    mesh = make_mesh(8)
    state = replicate(engine.init_train_state(jax.random.PRNGKey(0), cfg,
                                              opt), mesh)
    batch = shard_batch(_batch(8, 8, 8, cfg.n_coarse), mesh)
    grid = replicate(jnp.ones((8, 8, 8), jnp.float32), mesh)
    step = jax.jit(sharded_train_step(mesh, opt, cfg, ray_chunks=64,
                                      occupancy=_occ_spec()))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1), grid)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["fine_loss"]))
