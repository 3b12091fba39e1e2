import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_nerf_tpu.models import engine
from keras_nerf_tpu.models.engine import NeRFConfig


@pytest.fixture(scope="module")
def cfg():
    return NeRFConfig(n_coarse=8, n_fine=16, pos_emb_xyz=4, pos_emb_dir=2,
                      n_layers=3, dense_units=32, skip_layer=2)


@pytest.fixture(scope="module")
def toy_batch(cfg):
    """A tiny consistent batch: rays through a scene with one sphere."""
    key = jax.random.PRNGKey(0)
    b, h, w = 2, 8, 8
    images = jax.random.uniform(key, (b, h, w, 4))
    origin = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (b, h, w, 1))
    d = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(2), (b, h, w, cfg.n_coarse),
        minval=2.0, maxval=6.0), axis=-1)
    return images, (origin, d, t)


@pytest.fixture(scope="module")
def state(cfg):
    opt = engine.make_optimizer("adam", 1e-3)
    return engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)


def test_render_chunk_pair_shapes(cfg, state):
    n = 32
    o = jnp.zeros((n, 3)).at[:, 2].set(4.0)
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    t = jnp.broadcast_to(jnp.linspace(2.0, 6.0, cfg.n_coarse), (n, cfg.n_coarse))
    out_c, out_f = engine.render_chunk_pair(
        state.coarse_params, state.fine_params, o, d, t,
        jax.random.PRNGKey(0), cfg)
    assert out_c.image.shape == (n, 3)
    assert out_c.weights.shape == (n, cfg.n_coarse)
    assert out_f.image.shape == (n, 3)
    assert out_f.weights.shape == (n, cfg.n_coarse + cfg.n_fine)


def test_render_image_batch_shapes(cfg, state, toy_batch):
    _, rays = toy_batch
    out_c, out_f = engine.render_image_batch(
        state.coarse_params, state.fine_params, rays,
        jax.random.PRNGKey(0), cfg, ray_chunks=32)
    assert out_c["image"].shape == (2, 8, 8, 3)
    assert out_c["depth"].shape == (2, 8, 8)
    assert out_f["weights"].shape == (2, 8, 8, cfg.n_coarse + cfg.n_fine)


def test_train_step_decreases_loss(cfg, toy_batch):
    opt = engine.make_optimizer("adam", 5e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = jax.jit(lambda s, b, k: engine.train_step(
        s, b, k, optimizer=opt, config=cfg, ray_chunks=32))
    losses = []
    for i in range(30):
        state, metrics = step(state, toy_batch, jax.random.fold_in(
            jax.random.PRNGKey(7), i))
        losses.append(float(metrics["fine_loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30


def _sgd_step_params(cfg, toy_batch, ray_chunks):
    """One SGD(lr=1) step: updated params = initial - gradient, so comparing
    params leaf-for-leaf compares the accumulated gradient trees exactly."""
    opt = engine.make_optimizer("sgd", 1.0)
    s0 = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    s1, _ = engine.train_step(
        s0, toy_batch, jax.random.PRNGKey(3), optimizer=opt, config=cfg,
        ray_chunks=ray_chunks)
    return s0, s1


def test_chunked_equals_unchunked_grads(cfg, toy_batch):
    """CLAUDE.md invariant: --ray_chunks is a memory knob, not a math knob —
    chunked and whole-batch GRADIENTS must agree. The coarse path consumes no
    per-chunk RNG, so its gradient (recovered as the SGD lr=1 param delta)
    must match leaf-for-leaf across chunkings."""
    _, s_full = _sgd_step_params(cfg, toy_batch, ray_chunks=2 * 8 * 8)
    _, s_chunk = _sgd_step_params(cfg, toy_batch, ray_chunks=32)
    for a, b in zip(jax.tree.leaves(s_full.coarse_params),
                    jax.tree.leaves(s_chunk.coarse_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_chunked_equals_unchunked_grads_fine_path(toy_batch):
    """With n_fine=0 the fine pass consumes no RNG either (zero hierarchical
    draws), so BOTH gradient trees must agree across chunkings — covering the
    fine accumulation path end-to-end."""
    cfg0 = NeRFConfig(n_coarse=8, n_fine=0, pos_emb_xyz=4, pos_emb_dir=2,
                      n_layers=3, dense_units=32, skip_layer=2)
    _, s_full = _sgd_step_params(cfg0, toy_batch, ray_chunks=2 * 8 * 8)
    _, s_chunk = _sgd_step_params(cfg0, toy_batch, ray_chunks=32)
    for tree_full, tree_chunk in (
            (s_full.coarse_params, s_chunk.coarse_params),
            (s_full.fine_params, s_chunk.fine_params)):
        for a, b in zip(jax.tree.leaves(tree_full), jax.tree.leaves(tree_chunk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)


def test_fine_loss_does_not_update_coarse_params(cfg, toy_batch):
    """Structural stop-gradient: zero out the coarse loss contribution by
    checking that coarse grads equal grads of the coarse loss alone."""
    images, rays = toy_batch
    b, h, w = images.shape[:3]
    num_rays = b * h * w
    o = rays[0].reshape(num_rays, 3)
    d = rays[1].reshape(num_rays, 3)
    t = rays[2].reshape(num_rays, cfg.n_coarse)
    tgt = images[..., :3].reshape(num_rays, 3)
    key = jax.random.PRNGKey(0)

    coarse, fine = engine.init_params(jax.random.PRNGKey(1), cfg)

    def total_loss(pc, pf):
        out_c, out_f = engine.render_chunk_pair(pc, pf, o, d, t, key, cfg)
        return (jnp.mean(jnp.square(out_c.image - tgt))
                + jnp.mean(jnp.square(out_f.image - tgt)))

    def coarse_only_loss(pc):
        out_c, _ = engine.render_chunk(pc, o, d, t, key, cfg)
        return jnp.mean(jnp.square(out_c.image - tgt))

    # jit the grads: unjitted jax.grad executes the backward op-by-op
    # on the 1-core CPU box (~20 s); one compiled graph is ~4x faster.
    g_total = jax.jit(jax.grad(total_loss, argnums=0))(coarse, fine)
    g_coarse = jax.jit(jax.grad(coarse_only_loss))(coarse)
    for a, b_ in zip(jax.tree.leaves(g_total), jax.tree.leaves(g_coarse)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_eval_step_metrics(cfg, state, toy_batch):
    metrics = engine.eval_step(
        state, toy_batch, jax.random.PRNGKey(0), config=cfg, ray_chunks=32)
    for name in ["coarse_loss", "coarse_psnr", "coarse_ssim",
                 "fine_loss", "fine_psnr", "fine_ssim"]:
        assert np.isfinite(float(metrics[name])), name


def test_train_step_reports_grad_norms(cfg, toy_batch):
    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    _, metrics = engine.train_step(
        state, toy_batch, jax.random.PRNGKey(0), optimizer=opt, config=cfg,
        ray_chunks=32)
    assert float(metrics["coarse_grad_norm"]) > 0
    assert float(metrics["fine_grad_norm"]) > 0


def test_coarse_only_n_fine_zero(toy_batch):
    """--num_fine_samples 0 (BASELINE config #1, coarse-only): the fine model
    still evaluates on the coarse depths (reference semantics: hierarchical
    sampling of zero points, sort of the unchanged coarse set)."""
    cfg0 = NeRFConfig(n_coarse=8, n_fine=0, pos_emb_xyz=4, pos_emb_dir=2,
                      n_layers=3, dense_units=32, skip_layer=2)
    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg0, opt)
    state, metrics = engine.train_step(
        state, toy_batch, jax.random.PRNGKey(0), optimizer=opt, config=cfg0,
        ray_chunks=32)
    assert np.isfinite(float(metrics["fine_loss"]))
    out_c, out_f = engine.render_image_batch(
        state.coarse_params, state.fine_params, toy_batch[1],
        jax.random.PRNGKey(0), cfg0, ray_chunks=32)
    assert out_f["weights"].shape[-1] == 8  # coarse depths only


def test_custom_loss_callable_is_used(cfg, state, toy_batch):
    """A callable loss(y_true, y_pred) must actually train the model — the
    reference consumes its compiled loss (`train.py:130-136`); a silently
    substituted MSE would report different loss values than L1."""
    def l1(y_true, y_pred):
        return jnp.mean(jnp.abs(y_pred - y_true))

    opt = engine.make_optimizer("sgd", 0.0)
    _, m_l1 = engine.train_step(
        state, toy_batch, jax.random.PRNGKey(3), optimizer=opt, config=cfg,
        ray_chunks=32, loss_fn=l1)
    _, m_mse = engine.train_step(
        state, toy_batch, jax.random.PRNGKey(3), optimizer=opt, config=cfg,
        ray_chunks=32)
    # L1 of a sub-unit error is larger than its square: the callable was used.
    assert float(m_l1["coarse_loss"]) != pytest.approx(
        float(m_mse["coarse_loss"]))
    # And eval_step threads it identically.
    e_l1 = engine.eval_step(state, toy_batch, jax.random.PRNGKey(3),
                            config=cfg, ray_chunks=32, loss_fn=l1)
    e_mse = engine.eval_step(state, toy_batch, jax.random.PRNGKey(3),
                             config=cfg, ray_chunks=32)
    assert float(e_l1["coarse_loss"]) != pytest.approx(
        float(e_mse["coarse_loss"]))


def test_nerf_compile_rejects_unknown_loss_string(cfg):
    from keras_nerf_tpu.models import NeRF
    nerf = NeRF(n_coarse=8, n_fine=0, pos_emb_xyz=2, pos_emb_dir=1,
                n_layers=2, dense_units=16, skip_layer=4)
    with pytest.raises(ValueError):
        nerf.compile(loss="huber", batch_size=1, image_height=4,
                     image_width=4, ray_chunks=16)


def test_make_optimizer_strings():
    import optax
    opt = engine.make_optimizer("adam")
    assert isinstance(opt, optax.GradientTransformation)
    with pytest.raises(ValueError):
        engine.make_optimizer("nope")


def test_config_round_trip(cfg):
    d = cfg.to_model_config()
    assert set(d) == {"n_coarse", "n_fine", "pos_emb_xyz", "pos_emb_dir",
                      "n_layers", "dense_units", "skip_layer"}
    cfg2 = NeRFConfig.from_model_config(d, white_background=True)
    assert cfg2.n_coarse == cfg.n_coarse
    assert cfg2.white_background


def test_exponential_lr_schedule():
    """NeRF-paper lr decay: init at step 0, lr_final at decay_steps, capped
    beyond; plumbed through NeRF.compile(lr_final=, lr_decay_steps=)."""
    sched = engine.exponential_lr(5e-4, 5e-6, 100)
    np.testing.assert_allclose(float(sched(0)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 5e-6, rtol=1e-4)
    np.testing.assert_allclose(float(sched(200)), 5e-6, rtol=1e-4)
    assert float(sched(50)) == pytest.approx(5e-5, rel=1e-3)  # geometric mid

    from keras_nerf_tpu.models import NeRF
    nerf = NeRF(n_coarse=8, n_fine=0, pos_emb_xyz=2, pos_emb_dir=1,
                n_layers=2, dense_units=16, skip_layer=4)
    nerf.compile(batch_size=1, image_height=4, image_width=4,
                 ray_chunks=16, learning_rate=5e-4, lr_final=5e-6,
                 lr_decay_steps=100)
    images = jnp.ones((1, 4, 4, 4)) * 0.5
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (1, 4, 4, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (1, 4, 4, 1))
    t = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (1, 4, 4, 8))
    m = nerf.train_step((images, (o, d, t)))
    assert np.isfinite(m["fine_loss"])


def test_fast_render_is_render_only(cfg, state, toy_batch):
    """config.fast_render approximates NOVEL-VIEW rendering only: train and
    eval paths must be bit-identical with it set, and the fast render itself
    must produce the fine pass from importance samples alone."""
    import dataclasses

    fast_cfg = dataclasses.replace(cfg, fast_render=8)
    key = jax.random.PRNGKey(3)

    # Train step: identical gradients/metrics with or without the flag.
    opt = engine.make_optimizer("sgd", 1e-2)
    s0 = engine.init_train_state(jax.random.PRNGKey(7), cfg, opt)
    s_exact, m_exact = engine.train_step(
        s0, toy_batch, key, optimizer=opt, config=cfg, ray_chunks=64)
    s1 = engine.init_train_state(jax.random.PRNGKey(7), cfg, opt)
    s_fast, m_fast = engine.train_step(
        s1, toy_batch, key, optimizer=opt, config=fast_cfg, ray_chunks=64)
    jax.tree.map(np.testing.assert_array_equal,
                 s_exact.fine_params, s_fast.fine_params)
    np.testing.assert_array_equal(m_exact["fine_loss"], m_fast["fine_loss"])

    # Eval step: identical metrics.
    e_exact = engine.eval_step(s_exact, toy_batch, key, config=cfg,
                               ray_chunks=64)
    e_fast = engine.eval_step(s_fast, toy_batch, key, config=fast_cfg,
                              ray_chunks=64)
    np.testing.assert_array_equal(e_exact["fine_psnr"], e_fast["fine_psnr"])

    # The fast render runs, differs from exact (fewer fine samples), and the
    # fine weights have fast_render entries per ray.
    _, rays = toy_batch
    out_c, out_f = engine.render_image_batch(
        state.coarse_params, state.fine_params, rays, key, fast_cfg,
        ray_chunks=64)
    assert out_f["weights"].shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out_f["image"])).all()
    _, out_f_exact = engine.render_image_batch(
        state.coarse_params, state.fine_params, rays, key, cfg,
        ray_chunks=64)
    assert not np.allclose(out_f["image"], out_f_exact["image"])
    # Coarse pass is untouched by the flag.
    _, _ = out_c, out_f
