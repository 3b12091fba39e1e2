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


def test_chunked_equals_unchunked_grads(cfg, state, toy_batch):
    """ray_chunks is a memory knob, not a math knob: one step with chunks=
    num_rays must produce the same new params as chunks=num_rays/4 (equal
    chunks -> identical averaged gradients). The fine sampling RNG differs
    per chunk, so compare with n_fine=0-like tolerance via loss values on a
    fixed key: we instead check coarse gradients by running two chunkings
    with the same per-chunk keys is impossible — so assert closeness of the
    coarse loss (RNG-independent) and parameter drift smallness."""
    opt = engine.make_optimizer("sgd", 0.0)  # lr 0: params unchanged
    s0 = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    _, m_full = engine.train_step(
        s0, toy_batch, jax.random.PRNGKey(3), optimizer=opt, config=cfg,
        ray_chunks=2 * 8 * 8)
    _, m_chunk = engine.train_step(
        s0, toy_batch, jax.random.PRNGKey(3), optimizer=opt, config=cfg,
        ray_chunks=32)
    # Coarse loss has no sampling RNG: must match to fp tolerance.
    np.testing.assert_allclose(float(m_full["coarse_loss"]),
                               float(m_chunk["coarse_loss"]), rtol=1e-5)


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

    g_total = jax.grad(total_loss, argnums=0)(coarse, fine)
    g_coarse = jax.grad(coarse_only_loss)(coarse)
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
