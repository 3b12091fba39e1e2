"""Fused Pallas ray-march kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_nerf_tpu.kernels import fused_render_chunk, pack_mlp_params
from keras_nerf_tpu.models import engine
from keras_nerf_tpu.models.engine import NeRFConfig
from keras_nerf_tpu.ops.encoding import (
    block_permutation,
    positional_encoding,
    positional_encoding_block,
)


def test_block_permutation_definition():
    x = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    for L in [1, 4, 10]:
        ref = np.asarray(positional_encoding(jnp.asarray(x), L))
        blk = np.asarray(positional_encoding_block(jnp.asarray(x), L))
        perm = block_permutation(3, L)
        np.testing.assert_allclose(blk, ref[..., perm], rtol=1e-6)


def test_block_padding():
    x = jnp.ones((4, 3))
    out = positional_encoding_block(x, 10, pad_to=64)
    assert out.shape == (4, 64)
    np.testing.assert_allclose(np.asarray(out[:, 63]), 0.0)


@pytest.fixture(scope="module")
def cfg():
    return NeRFConfig(n_coarse=8, n_fine=0, pos_emb_xyz=10, pos_emb_dir=4,
                      n_layers=8, dense_units=256, skip_layer=4)


@pytest.fixture(scope="module")
def chunk(cfg):
    key = jax.random.PRNGKey(0)
    r = 64
    o = jnp.zeros((r, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(key, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(1), (r, cfg.n_coarse), minval=2.0, maxval=6.0),
        axis=-1)
    return o, d, t


def test_fused_matches_xla_path(cfg, chunk):
    """The fused kernel must compute the same function as the XLA bf16 path
    (rounding differences only)."""
    params, _ = engine.init_params(jax.random.PRNGKey(2), cfg)
    packed = pack_mlp_params(params, cfg.mlp, cfg.pos_emb_xyz,
                             cfg.pos_emb_dir)
    o, d, t = chunk

    fused = fused_render_chunk(packed, o, d, t, cfg, tile=512,
                               interpret=True)

    bf16_cfg = NeRFConfig(**{**cfg.to_model_config()},
                          compute_dtype="bfloat16")
    ref, _ = engine.render_chunk(params, o, d, t, jax.random.PRNGKey(0),
                                 bf16_cfg)
    np.testing.assert_allclose(np.asarray(fused.image), np.asarray(ref.image),
                               atol=0.03)
    np.testing.assert_allclose(np.asarray(fused.depth), np.asarray(ref.depth),
                               atol=0.05)
    # And close to the fp32 path too (bf16 rounding budget).
    ref32, _ = engine.render_chunk(params, o, d, t, jax.random.PRNGKey(0),
                                   cfg)
    np.testing.assert_allclose(np.asarray(fused.image),
                               np.asarray(ref32.image), atol=0.05)


def test_fused_non_tile_multiple(cfg, chunk):
    """P not a multiple of the tile: internal padding must not change
    results."""
    params, _ = engine.init_params(jax.random.PRNGKey(2), cfg)
    packed = pack_mlp_params(params, cfg.mlp, cfg.pos_emb_xyz,
                             cfg.pos_emb_dir)
    o, d, t = chunk
    big = fused_render_chunk(packed, o, d, t, cfg, tile=512, interpret=True)
    odd = fused_render_chunk(packed, o[:37], d[:37], t[:37], cfg, tile=512,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(odd.image),
                               np.asarray(big.image[:37]), atol=1e-5)


def test_nerf_use_pallas_render(cfg):
    """NeRF.compile(use_pallas=True) renders through the fused kernel and
    stays close to the default path."""
    from keras_nerf_tpu.models import NeRF

    def build(use_pallas):
        m = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=10, pos_emb_dir=4,
                 n_layers=2, dense_units=256, skip_layer=1)
        m.compile(batch_size=1, image_height=8, image_width=8,
                  ray_chunks=64, is_training=False, use_pallas=use_pallas)
        return m

    key = jax.random.PRNGKey(0)
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (1, 8, 8, 1))
    d = jax.random.normal(key, (1, 8, 8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(1), (1, 8, 8, 8), minval=2.0, maxval=6.0), -1)
    rays = (o, d, t)

    fused = build(True).predict_and_render_images(rays, key)
    plain = build(False).predict_and_render_images(rays, key)
    # The fused path computes in bf16, the plain model in fp32 — random
    # (untrained) weights amplify the rounding, so the budget is loose.
    np.testing.assert_allclose(np.asarray(fused[1]["image"]),
                               np.asarray(plain[1]["image"]), atol=0.1)


def test_fused_backward_matches_xla_grads():
    """The recompute backward kernel must reproduce XLA autodiff gradients
    for every parameter leaf (bf16 rounding budget)."""
    from keras_nerf_tpu.kernels import fused_point_forward
    from keras_nerf_tpu.models.mlp import apply_mlp
    from keras_nerf_tpu.ops.encoding import positional_encoding

    cfg = NeRFConfig(n_layers=8, dense_units=256, skip_layer=4)
    params, _ = engine.init_params(jax.random.PRNGKey(0), cfg)
    p = 96
    pos = jax.random.normal(jax.random.PRNGKey(1), (p, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (p, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def xla_loss(prm):
        ex = positional_encoding(pos, 10)
        ed = positional_encoding(dirs, 4)
        rgb, sg = apply_mlp(prm, ex, ed, cfg.mlp, jnp.bfloat16)
        return jnp.sum(rgb * jnp.arange(3)) + 0.5 * jnp.sum(sg ** 2)

    def fused_loss(prm):
        rgb, sg = fused_point_forward(
            prm, pos, dirs, cfg.mlp, 10, 4, 64, True)
        return jnp.sum(rgb * jnp.arange(3)) + 0.5 * jnp.sum(sg ** 2)

    g_xla = jax.jit(jax.grad(xla_loss))(params)
    g_fused = jax.jit(jax.grad(fused_loss))(params)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_xla),
            jax.tree_util.tree_leaves_with_path(g_fused)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 0.05, (jax.tree_util.keystr(path), rel)


def test_train_step_with_use_pallas_learns(cfg):
    """End-to-end: a train step with config.use_pallas reduces loss."""
    pcfg = NeRFConfig(n_coarse=8, n_fine=8, pos_emb_xyz=10, pos_emb_dir=4,
                      n_layers=2, dense_units=256, skip_layer=1,
                      use_pallas=True)
    opt = engine.make_optimizer("adam", 5e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), pcfg, opt)
    b, h, w = 1, 8, 8
    images = jnp.tile(jnp.asarray([0.8, 0.2, 0.1, 1.0]), (b, h, w, 1))
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (b, h, w, 1))
    d = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(3), (b, h, w, 8), minval=2.0, maxval=6.0), -1)
    batch = (images, (o, d, t))

    step = jax.jit(lambda s, b, k: engine.train_step(
        s, b, k, optimizer=opt, config=pcfg, ray_chunks=64))
    losses = []
    for i in range(15):
        state, metrics = step(
            state, batch, jax.random.fold_in(jax.random.PRNGKey(4), i))
        losses.append(float(metrics["fine_loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_fused_backward_last_layer_skip():
    """Architectures whose LAST trunk layer is a skip layer route the
    encoded input into the heads (w_sf_enc path); gradients must still
    match XLA autodiff."""
    from keras_nerf_tpu.kernels import fused_point_forward
    from keras_nerf_tpu.models.mlp import apply_mlp
    from keras_nerf_tpu.ops.encoding import positional_encoding

    cfg = NeRFConfig(n_layers=2, dense_units=256, skip_layer=1)
    params, _ = engine.init_params(jax.random.PRNGKey(0), cfg)
    p = 64
    pos = jax.random.normal(jax.random.PRNGKey(1), (p, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (p, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def xla_loss(prm):
        ex = positional_encoding(pos, 10)
        ed = positional_encoding(dirs, 4)
        rgb, sg = apply_mlp(prm, ex, ed, cfg.mlp, jnp.bfloat16)
        return jnp.sum(rgb * jnp.arange(3)) + 0.5 * jnp.sum(sg ** 2)

    def fused_loss(prm):
        rgb, sg = fused_point_forward(prm, pos, dirs, cfg.mlp, 10, 4, 64,
                                      True)
        return jnp.sum(rgb * jnp.arange(3)) + 0.5 * jnp.sum(sg ** 2)

    g_xla = jax.jit(jax.grad(xla_loss))(params)
    g_fused = jax.jit(jax.grad(fused_loss))(params)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_xla),
            jax.tree_util.tree_leaves_with_path(g_fused)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 0.05, (jax.tree_util.keystr(path), rel)


def test_pack_rejects_unaligned_width():
    cfg = NeRFConfig(dense_units=100)
    params, _ = engine.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
        pack_mlp_params(params, cfg.mlp, cfg.pos_emb_xyz, cfg.pos_emb_dir)


@pytest.fixture(scope="module")
def quad_cfg():
    return NeRFConfig(n_coarse=8, n_fine=0, pos_emb_xyz=10, pos_emb_dir=4,
                      n_layers=3, dense_units=256, skip_layer=2,
                      white_background=True, compute_dtype="bfloat16")


def _chunk_fixture(cfg, r=32):
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((r, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(key, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(1), (r, cfg.n_coarse), minval=2.0, maxval=6.0),
        axis=-1)
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (r, 3))
    return o, d, t, tgt


def test_fused_train_chunk_forward_matches_render(quad_cfg):
    """with_grad=False: in-kernel quadrature must reproduce the XLA render
    (image, depth, weights) within bf16 rounding."""
    from keras_nerf_tpu.kernels.ray_march import fused_train_chunk
    from keras_nerf_tpu.kernels import pack_mlp_params
    params, _ = engine.init_params(jax.random.PRNGKey(2), quad_cfg)
    o, d, t, _ = _chunk_fixture(quad_cfg)
    packed = pack_mlp_params(params, quad_cfg.mlp, 10, 4)
    img, depth, weights = fused_train_chunk(
        packed, o, d, t, None, quad_cfg.mlp,
        white_background=True, with_grad=False, interpret=True)
    ref, _ = engine.render_chunk(params, o, d, t, jax.random.PRNGKey(0),
                                 quad_cfg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(weights), np.asarray(ref.weights),
                               atol=0.01)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                               atol=0.03)


def test_sigma_only_coarse_render_exact(quad_cfg):
    """coarse_image=False (sigma-only coarse pass) must leave the fine
    render and the coarse depth/weights EXACTLY unchanged — only the
    coarse image is dropped (returned all-zero). Guards the render-path
    fast coarse pass (`engine.render_image_batch(coarse_image=False)`,
    the inference CLI default)."""
    import dataclasses
    cfg = dataclasses.replace(quad_cfg, n_fine=8, use_pallas=True)
    params_c, params_f = engine.init_params(jax.random.PRNGKey(2), cfg)
    o, d, t, _ = _chunk_fixture(cfg)
    rays = (o.reshape(1, 4, 8, 3), d.reshape(1, 4, 8, 3),
            t.reshape(1, 4, 8, cfg.n_coarse))
    key = jax.random.PRNGKey(7)

    full_c, full_f = engine.render_image_batch(
        params_c, params_f, rays, key, cfg, ray_chunks=32)
    fast_c, fast_f = engine.render_image_batch(
        params_c, params_f, rays, key, cfg, ray_chunks=32,
        coarse_image=False)

    np.testing.assert_array_equal(np.asarray(fast_f["image"]),
                                  np.asarray(full_f["image"]))
    np.testing.assert_array_equal(np.asarray(fast_f["depth"]),
                                  np.asarray(full_f["depth"]))
    np.testing.assert_array_equal(np.asarray(fast_c["depth"]),
                                  np.asarray(full_c["depth"]))
    np.testing.assert_array_equal(np.asarray(fast_c["weights"]),
                                  np.asarray(full_c["weights"]))
    assert np.all(np.asarray(fast_c["image"]) == 0.0)

    # XLA path: same contract (zeros coarse image, identical fine).
    xla_cfg = dataclasses.replace(cfg, use_pallas=False)
    xf_c, xf_f = engine.render_image_batch(
        params_c, params_f, rays, key, xla_cfg, ray_chunks=32,
        coarse_image=False)
    xr_c, xr_f = engine.render_image_batch(
        params_c, params_f, rays, key, xla_cfg, ray_chunks=32)
    np.testing.assert_array_equal(np.asarray(xf_f["image"]),
                                  np.asarray(xr_f["image"]))
    assert np.all(np.asarray(xf_c["image"]) == 0.0)


@pytest.mark.parametrize("white_bg", [True, False])
def test_fused_train_chunk_grads_match_autodiff(white_bg):
    """The one-kernel fwd+quadrature+MSE+bwd must reproduce XLA autodiff
    gradients of the per-chunk loss for every leaf (n_fine=0 so both paths
    see identical sample points)."""
    from keras_nerf_tpu.kernels.ray_march import fused_train_chunk
    from keras_nerf_tpu.kernels import pack_mlp_params, unpack_grads
    cfg = NeRFConfig(n_coarse=8, n_fine=0, pos_emb_xyz=10, pos_emb_dir=4,
                     n_layers=3, dense_units=256, skip_layer=2,
                     white_background=white_bg, compute_dtype="bfloat16")
    params, _ = engine.init_params(jax.random.PRNGKey(2), cfg)
    o, d, t, tgt = _chunk_fixture(cfg)

    def xla_loss(prm):
        out, _ = engine.render_chunk(prm, o, d, t, jax.random.PRNGKey(0),
                                     cfg)
        return jnp.mean(jnp.square(out.image - tgt))

    g_xla = jax.jit(jax.grad(xla_loss))(params)

    packed = pack_mlp_params(params, cfg.mlp, 10, 4)
    img, _, _, d_packed = fused_train_chunk(
        packed, o, d, t, tgt, cfg.mlp, white_background=white_bg,
        with_grad=True, interpret=True)
    g_fused = unpack_grads(d_packed, cfg.mlp, 10, 4)

    # The differentiated loss value itself must agree.
    fused_loss = float(jnp.mean(jnp.square(img - tgt)))
    np.testing.assert_allclose(fused_loss, float(xla_loss(params)),
                               rtol=0.02)

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_xla),
            jax.tree_util.tree_leaves_with_path(g_fused)):
        a, b = np.asarray(a), np.asarray(b)
        # Norm-based: stable against single-element bf16 rounding noise
        # (the two paths round the PE arguments differently: the kernel
        # folds p = o + t d into base + t * slope).
        rel_norm = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-8)
        rel_max = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
        assert rel_norm < 0.03 and rel_max < 0.12, (
            jax.tree_util.keystr(path), rel_norm, rel_max, white_bg)


def test_fused_train_step_matches_xla_step():
    """engine.train_step with use_pallas must track the XLA step: same
    losses (bf16 budget) and decreasing loss over iterations, exercising
    the full scan + packed-gradient accumulation + unpack path."""
    cfg_x = NeRFConfig(n_coarse=8, n_fine=8, pos_emb_xyz=10, pos_emb_dir=4,
                       n_layers=2, dense_units=256, skip_layer=4,
                       white_background=True, compute_dtype="bfloat16")
    cfg_p = NeRFConfig(**{**cfg_x.to_model_config()},
                       white_background=True, compute_dtype="bfloat16",
                       use_pallas=True)
    opt = engine.make_optimizer("sgd", 1.0)
    b, h, w = 1, 4, 8
    images = jnp.tile(jnp.asarray([0.8, 0.2, 0.1, 1.0]), (b, h, w, 1))
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (b, h, w, 1))
    d = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(3), (b, h, w, 8), minval=2.0, maxval=6.0), -1)
    batch = (images, (o, d, t))

    s0x = engine.init_train_state(jax.random.PRNGKey(0), cfg_x, opt)
    s0p = engine.init_train_state(jax.random.PRNGKey(0), cfg_p, opt)
    key = jax.random.PRNGKey(5)
    s1x, mx = engine.train_step(s0x, batch, key, optimizer=opt,
                                config=cfg_x, ray_chunks=16)
    s1p, mp = engine.train_step(s0p, batch, key, optimizer=opt,
                                config=cfg_p, ray_chunks=16)
    # Same chunk keys => same sampling draws; losses agree to bf16 budget.
    np.testing.assert_allclose(float(mp["coarse_loss"]),
                               float(mx["coarse_loss"]), rtol=0.03)
    # SGD lr=1: param delta == gradient; coarse grads must agree closely.
    for a, ax, b0 in zip(jax.tree.leaves(s1p.coarse_params),
                         jax.tree.leaves(s1x.coarse_params),
                         jax.tree.leaves(s0x.coarse_params)):
        ga = np.asarray(b0) - np.asarray(a)
        gx = np.asarray(b0) - np.asarray(ax)
        rel = np.abs(ga - gx).max() / (np.abs(gx).max() + 1e-8)
        assert rel < 0.08, rel


@pytest.mark.parametrize("s_c,n_fine", [(64, 128), (24, 16)])
def test_fused_sampling_matches_xla_chain(s_c, n_fine):
    """The fine kernel's in-kernel sampling prologue (inverse-CDF + rank
    merge off the coarse weights) must reproduce the XLA
    sample_pdf_sorted + merge_sorted chain: same sorted uniform draws in,
    near-identical outputs (the only divergence is ~ulp-level CDF prefix
    arithmetic, which can shift a sampled depth within its bin). Also
    covers the lane-padding envelope (s_c, n_fine < 128)."""
    from keras_nerf_tpu.kernels import pack_mlp_params, unpack_grads
    from keras_nerf_tpu.kernels.ray_march import fused_train_chunk
    from keras_nerf_tpu.ops.sampling import (
        merge_sorted, midpoints, sample_pdf_sorted, sorted_uniforms)

    cfg = NeRFConfig(n_coarse=s_c, n_fine=n_fine, n_layers=3,
                     dense_units=256, skip_layer=2, white_background=True)
    params, _ = engine.init_params(jax.random.PRNGKey(2), cfg)
    packed = pack_mlp_params(params, cfg.mlp, cfg.pos_emb_xyz,
                             cfg.pos_emb_dir)
    r = 16
    o = jnp.zeros((r, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(jax.random.PRNGKey(1), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cp = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (r, s_c),
                                     minval=2.0, maxval=6.0), axis=-1)
    # Peaky weights: exercises near-empty bins (the denom clamp).
    wc = jax.random.uniform(jax.random.PRNGKey(4), (r, s_c)) ** 3
    tgt = jax.random.uniform(jax.random.PRNGKey(5), (r, 3))
    key = jax.random.PRNGKey(7)

    pts = merge_sorted(cp, sample_pdf_sorted(key, midpoints(cp), wc,
                                             n_fine))
    ref = fused_train_chunk(packed, o, d, pts, tgt, cfg.mlp,
                            white_background=True, with_grad=True,
                            emit_weights=False, interpret=True)
    u = sorted_uniforms(key, (r,), n_fine)
    new = fused_train_chunk(packed, o, d, None, tgt, cfg.mlp,
                            white_background=True, with_grad=True,
                            emit_weights=False,
                            sample_inputs=(cp, wc, u), interpret=True)
    np.testing.assert_allclose(np.asarray(new[0]), np.asarray(ref[0]),
                               atol=2e-3)  # image
    np.testing.assert_allclose(np.asarray(new[1]), np.asarray(ref[1]),
                               atol=5e-3)  # depth
    g_ref = unpack_grads(ref[3], cfg.mlp, cfg.pos_emb_xyz, cfg.pos_emb_dir)
    g_new = unpack_grads(new[3], cfg.mlp, cfg.pos_emb_xyz, cfg.pos_emb_dir)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_new)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-8)
        assert rel < 0.02, (jax.tree_util.keystr(path), rel)


@pytest.mark.parametrize("merge", [False, True])
def test_fused_occupancy_sampling_matches_xla_chain(merge):
    """The 4-tuple sample_inputs form (the occupancy-train tier): the CDF
    source is the probe-bin occupancy field and the merge partner is the
    stratified depths (or absent) — must reproduce the XLA
    sample_occupied (+ merge_sorted) chain given the same draws."""
    from keras_nerf_tpu.kernels import pack_mlp_params, unpack_grads
    from keras_nerf_tpu.kernels.ray_march import fused_train_chunk
    from keras_nerf_tpu.ops.occupancy import sample_occupied
    from keras_nerf_tpu.ops.sampling import merge_sorted, sorted_uniforms

    s_c, n_probe, occ_n = 24, 32, 16
    cfg = NeRFConfig(n_coarse=s_c, n_fine=occ_n, n_layers=3,
                     dense_units=256, skip_layer=2, white_background=True)
    params, _ = engine.init_params(jax.random.PRNGKey(2), cfg)
    packed = pack_mlp_params(params, cfg.mlp, cfg.pos_emb_xyz,
                             cfg.pos_emb_dir)
    r = 16
    o = jnp.zeros((r, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(jax.random.PRNGKey(1), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tc = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (r, s_c),
                                     minval=2.0, maxval=6.0), axis=-1)
    # Probe bins: shared uniform mids, binary occupancy with empty rays
    # (row 0 all-empty exercises the weights+1e-5 uniform fallback).
    mids = jnp.broadcast_to(
        jnp.linspace(2.0, 6.0, n_probe + 1)[:-1] + 2.0 / n_probe,
        (r, n_probe))
    occ = (jax.random.uniform(jax.random.PRNGKey(4), (r, n_probe))
           > 0.7).astype(jnp.float32).at[0].set(0.0)
    tgt = jax.random.uniform(jax.random.PRNGKey(5), (r, 3))
    key = jax.random.PRNGKey(7)

    pts = sample_occupied(key, mids, occ, occ_n)
    pts = merge_sorted(tc, pts) if merge else pts
    ref = fused_train_chunk(packed, o, d, pts, tgt, cfg.mlp,
                            white_background=True, with_grad=True,
                            emit_weights=False, interpret=True)
    u = sorted_uniforms(key, (r,), occ_n)
    new = fused_train_chunk(packed, o, d, None, tgt, cfg.mlp,
                            white_background=True, with_grad=True,
                            emit_weights=False,
                            sample_inputs=(mids, occ, u,
                                           tc if merge else None),
                            interpret=True)
    np.testing.assert_allclose(np.asarray(new[0]), np.asarray(ref[0]),
                               atol=2e-3)  # image
    np.testing.assert_allclose(np.asarray(new[1]), np.asarray(ref[1]),
                               atol=5e-3)  # depth
    g_ref = unpack_grads(ref[3], cfg.mlp, cfg.pos_emb_xyz, cfg.pos_emb_dir)
    g_new = unpack_grads(new[3], cfg.mlp, cfg.pos_emb_xyz, cfg.pos_emb_dir)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_new)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-8)
        assert rel < 0.02, (jax.tree_util.keystr(path), rel)


@pytest.mark.parametrize("merge", [False, True])
def test_occupancy_train_step_fused_matches_xla_chain(merge, monkeypatch):
    """Full occupancy train step: the fused-prologue route and the
    KNT_NO_FUSED_SAMPLING XLA-chain route must take the same optimizer
    step (same RNG stream end-to-end)."""
    from keras_nerf_tpu.ops.occupancy import DEFAULT_AABB

    cfg = NeRFConfig(n_coarse=8, n_fine=8, n_layers=2, dense_units=256,
                     skip_layer=4, white_background=True, use_pallas=True)
    opt = engine.make_optimizer("sgd", 1.0)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    from keras_nerf_tpu.data.synthetic import random_ray_batch
    batch = random_ray_batch(1, 4, 8, cfg.n_coarse, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    occ = (8, 8, 2.0, 6.0, DEFAULT_AABB, merge)
    grid = jnp.ones((16, 16, 16), jnp.float32).at[:8].set(0.0)

    def run():
        s, m = engine.train_step(state, batch, key, occ_grid=grid,
                                 optimizer=opt, config=cfg, ray_chunks=16,
                                 occupancy=occ)
        return s, m

    s_f, m_f = run()
    monkeypatch.setenv("KNT_NO_FUSED_SAMPLING", "1")
    s_x, m_x = run()
    np.testing.assert_allclose(float(m_f["fine_loss"]),
                               float(m_x["fine_loss"]), rtol=0.02)
    for a, b in zip(jax.tree.leaves(s_f.fine_params),
                    jax.tree.leaves(s_x.fine_params)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
        assert rel < 0.05, rel


def test_fused_sampling_engine_gate(monkeypatch):
    """KNT_NO_FUSED_SAMPLING=1 must route the engine back through the
    XLA sampling chain, and both engine routes must agree on the fine
    render (the coarse pass is identical by construction)."""
    cfg = NeRFConfig(n_coarse=8, n_fine=8, pos_emb_xyz=10, pos_emb_dir=4,
                     n_layers=2, dense_units=256, skip_layer=4,
                     white_background=True, use_pallas=True)
    params_c, params_f = engine.init_params(jax.random.PRNGKey(2), cfg)
    b, h, w = 1, 4, 8
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (b, h, w, 1))
    d = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(
        jax.random.PRNGKey(3), (b, h, w, cfg.n_coarse),
        minval=2.0, maxval=6.0), -1)
    rays = (o, d, t)
    key = jax.random.PRNGKey(5)

    assert engine._fused_sampling_ok(cfg)
    _, fused = engine.render_image_batch(params_c, params_f, rays, key,
                                         cfg, ray_chunks=32)
    monkeypatch.setenv("KNT_NO_FUSED_SAMPLING", "1")
    assert not engine._fused_sampling_ok(cfg)
    _, xla = engine.render_image_batch(params_c, params_f, rays, key,
                                       cfg, ray_chunks=32)
    np.testing.assert_allclose(np.asarray(fused["image"]),
                               np.asarray(xla["image"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(fused["depth"]),
                               np.asarray(xla["depth"]), atol=5e-3)


def test_saturated_pixel_gradient_matches_xla():
    """A ray whose density is exactly zero renders pre_clip == 1.0 exactly
    on white background; XLA's clip autodiff passes a 0.5 subgradient
    there, and the fused kernel must too (a strict (0,1) mask would kill
    the pixel's gradient forever)."""
    import dataclasses

    cfg = NeRFConfig(n_coarse=8, n_fine=0, pos_emb_xyz=10, pos_emb_dir=4,
                     n_layers=2, dense_units=256, skip_layer=1,
                     white_background=True)
    state = engine.init_train_state(
        jax.random.PRNGKey(0), cfg, engine.make_optimizer("sgd", 1e-2))
    # The review's regression case: density collapsed to ~0 but still in
    # relu's live region (sigma_pre = 1e-9 > 0). sum(w) ~ 4e-9 < 1 ulp of
    # 1.0, so white-bg completion renders image == 1.0 EXACTLY (the clip
    # boundary) while the quadrature still carries real gradient into the
    # sigma head — the path a strict (0, 1) clip mask would kill forever.
    params = jax.tree.map(lambda x: x, state.coarse_params)
    params["sigma"]["kernel"] = params["sigma"]["kernel"] * 0.0
    params["sigma"]["bias"] = params["sigma"]["bias"] * 0.0 + 1e-9

    r = 64
    o = jnp.zeros((r, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(jax.random.PRNGKey(1), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (r, 8),
                                    minval=2.0, maxval=6.0), axis=-1)
    target = jnp.full((r, 3), 0.5)

    def xla_loss(p):
        out, _ = engine.render_chunk(
            p, o, d, t, jax.random.PRNGKey(3),
            dataclasses.replace(cfg, use_pallas=False))
        return jnp.mean((out.image - target) ** 2)

    g_xla = jax.jit(jax.grad(xla_loss))(params)

    from keras_nerf_tpu.kernels import pack_mlp_params, unpack_grads
    from keras_nerf_tpu.kernels.ray_march import fused_train_chunk

    packed = pack_mlp_params(params, cfg.mlp, cfg.pos_emb_xyz,
                             cfg.pos_emb_dir)
    image, _, _, g_packed = fused_train_chunk(
        packed, o, d, t, target, cfg.mlp, pos_emb_xyz=cfg.pos_emb_xyz,
        pos_emb_dir=cfg.pos_emb_dir, white_background=True, with_grad=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(image), 1.0)
    g_fused = unpack_grads(g_packed, cfg.mlp, cfg.pos_emb_xyz,
                           cfg.pos_emb_dir)

    # The saturated-clip gradient flows into the sigma head in BOTH paths
    # (0.5 subgradient) — neither may be all-zero, and they must agree.
    gs_xla = np.asarray(g_xla["sigma"]["bias"])
    gs_fused = np.asarray(g_fused["sigma"]["bias"])
    assert np.abs(gs_xla).max() > 0.0
    rel = np.abs(gs_xla - gs_fused).max() / (np.abs(gs_xla).max() + 1e-12)
    assert rel < 0.05, rel


def _flops_from_packed_shapes(packed, sigma_only=False):
    """Independent FLOP count: 2*K*N summed over the dots `_forward_core`
    issues, with K/N read off the ACTUAL packed weight matrices."""
    from keras_nerf_tpu.kernels.ray_march import LANE

    f = 0
    for w in packed["trunk_w"]:
        f += 2 * w.shape[0] * w.shape[1]
    for w in packed["trunk_enc_w"]:
        if w is not None:
            f += 2 * w.shape[0] * w.shape[1]
    if sigma_only:
        # sigma-only reads the [:, u:] (width-LANE) slice of the fused head
        f += 2 * packed["w_sf"].shape[0] * LANE
        if packed["w_sf_enc"] is not None:
            f += 2 * packed["w_sf_enc"].shape[0] * LANE
        return f
    for name in ("w_sf", "w_sf_enc", "w_rf_top", "w_rf_enc", "w_rgb"):
        w = packed[name]
        if w is not None:
            f += 2 * w.shape[0] * w.shape[1]
    return f


@pytest.mark.parametrize("n_layers,skip_layer", [(8, 4), (5, 4), (6, 2)])
def test_padded_fwd_flop_per_point_matches_packed_shapes(
        n_layers, skip_layer):
    """The FLOP model bench.py's mfu uses must equal the count derived from
    the packed kernel matrices, for default AND last-skip architectures
    ((5,4) and (6,2) make the final trunk layer follow a skip concat,
    exercising the w_sf_enc branches)."""
    from keras_nerf_tpu.kernels.ray_march import padded_fwd_flop_per_point

    config = NeRFConfig(n_layers=n_layers, skip_layer=skip_layer)
    params, _ = engine.init_params(jax.random.PRNGKey(0), config)
    packed = pack_mlp_params(params, config.mlp, config.pos_emb_xyz,
                             config.pos_emb_dir)
    for sigma_only in (False, True):
        assert padded_fwd_flop_per_point(
            config.mlp, sigma_only=sigma_only
        ) == _flops_from_packed_shapes(packed, sigma_only=sigma_only)


def test_padded_fwd_flop_default_constants():
    """Pin the derived counts to the documented constants (docs/DESIGN.md
    'Workload shape' 1.376 MFLOP/point; render roofline 1.114 MFLOP
    sigma-only) for the reference 8x256 architecture."""
    from keras_nerf_tpu.kernels.ray_march import padded_fwd_flop_per_point

    mlp = NeRFConfig().mlp
    assert padded_fwd_flop_per_point(mlp) == 1_376_256
    assert padded_fwd_flop_per_point(mlp, sigma_only=True) == 1_114_112
