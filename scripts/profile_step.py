"""Per-component timing of the train step on the real TPU.

Times each stage of the headline workload (128^2, batch 1, Nc=64, Nf=128,
8x256 MLP, bf16) in isolation so optimization effort goes where the
milliseconds are. Sync discipline: a host scalar fetch after each timed
region (block_until_ready does not block on the axon backend — CLAUDE.md).

Usage:  python scripts/profile_step.py [--img_wh 128] [--chunks 2048 ...]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=2, sync=None):
    """Median-free simple timing: warmup, then wall over `iters` calls."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    (sync or default_sync)(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    (sync or default_sync)(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def default_sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf) if hasattr(leaf, "sum") else leaf)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_wh", type=int, default=128)
    p.add_argument("--chunks", type=int, nargs="*",
                   default=[2048, 4096, 8192, 16384])
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from keras_nerf_tpu.data.synthetic import random_ray_batch
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.models.engine import NeRFConfig
    from keras_nerf_tpu.models.mlp import apply_mlp
    from keras_nerf_tpu.ops.encoding import encode_position_and_directions
    from keras_nerf_tpu.ops.rendering import render_rays
    from keras_nerf_tpu.ops.sampling import (merge_sorted, midpoints,
                                             sample_pdf_sorted)

    cfg = NeRFConfig(white_background=True, compute_dtype="bfloat16")
    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    batch = random_ray_batch(1, args.img_wh, args.img_wh, cfg.n_coarse,
                             jax.random.PRNGKey(1))
    num_rays = args.img_wh * args.img_wh
    key = jax.random.PRNGKey(2)

    print(f"devices: {jax.devices()}")

    # --- full train step at each chunking -------------------------------
    for rc in args.chunks:
        if rc > num_rays:
            continue
        try:
            step = jax.jit(lambda s, b, k, _rc=rc: engine.train_step(
                s, b, k, optimizer=opt, config=cfg, ray_chunks=_rc))
            ms = timeit(step, state, batch, key, iters=args.iters,
                        sync=lambda o: float(o[1]["fine_loss"]))
            print(f"train_step chunks={rc:6d}: {ms:8.1f} ms "
                  f"({num_rays / ms * 1e3:,.0f} rays/s)")
        except Exception as e:  # OOM etc.
            print(f"train_step chunks={rc:6d}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})")

    # --- forward-only (losses, no grad) at chunks=2048 -------------------
    def fwd_only(s, b, k, rc):
        images, rays = b
        tgt = images[..., :3].reshape(num_rays, 3)
        o, d, t = engine._flatten_rays(rays, num_rays, cfg.n_coarse)
        nchunks = num_rays // rc
        xs = (engine._chunked(o, nchunks), engine._chunked(d, nchunks),
              engine._chunked(t, nchunks), engine._chunked(tgt, nchunks),
              jax.random.split(k, nchunks))

        def body(c, x):
            oc, dc, tc, tg, kk = x
            out_c, out_f = engine.render_chunk_pair(
                s.coarse_params, s.fine_params, oc, dc, tc, kk, cfg)
            return c + jnp.mean((out_f.image - tg) ** 2) \
                     + jnp.mean((out_c.image - tg) ** 2), None

        loss, _ = jax.lax.scan(body, 0.0, xs)
        return loss

    for rc in [2048, 8192]:
        f = jax.jit(lambda s, b, k, _rc=rc: fwd_only(s, b, k, _rc))
        ms = timeit(f, state, batch, key, iters=args.iters,
                    sync=lambda o: float(o))
        print(f"forward-only chunks={rc:6d}: {ms:8.1f} ms")

    # --- isolated pieces on one 2048-ray chunk ---------------------------
    rc = 2048
    o = jnp.zeros((rc, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(key, (rc, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(key, (rc, cfg.n_coarse),
                                    minval=2.0, maxval=6.0), axis=-1)
    w = jax.random.uniform(key, (rc, cfg.n_coarse))

    samp = jax.jit(lambda k_, t_, w_: sample_pdf_sorted(
        k_, midpoints(t_), w_, cfg.n_fine))
    ms = timeit(samp, key, t, w, iters=args.iters)
    print(f"sample_pdf_sorted (2048x64->128): {ms:8.2f} ms/chunk")

    fine_t = samp(key, t, w)
    mrg = jax.jit(merge_sorted)
    ms = timeit(mrg, t, fine_t, iters=args.iters)
    print(f"merge_sorted (64+128):            {ms:8.2f} ms/chunk")

    # coarse / fine MLP forward (encode + apply + render)
    def mlp_pass(params, points):
        enc_xyz, enc_dir = encode_position_and_directions(
            o, d, points, cfg.pos_emb_xyz, cfg.pos_emb_dir)
        rgb, sigma = apply_mlp(params, enc_xyz, enc_dir, cfg.mlp, cfg.dtype)
        return render_rays(rgb, sigma, points, white_background=True)

    points192 = mrg(t, fine_t)
    fwd_c = jax.jit(lambda p: mlp_pass(p, t))
    fwd_f = jax.jit(lambda p: mlp_pass(p, points192))
    ms = timeit(fwd_c, state.coarse_params, iters=args.iters)
    print(f"coarse fwd (2048x64):             {ms:8.2f} ms/chunk")
    ms = timeit(fwd_f, state.fine_params, iters=args.iters)
    print(f"fine fwd (2048x192):              {ms:8.2f} ms/chunk")

    # gradient of one fine pass (fwd+bwd)
    gf = jax.jit(jax.grad(
        lambda p: jnp.mean(mlp_pass(p, points192).image ** 2)))
    ms = timeit(gf, state.fine_params, iters=args.iters)
    print(f"fine fwd+bwd (2048x192):          {ms:8.2f} ms/chunk")
    gc = jax.jit(jax.grad(
        lambda p: jnp.mean(mlp_pass(p, t).image ** 2)))
    ms = timeit(gc, state.coarse_params, iters=args.iters)
    print(f"coarse fwd+bwd (2048x64):         {ms:8.2f} ms/chunk")


if __name__ == "__main__":
    main()
