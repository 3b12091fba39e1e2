"""Fused-kernel timings on the real TPU.

Default: chunk-level fused forward / fwd+bwd and full pallas train steps
at several chunk sizes.
``--components``: isolate encode / fused_apply_mlp / fused_mlp_backward
and scan their tile sizes (absorbed from the former profile_pallas2.py).

Usage: python scripts/profile_pallas.py [--tile 2048] [--components]
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
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def run_components(cfg, iters):
    """Isolate encode/MLP-fwd/MLP-bwd kernel cost; scan tile sizes."""
    from keras_nerf_tpu.kernels import pack_mlp_params
    from keras_nerf_tpu.kernels.ray_march import (encode_block128,
                                                  fused_apply_mlp,
                                                  fused_mlp_backward)
    from keras_nerf_tpu.models import engine

    params, _ = engine.init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(2)

    r, s = 2048, 192
    p = r * s
    pos = jax.random.normal(key, (p, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(3), (p, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    enc_fn = jax.jit(lambda a, b: encode_block128(a, b, 10, 4))
    ms = timeit(enc_fn, pos, dirs, iters=iters, sync=lambda o: float(o[0, 0]))
    print(f"encode_block128 ({p} pts):        {ms:7.2f} ms")
    enc = enc_fn(pos, dirs)

    packed = pack_mlp_params(params, cfg.mlp, 10, 4)
    g128 = jax.random.normal(key, (p, 128)).astype(jnp.bfloat16)

    for tile in (512, 1024, 2048, 4096):
        fwd = jax.jit(lambda e, _t=tile: fused_apply_mlp(
            packed, e, cfg.mlp, tile=_t, interpret=False))
        ms = timeit(fwd, enc, iters=iters, sync=lambda o: float(o[0, 0]))
        print(f"fused_apply_mlp tile={tile:5d}:      {ms:7.2f} ms")

    for tile in (256, 512, 1024, 2048):
        try:
            bwd = jax.jit(lambda e, g, _t=tile: fused_mlp_backward(
                packed, e, g, cfg.mlp, tile=_t, interpret=False))
            ms = timeit(bwd, enc, g128, iters=iters,
                        sync=lambda o: float(o["b_rf"].ravel()[0]))
            print(f"fused_mlp_backward tile={tile:5d}:  {ms:7.2f} ms")
        except Exception as e:
            print(f"fused_mlp_backward tile={tile:5d}:  FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=2048)
    p.add_argument("--bwd_tile", type=int, default=1024)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--components", action="store_true",
                   help="isolate encode/fwd/bwd kernels and scan tiles")
    args = p.parse_args()

    from keras_nerf_tpu.data.synthetic import random_ray_batch
    from keras_nerf_tpu.kernels import (fused_point_forward,
                                        fused_render_chunk, pack_mlp_params)
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.models.engine import NeRFConfig

    cfg = NeRFConfig(white_background=True, compute_dtype="bfloat16")
    if args.components:
        run_components(cfg, args.iters)
        return
    pcfg = NeRFConfig(white_background=True, compute_dtype="bfloat16",
                      use_pallas=True)
    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    params = state.fine_params
    key = jax.random.PRNGKey(2)

    r, s = 2048, 192
    o = jnp.zeros((r, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(key, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(key, (r, s), minval=2.0, maxval=6.0), -1)

    def sync_render(out):
        float(out.image[0, 0]) if hasattr(out, "image") else float(
            jax.tree.leaves(out)[0].ravel()[0])

    packed = pack_mlp_params(params, cfg.mlp, cfg.pos_emb_xyz, cfg.pos_emb_dir)
    fwd = jax.jit(lambda pk: fused_render_chunk(
        packed, o, d, t, cfg, tile=args.tile, interpret=False))
    ms = timeit(fwd, packed, iters=args.iters, sync=sync_render)
    print(f"fused fine fwd (2048x192, tile {args.tile}): {ms:7.2f} ms")

    # fwd+bwd through custom_vjp (pack included, as in training)
    def loss(prm):
        positions = (o[:, None, :] + d[:, None, :] * t[..., None])
        dirs = jnp.broadcast_to(d[:, None, :], positions.shape)
        rgb, sg = fused_point_forward(
            prm, positions.reshape(-1, 3), dirs.reshape(-1, 3),
            cfg.mlp, cfg.pos_emb_xyz, cfg.pos_emb_dir, args.tile, False)
        from keras_nerf_tpu.ops.rendering import render_rays
        out = render_rays(rgb.reshape(r, s, 3), sg.reshape(r, s), t,
                          white_background=True)
        return jnp.mean(out.image ** 2)

    g = jax.jit(jax.grad(loss))
    ms = timeit(g, params, iters=args.iters,
                sync=lambda o_: float(jax.tree.leaves(o_)[0].ravel()[0]))
    print(f"fused fine fwd+bwd (2048x192):              {ms:7.2f} ms")

    # full train steps
    batch = random_ray_batch(1, 128, 128, cfg.n_coarse, jax.random.PRNGKey(1))
    for rc in (2048, 4096, 8192, 16384):
        try:
            step = jax.jit(lambda st, b, k, _rc=rc: engine.train_step(
                st, b, k, optimizer=opt, config=pcfg, ray_chunks=_rc))
            st2 = engine.init_train_state(jax.random.PRNGKey(0), pcfg, opt)
            ms = timeit(step, st2, batch, key, iters=args.iters,
                        sync=lambda o_: float(o_[1]["fine_loss"]))
            print(f"pallas train_step chunks={rc:6d}: {ms:8.1f} ms "
                  f"({16384 / ms * 1e3:,.0f} rays/s)")
        except Exception as e:
            print(f"pallas train_step chunks={rc:6d}: FAILED "
                  f"({type(e).__name__}: {str(e)[:150]})")


if __name__ == "__main__":
    main()
