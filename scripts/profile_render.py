"""Component timing for the 256^2 novel-view render path (real TPU).

Times, per ray chunk and per frame, at several chunk sizes:
  * full frame render (the bench.py --mode render workload),
  * coarse fused kernel alone (64 samples),
  * fine fused kernel alone (192 samples),
  * sample_pdf_sorted + merge_sorted alone.

Sync is a host scalar fetch (block_until_ready does not block on axon).
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from keras_nerf_tpu.data.synthetic import random_ray_batch
from keras_nerf_tpu.kernels import pack_mlp_params
from keras_nerf_tpu.kernels.ray_march import fused_train_chunk
from keras_nerf_tpu.models import engine
from keras_nerf_tpu.models.engine import NeRFConfig
from keras_nerf_tpu.ops.sampling import (merge_sorted, midpoints,
                                         sample_pdf_sorted)


def timeit(fn, sync, iters=10):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_wh", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    config = NeRFConfig(white_background=True, compute_dtype="bfloat16")
    coarse, fine = engine.init_params(jax.random.PRNGKey(0), config)
    packed_c = pack_mlp_params(coarse, config.mlp, config.pos_emb_xyz,
                               config.pos_emb_dir)
    packed_f = pack_mlp_params(fine, config.mlp, config.pos_emb_xyz,
                               config.pos_emb_dir)
    _, rays = random_ray_batch(1, args.img_wh, args.img_wh, config.n_coarse,
                               jax.random.PRNGKey(1))
    num_rays = args.img_wh * args.img_wh

    def sync(x=None):
        if x is None:
            x = jnp.zeros(())
        leaf = jax.tree.leaves(x)[0]
        float(jnp.sum(leaf.astype(jnp.float32)).ravel()[0])

    print(f"== render {args.img_wh}x{args.img_wh}, Nc=64 Nf=128 ==")

    for chunk in (2048, 4096, 8192, 16384, 65536):
        if num_rays % chunk:
            continue
        render = jax.jit(lambda pc, pf, r, k: engine.render_image_batch(
            pc, pf, r, k, config, chunk, with_weights=False)[1]["image"])
        dt = timeit(lambda: render(coarse, fine, rays,
                                   jax.random.PRNGKey(2)), sync, args.iters)
        print(f"frame chunk={chunk:6d}: {dt*1e3:8.1f} ms "
              f"({1.0/dt:5.2f} fps)")

    # Component timings at one chunk size.
    chunk = 8192
    o = jnp.zeros((chunk, 3), jnp.float32).at[:, 2].set(4.0)
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (chunk, 1))
    t64 = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 64), (chunk, 64))
    t192 = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 192), (chunk, 192))
    w65 = jax.random.uniform(jax.random.PRNGKey(3), (chunk, 64))

    kc = jax.jit(lambda p, oo, dd, tt: fused_train_chunk(
        p, oo, dd, tt, None, config.mlp, pos_emb_xyz=config.pos_emb_xyz,
        pos_emb_dir=config.pos_emb_dir, white_background=True,
        with_grad=False))
    dt = timeit(lambda: kc(packed_c, o, d, t64), sync, args.iters)
    per_frame = dt * (num_rays / chunk)
    print(f"coarse kernel chunk={chunk}: {dt*1e3:6.2f} ms "
          f"-> {per_frame*1e3:6.1f} ms/frame")

    dt = timeit(lambda: kc(packed_f, o, d, t192), sync, args.iters)
    per_frame = dt * (num_rays / chunk)
    print(f"fine  kernel chunk={chunk}: {dt*1e3:6.2f} ms "
          f"-> {per_frame*1e3:6.1f} ms/frame")

    samp = jax.jit(lambda k, tt, ww: merge_sorted(
        tt, sample_pdf_sorted(k, midpoints(tt), ww, config.n_fine)))
    dt = timeit(lambda: samp(jax.random.PRNGKey(4), t64, w65), sync,
                args.iters)
    per_frame = dt * (num_rays / chunk)
    print(f"sample+merge  chunk={chunk}: {dt*1e3:6.2f} ms "
          f"-> {per_frame*1e3:6.1f} ms/frame")


if __name__ == "__main__":
    main()
