"""Render-path timing for the 256^2 novel-view workload (real TPU).

Default: whole-frame render at several ray-chunk sizes (end-to-end, the
`bench.py --mode render` workload — dispatch included, the honest fps).

``--components``: per-component device time with in-jit repetition
(absorbed from the former profile_render2.py). Per-call dispatch on the
tunneled TPU costs ~40 ms, which swamps isolated component timings; each
component is repeated REPS times inside one jitted lax.scan. The carry
scalar is folded into an INPUT of every repetition (not just the output
sum) — a carry that only sequences the accumulation leaves the component
itself loop-invariant and LICM hoists it out of the scan, dividing the
reading by REPS (verify-skill pitfall; the pre-round-3 version of this
script had exactly that bug).
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

REPS = 20


def timeit(fn, sync, iters=10):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def device_ms(jitted, *args, calls=3):
    """ms per inner repetition: one warm call, then `calls` timed."""
    out = jitted(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(calls):
        out = jitted(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / calls / REPS * 1e3


def repeat(fn):
    """fn(carry_scalar, *args) -> scalar; scanned REPS times in one jit."""
    def run(*args):
        def body(c, _):
            return fn(c, *args), None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=REPS)
        return c
    return jax.jit(run)


def run_components(config, chunk):
    coarse, fine = engine.init_params(jax.random.PRNGKey(0), config)
    packed_c = pack_mlp_params(coarse, config.mlp, config.pos_emb_xyz,
                               config.pos_emb_dir)
    packed_f = pack_mlp_params(fine, config.mlp, config.pos_emb_xyz,
                               config.pos_emb_dir)

    key = jax.random.PRNGKey(1)
    o = jnp.zeros((chunk, 3), jnp.float32).at[:, 2].set(4.0)
    d = jax.random.normal(key, (chunk, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t64 = jnp.sort(jax.random.uniform(key, (chunk, 64),
                                      minval=2.0, maxval=6.0), axis=-1)
    t192 = jnp.sort(jax.random.uniform(key, (chunk, 192),
                                       minval=2.0, maxval=6.0), axis=-1)
    tgt = jax.random.uniform(key, (chunk, 3))
    w64 = jax.random.uniform(key, (chunk, 64))
    frame_chunks = 65536 // chunk

    def report(name, ms, per_frame_scale=frame_chunks):
        print(f"{name:42s} {ms:7.2f} ms/chunk "
              f"-> {ms * per_frame_scale:6.1f} ms/frame(256^2)")

    # coarse forward kernel (sigma-only + weights, as the render path runs)
    def f(c, pc, oo, dd, tt):
        img, dep, wts = fused_train_chunk(
            pc, oo + c * 1e-30, dd, tt, None, config.mlp,
            pos_emb_xyz=config.pos_emb_xyz, pos_emb_dir=config.pos_emb_dir,
            white_background=True, with_grad=False, sigma_only=True)[:3]
        return c + jnp.sum(img) + wts.ravel()[0]
    report("coarse fwd kernel 64s (+weights)",
           device_ms(repeat(f), packed_c, o, d, t64))

    # fine forward kernel, no weights output
    def f2(c, pf, oo, dd, tt):
        img, dep, wts = fused_train_chunk(
            pf, oo + c * 1e-30, dd, tt, None, config.mlp,
            pos_emb_xyz=config.pos_emb_xyz, pos_emb_dir=config.pos_emb_dir,
            white_background=True, with_grad=False, emit_weights=False)[:3]
        return c + jnp.sum(img)
    report("fine fwd kernel 192s (no weights)",
           device_ms(repeat(f2), packed_f, o, d, t192))

    # sampling + merge
    def f3(c, tt, ww, kk):
        fp = sample_pdf_sorted(kk, midpoints(tt), ww + c * 1e-30, 128)
        return c + jnp.sum(merge_sorted(tt, fp))
    report("sample_pdf_sorted + merge (64->128)",
           device_ms(repeat(f3), t64, w64, key))

    # train kernels for comparison (per-frame scale = 128^2 step chunks)
    def f4(c, pc, oo, dd, tt, gg):
        out = fused_train_chunk(
            pc, oo + c * 1e-30, dd, tt, gg, config.mlp,
            pos_emb_xyz=config.pos_emb_xyz, pos_emb_dir=config.pos_emb_dir,
            white_background=True, with_grad=True, emit_weights=True)
        return c + jnp.sum(out[0]) + jnp.sum(out[3]["w_sf"])
    report("coarse TRAIN kernel 64s (fwd+bwd)",
           device_ms(repeat(f4), packed_c, o, d, t64, tgt), 8)

    def f5(c, pf, oo, dd, tt, gg):
        out = fused_train_chunk(
            pf, oo + c * 1e-30, dd, tt, gg, config.mlp,
            pos_emb_xyz=config.pos_emb_xyz, pos_emb_dir=config.pos_emb_dir,
            white_background=True, with_grad=True, emit_weights=False)
        return c + jnp.sum(out[0]) + jnp.sum(out[3]["w_sf"])
    report("fine TRAIN kernel 192s (fwd+bwd)",
           device_ms(repeat(f5), packed_f, o, d, t192, tgt), 8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_wh", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=8192,
                    help="--components mode: ray chunk size")
    ap.add_argument("--components", action="store_true",
                    help="per-component device timings (in-jit repetition)")
    args = ap.parse_args()

    config = NeRFConfig(white_background=True, compute_dtype="bfloat16")
    if args.components:
        run_components(config, args.chunk)
        return

    coarse, fine = engine.init_params(jax.random.PRNGKey(0), config)
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
        render = jax.jit(lambda pc, pf, r, k, _c=chunk:
                         engine.render_image_batch(
                             pc, pf, r, k, config, _c,
                             with_weights=False)[1]["image"])
        dt = timeit(lambda: render(coarse, fine, rays,
                                   jax.random.PRNGKey(2)), sync, args.iters)
        print(f"frame chunk={chunk:6d}: {dt*1e3:8.1f} ms "
              f"({1.0/dt:5.2f} fps)")


if __name__ == "__main__":
    main()
