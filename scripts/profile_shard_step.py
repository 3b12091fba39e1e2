"""Per-device step time under ray-sharded DP (--shard_rays), measured on
ONE real chip.

Under ``train.py --shard_rays`` each of N devices runs the SAME fused
train step the single chip runs, just on a 1/N height band of every
image (plus a ~9.5 MB gradient all-reduce that one chip cannot time).
So the v5e-8 epoch-time estimate is

    steps_per_epoch * t_step(band) + n_val * t_eval(band)

with BOTH terms measured HERE: the full train step and the exact-math
eval step on a [1, H/N, W] ray batch (under ``--shard_rays`` eval is
band-sharded too; the whole-image metric all-gather is one [1, H, W, 3]
collective per model, not measurable single-chip but bounded sub-ms on
ICI like the 9.5 MB grad all-reduce). Sync discipline: host scalar fetch
(block_until_ready does not block on the axon backend — CLAUDE.md).

Usage:  python scripts/profile_shard_step.py [--img_wh 128] [--n 8 4 2 1]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_wh", type=int, default=128)
    p.add_argument("--n", type=int, nargs="*", default=[1, 2, 4, 8],
                   help="device counts to simulate (band height = H/n)")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--ray_chunks", type=int, default=0,
                   help="chunk size the deployed run uses (train.py "
                        "defaults to 1024; the measured quality recipes "
                        "pass 16384); 0 = whole band in one chunk. "
                        "Chunking changes scan overhead, so measure with "
                        "the SAME value as the run being estimated")
    p.add_argument("--steps_per_epoch", type=int, default=100,
                   help="train batches per epoch for the printed epoch "
                        "estimate (= n_train_images / batch_size; 100 "
                        "matches the synthetic quality scenes)")
    p.add_argument("--n_val", type=int, default=8,
                   help="val images per epoch for the eval term of the "
                        "epoch estimate (8 matches the quality scenes)")
    args = p.parse_args()

    from keras_nerf_tpu.data.synthetic import random_ray_batch
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.models.engine import NeRFConfig

    cfg = NeRFConfig(white_background=True, compute_dtype="bfloat16")
    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    print(f"devices: {jax.devices()}")

    for n in args.n:
        h = args.img_wh // n
        rays = h * args.img_wh
        batch = random_ray_batch(1, h, args.img_wh, cfg.n_coarse,
                                 jax.random.PRNGKey(1))
        chunks = min(args.ray_chunks, rays) if args.ray_chunks else rays
        step = jax.jit(lambda s, b, k, _rc=chunks: engine.train_step(
            s, b, k, optimizer=opt, config=cfg, ray_chunks=_rc))
        ev = jax.jit(lambda s, b, k, _rc=chunks: engine.eval_step(
            s, b, k, config=cfg, ray_chunks=_rc))
        key = jax.random.PRNGKey(2)
        out = None
        for _ in range(3):
            out = step(state, batch, key)
        float(out[1]["fine_loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(state, batch, key)
        float(out[1]["fine_loss"])
        ms = (time.perf_counter() - t0) / args.iters * 1e3

        em = None
        for _ in range(3):
            em = ev(state, batch, key)
        float(em["fine_loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            em = ev(state, batch, key)
        float(em["fine_loss"])
        ev_ms = (time.perf_counter() - t0) / args.iters * 1e3

        epoch_s = (args.steps_per_epoch * ms
                   + args.n_val * ev_ms) / 1e3
        print(f"band 1/{n}: [{1}x{h}x{args.img_wh}] = {rays:6d} rays  "
              f"chunks {chunks}  step {ms:7.2f} ms  eval {ev_ms:7.2f} ms  "
              f"({rays / ms * 1e3:,.0f} rays/s/device, "
              f"{n}-chip epoch ~ {args.steps_per_epoch}x{ms:.0f}ms + "
              f"{args.n_val}x{ev_ms:.0f}ms = {epoch_s:.1f} s)")


if __name__ == "__main__":
    main()
