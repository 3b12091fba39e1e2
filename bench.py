"""Benchmark: coarse+fine training throughput in rays/sec/chip.

Headline workload = the reference's benchmark config (`train_single.py:16-17`
in /root/reference: 128x128 image, batch 1, coarse 64 + fine 128 samples,
full 8x256 MLPs — ~3 s/step on a V100, i.e. ~5,461 rays/s). Same math here,
TPU-native: one jitted train step, bfloat16 MXU matmuls, whole-batch fused
pass (ray chunking is a memory knob; the reference clamps chunks to num_rays
when memory allows, `nerf.py:95-98`).

Prints ONE JSON line:
  {"metric": "train rays/sec/chip (coarse+fine)", "value": N,
   "unit": "rays/s", "vs_baseline": N}

vs_baseline is against the V100 figure (16384 rays / 3 s = 5461 rays/s).

Extra modes (not part of the driver contract):
  python bench.py --mode render --img_wh 256   # novel-view fps
  python bench.py --fp32                        # disable bf16 compute
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_SEC = 16384 / 3.0  # V100, reference train_single.py:17
BASELINE_RENDER_FPS = 20.0           # north-star render target

# Padded-FLOP model (docs/DESIGN.md "Workload shape" + render roofline):
# per-point forward FLOPs are DERIVED from the config's packed kernel
# shapes (kernels/ray_march.py:padded_fwd_flop_per_point — 1.376 MFLOP at
# the reference 8x256 MLPs, x3 for fwd+dX+dW in training; 1.114 MFLOP for
# the sigma-only coarse render pass), so changing --num_layers etc. cannot
# silently skew the printed mfu. v5e bf16 nameplate = 197 TFLOPS.
V5E_BF16_PEAK_FLOPS = 197e12


def _mfu(flops_per_sec, args, config):
    """Model FLOP utilization vs the v5e bf16 nameplate — only meaningful
    when the fused Pallas kernels (whose padded shapes the FLOP model
    describes) actually run on a TPU backend; returns None otherwise so
    perf regressions show as a ratio that doesn't drift with config."""
    from keras_nerf_tpu.models.engine import resolve_use_pallas
    if (args.fp32 or getattr(args, "xla", False)
            or jax.devices()[0].platform == "cpu"
            or not resolve_use_pallas(config)):
        # --xla runs a different (unpadded) FLOP mix than the Pallas-kernel
        # FLOP model; unsupported shapes fall back to that XLA path too.
        return None
    return round(flops_per_sec / V5E_BF16_PEAK_FLOPS, 3)


def make_batch(b, h, w, n_coarse, key):
    from keras_nerf_tpu.data.synthetic import random_ray_batch
    return random_ray_batch(b, h, w, n_coarse, key)


def bench_train(args):
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.models.engine import NeRFConfig

    config = NeRFConfig(
        n_coarse=args.num_coarse_samples, n_fine=args.num_fine_samples,
        white_background=True,
        compute_dtype="float32" if args.fp32 else "bfloat16",
        use_pallas=False if (args.xla or args.fp32) else None)
    optimizer = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), config, optimizer)
    batch = make_batch(args.batch_size, args.img_wh, args.img_wh,
                       config.n_coarse, jax.random.PRNGKey(1))
    num_rays = args.batch_size * args.img_wh * args.img_wh
    ray_chunks = min(args.ray_chunks or num_rays, num_rays)

    step = jax.jit(
        lambda s, b, k: engine.train_step(
            s, b, k, optimizer=optimizer, config=config,
            ray_chunks=ray_chunks),
        donate_argnums=(0,))

    key = jax.random.PRNGKey(2)
    for i in range(args.warmup):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    # NOTE: a host scalar fetch is the sync point — block_until_ready does
    # not reliably block on the remote-TPU (axon) backend.
    float(metrics["fine_loss"])

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step(state, batch, jax.random.fold_in(key, 100 + i))
    float(metrics["fine_loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = num_rays * args.iters / dt
    result = {
        "metric": "train rays/sec/chip (coarse+fine)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 2),
    }
    # Points/ray = coarse pass (Nc) + fine pass (Nc+Nf merged), x3 fwd+bwd.
    from keras_nerf_tpu.kernels.ray_march import padded_fwd_flop_per_point
    points_per_ray = config.n_coarse + (config.n_coarse + config.n_fine)
    flop_per_point = padded_fwd_flop_per_point(config.mlp)
    mfu = _mfu(rays_per_sec * points_per_ray * flop_per_point * 3,
               args, config)
    if mfu is not None:
        result["mfu"] = mfu
    return result


def bench_render(args):
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.models.engine import NeRFConfig

    config = NeRFConfig(
        n_coarse=args.num_coarse_samples, n_fine=args.num_fine_samples,
        white_background=True,
        compute_dtype="float32" if args.fp32 else "bfloat16",
        use_pallas=False if (args.xla or args.fp32) else None,
        fast_render=args.fast_render)
    coarse, fine = engine.init_params(jax.random.PRNGKey(0), config)
    _, rays = make_batch(1, args.img_wh, args.img_wh, config.n_coarse,
                         jax.random.PRNGKey(1))
    num_rays = args.img_wh * args.img_wh
    ray_chunks = min(args.ray_chunks or num_rays, num_rays)

    if args.occupancy_grid > 0:
        # Occupancy-accelerated path (random weights bake to a mostly-empty
        # grid; bench with real checkpoints via inference.py for quality).
        from keras_nerf_tpu.ops import occupancy as occ_mod
        density = occ_mod.model_density_fn(fine, config)
        grid = occ_mod.bake_occupancy_grid(density, args.occupancy_grid)
        render = jax.jit(
            lambda pc, pf, r, k: occ_mod.render_image_batch_occ(
                pf, r, grid, k, config, n_samples=args.occupancy_samples,
                ray_chunks=ray_chunks)["image"])
    else:
        # The novel-view path the inference CLI uses: fine image + depth
        # only — the coarse pass runs sigma-only (its image is discarded).
        packed_q = None
        if args.quantized_render:
            # Opt-in int8 tier: one-time calibration outside the loop
            # (mirrors the inference CLI's lazy first-frame calibration).
            packed_q = jax.jit(lambda pc, pf, r, k:
                               engine.quantize_render_params(
                                   pc, pf, r, k, config))(
                coarse, fine, rays, jax.random.PRNGKey(3))
        render = jax.jit(
            lambda pc, pf, r, k: engine.render_image_batch(
                pc, pf, r, k, config, ray_chunks,
                with_weights=False, coarse_image=False,
                packed_q=packed_q)[1]["image"])

    key = jax.random.PRNGKey(2)
    for i in range(args.warmup):
        out = render(coarse, fine, rays, jax.random.fold_in(key, i))
    float(out[0, 0, 0, 0])

    t0 = time.perf_counter()
    for i in range(args.iters):
        out = render(coarse, fine, rays, jax.random.fold_in(key, 100 + i))
    float(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0

    fps = args.iters / dt
    result = {
        "metric": f"render {args.img_wh}x{args.img_wh} frames/sec/chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_RENDER_FPS, 2),
    }
    if not (args.fast_render or args.occupancy_grid
            or args.quantized_render):
        # Exact render: sigma-only coarse (Nc points) + merged fine pass.
        from keras_nerf_tpu.kernels.ray_march import padded_fwd_flop_per_point
        flop_per_ray = (
            config.n_coarse * padded_fwd_flop_per_point(config.mlp,
                                                        sigma_only=True)
            + (config.n_coarse + config.n_fine)
            * padded_fwd_flop_per_point(config.mlp))
        mfu = _mfu(fps * num_rays * flop_per_ray, args, config)
        if mfu is not None:
            result["mfu"] = mfu
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["train", "render"],
                        default="train")
    parser.add_argument("--img_wh", type=int, default=128)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--num_coarse_samples", type=int, default=64)
    parser.add_argument("--num_fine_samples", type=int, default=128)
    parser.add_argument("--ray_chunks", type=int, default=4096,
                        help="per-pass ray chunk (0 = whole batch in one "
                             "fused pass; needs ~32 GB HBM at 128^2 train)")
    parser.add_argument("--fp32", action="store_true",
                        help="float32 matmuls on the XLA path (the fused "
                             "kernels are bf16-operand/f32-accumulate by "
                             "design, so fp32 implies --xla)")
    parser.add_argument("--fast_render", type=int, default=0,
                        help="render mode only: opt-in importance-only fine "
                             "pass with this many samples (0 = exact)")
    parser.add_argument("--quantized_render", action="store_true",
                        help="render mode only: opt-in int8 (W8A8) MLP "
                             "tier with static calibrated scales")
    parser.add_argument("--occupancy_grid", type=int, default=0,
                        help="render mode only: opt-in G^3 occupancy-grid "
                             "empty-space skipping (0 = off)")
    parser.add_argument("--occupancy_samples", type=int, default=64)
    parser.add_argument("--xla", action="store_true",
                        help="force the pure-XLA path (default: fused "
                             "Pallas kernels on TPU backends)")
    parser.add_argument("--warmup", type=int, default=3,
                        help="warmup steps (min 1: the warmup result is the "
                             "pre-timing sync point)")
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()
    args.warmup = max(1, args.warmup)
    if getattr(args, "quantized_render", False) and (
            args.xla or args.fp32 or args.occupancy_grid):
        parser.error("--quantized_render requires the fused TPU render "
                     "path (incompatible with --xla/--fp32/"
                     "--occupancy_grid)")

    result = bench_train(args) if args.mode == "train" else bench_render(args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
