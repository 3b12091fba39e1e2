"""lr-recipe probe: rank candidate lr recipes on a scene with SHORT
exact-math runs BEFORE committing a long one.

Round 4's hard-scene A/B (docs/QUALITY.md) showed the committed easy-scene
recipe (5e-4 -> 5e-6 decay) underfits thin geometry by 1.21 dB and inverts
the occupancy-tier rankings, and closed with manual guidance: "compare a
few exact-math epochs' val PSNR (and more than one lr recipe) before
committing a long run". This script IS that comparison.

Each arm trains the SAME model/seed/data-order for ``--epochs`` short
epochs with its recipe's decay schedule COMPRESSED into the probe budget
(``lr_decay_steps = epochs * steps_per_epoch``), so a decaying arm
traverses its whole anneal in miniature.

What the probe CAN and CANNOT rank (measured, assets/lr_probe_*.log vs
the full-length runs in docs/QUALITY.md):

- It ranks the BASE lr reliably: on both committed scenes the 1e-3 arms
  beat the 5e-4 arm in the probe exactly as they do at full length.
- It does NOT predict constant-vs-decay at a shared base: the compressed
  anneal strangles the lr while the scene is still underfit, so decay
  arms lose the probe even where the full-length decay run wins (spheres:
  probe constant-1e-3 24.5 vs decay-1e-3 19.8; full length inverts,
  33.18 vs 33.97). Schedule choice is a full-length property; see the
  "lr recipes are scene-dependent" section of docs/QUALITY.md.

Probe cost: arms x epochs x steps_per_epoch train steps, one val sweep
per arm per epoch-tail — defaults (3 arms x 10 epochs x 50 steps at 128²)
run in ~4 minutes on one v5e chip (measured 73 s/arm warm; plus one-time
compiles on a cold jit cache).

Usage:
  python scripts/lr_probe.py --data_dir data/synthetic_128 --img_wh 128 \
      --white_bg                      # the committed-scene defaults
  python scripts/lr_probe.py ... --recipes 5e-4:5e-6 1e-3:0 1e-3:1e-5

Recipe syntax: ``lr:lr_final`` (lr_final 0 = constant lr).
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def parse_recipe(text: str):
    lr, _, final = text.partition(":")
    return float(lr), float(final or 0.0)


def recipe_label(lr: float, lr_final: float) -> str:
    return f"{lr:g} -> {lr_final:g}" if lr_final > 0 else f"constant {lr:g}"


def run_arm(lr, lr_final, datasets, args, config):
    """Train one probe arm from the shared init; return per-epoch val PSNR."""
    from keras_nerf_tpu.models import engine

    train_ds, val_ds = datasets
    steps = args.steps_per_epoch or len(train_ds)
    if lr_final > 0.0:
        schedule = engine.exponential_lr(lr, lr_final,
                                         args.epochs * steps)
    else:
        schedule = lr
    optimizer = engine.make_optimizer(args.optimizer, schedule)
    state = engine.init_train_state(jax.random.PRNGKey(args.seed), config,
                                    optimizer)

    num_rays = args.img_wh * args.img_wh
    chunks = min(args.ray_chunks or num_rays, num_rays)
    step = jax.jit(lambda s, b, k: engine.train_step(
        s, b, k, optimizer=optimizer, config=config, ray_chunks=chunks))
    ev = jax.jit(lambda s, b, k: engine.eval_step(
        s, b, k, config=config, ray_chunks=chunks))

    # Identical data order across arms: same root seed, epoch counter reset.
    train_ds._epoch = 0
    key = jax.random.PRNGKey(args.seed + 1)
    # Train folds use [0, epochs*steps); eval folds start past that range
    # (fold_in data must be non-negative: uint32).
    eval_base = args.epochs * steps
    curve = []
    for epoch in range(args.epochs):
        metrics = None
        for i, batch in enumerate(train_ds):
            if i >= steps:
                break
            state, metrics = step(
                state, batch, jax.random.fold_in(key, epoch * steps + i))
        float(metrics["fine_loss"])  # host sync (axon: block_until_ready no-op)
        psnrs = [float(ev(state, b, jax.random.fold_in(key, eval_base + epoch))
                       ["fine_psnr"]) for b in val_ds]
        curve.append(float(np.mean(psnrs)))
    return curve


def main():
    p = argparse.ArgumentParser(
        description="rank lr recipes with short exact-math probe runs")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--img_wh", type=int, default=128)
    p.add_argument("--white_bg", action="store_true")
    p.add_argument("--near", type=float, default=2.0)
    p.add_argument("--far", type=float, default=6.0)
    p.add_argument("--num_coarse_samples", type=int, default=64)
    p.add_argument("--num_fine_samples", type=int, default=128)
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--num_units", type=int, default=256)
    p.add_argument("--skip_layer", type=int, default=4)
    p.add_argument("--optimizer", type=str, default="adam")
    p.add_argument("--ray_chunks", type=int, default=16384)
    p.add_argument("--epochs", type=int, default=10,
                   help="probe epochs per arm (each arm's decay schedule "
                        "is compressed to exactly this budget)")
    p.add_argument("--steps_per_epoch", type=int, default=50,
                   help="train batches per probe epoch (0 = the full "
                        "split; 50 halves probe cost at 100-image scenes)")
    p.add_argument("--recipes", nargs="*",
                   default=["5e-4:5e-6", "1e-3:0", "1e-3:1e-5"],
                   help="lr:lr_final per arm (lr_final 0 = constant). "
                        "Defaults: the committed decay recipe, the Keras-"
                        "default constant, a higher-lr decay")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from keras_nerf_tpu.data.loader import DatasetLoader
    from keras_nerf_tpu.models.engine import NeRFConfig

    config = NeRFConfig(
        n_coarse=args.num_coarse_samples, n_fine=args.num_fine_samples,
        n_layers=args.num_layers, dense_units=args.num_units,
        skip_layer=args.skip_layer,
        white_background=args.white_bg, compute_dtype="bfloat16")
    loader = DatasetLoader(args.data_dir, args.white_bg)
    train_ds, val_ds, _ = loader.load_dataset(
        batch_size=1, image_width=args.img_wh, image_height=args.img_wh,
        near=args.near, far=args.far, n_sample=args.num_coarse_samples,
        seed=args.seed)
    val_batches = list(val_ds)
    print(f"devices: {jax.devices()}  scene: {args.data_dir}  "
          f"{args.img_wh}^2, {len(train_ds)} train / {len(val_batches)} "
          f"val images")

    results = []
    for text in args.recipes:
        lr, lr_final = parse_recipe(text)
        label = recipe_label(lr, lr_final)
        t0 = time.perf_counter()
        curve = run_arm(lr, lr_final, (train_ds, val_batches), args, config)
        dt = time.perf_counter() - t0
        results.append((label, curve, dt, lr))
        print(f"arm [{label}]: " + " ".join(f"{v:.2f}" for v in curve)
              + f"  ({dt:.0f} s)")

    results.sort(key=lambda r: r[1][-1], reverse=True)
    print(f"\n=== probe ranking (final val PSNR after {args.epochs} "
          f"compressed epochs x {args.steps_per_epoch or len(train_ds)} "
          f"steps) ===")
    for rank, (label, curve, _, _) in enumerate(results, 1):
        tail = curve[-1] - curve[-2] if len(curve) > 1 else 0.0
        print(f"{rank}. {label:>18}  val {curve[-1]:6.2f} dB  "
              f"(last-epoch slope {tail:+.2f})")
    best_label, _, _, best_lr = results[0]
    print(f"\nrecommendation: base lr {best_lr:g} (probe winner: "
          f"[{best_label}]). The probe ranks the BASE lr; it cannot see "
          f"the full-length benefit of a decay schedule (the compressed "
          f"anneal bites while the scene is still underfit — see the "
          f"module docstring). For the long run, compare constant "
          f"{best_lr:g} against a decay FROM {best_lr:g}; on the "
          f"committed scenes the measured winners at full length are in "
          f"docs/QUALITY.md ('lr recipes are scene-dependent').")


if __name__ == "__main__":
    main()
