"""Measure the FULL render speed/quality frontier on one checkpoint.

Every opt-in render tier, same trained model, same held-out images:

  * f32 exact          (`inference.py` default math)
  * int8 exact-sampling (`--quantized_render`)
  * f32 / int8 `--fast_render {96,64}` (importance-only fine pass)
  * occupancy grid K={64,32} (`--occupancy_grid`, fine model only)

For each tier: test-split fine PSNR (8 held-out 128^2 images, exact eval
math per tier) and 256^2 render fps. fps for the standard tiers runs
through ``bench.bench_render`` — the canonical basis (8192-ray chunks,
and one stable HLO per config: XLA-TPU compile plans for the same math
re-drawn under a different jit wrapper vary up to ~45%, see the verify
skill's measurement-pitfalls list). Occupancy fps is measured in-script
on the baked grid (its compute is occupancy-independent: K fixed MLP
evaluations per ray). Writes:

  * a table to stdout (commit the log to assets/)
  * assets/render_frontier.json — machine-readable record
  * assets/render_frontier.png  — fps-vs-PSNR frontier scatter

Run on the TPU:

  python scripts/render_frontier.py \
      --model model/quality128 --data data/synthetic_128
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from keras_nerf_tpu.data.loader import DatasetLoader
from keras_nerf_tpu.data.synthetic import random_ray_batch
from keras_nerf_tpu.models import engine
from keras_nerf_tpu.ops import occupancy as occ_mod
from keras_nerf_tpu.ops.metrics import psnr
from keras_nerf_tpu.utils import checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model",
                    default=os.path.join(_REPO, "model", "quality128"))
    ap.add_argument("--data",
                    default=os.path.join(_REPO, "data", "synthetic_128"))
    ap.add_argument("--img_wh", type=int, default=128)
    ap.add_argument("--ray_chunks", type=int, default=16384)
    ap.add_argument("--bench_wh", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--occ_grid", type=int, default=128)
    ap.add_argument("--occ_dilate", type=int, default=1,
                    help="occupancy-grid dilation iterations (matches "
                         "inference.py --occupancy_dilate); >1 widens the "
                         "occupied shell for thin-geometry scenes")
    ap.add_argument("--tiers", default="",
                    help="substring filter: measure only tiers whose name "
                         "contains this (e.g. 'occ'); default all")
    # Anchored to the repo: background shells start OUTSIDE it (CLAUDE.md),
    # and a cwd-relative default would crash only AFTER the full sweep.
    ap.add_argument("--out_json",
                    default=os.path.join(_REPO, "assets",
                                         "render_frontier.json"))
    ap.add_argument("--out_png",
                    default=os.path.join(_REPO, "assets",
                                         "render_frontier.png"))
    args = ap.parse_args()
    if args.tiers or args.occ_dilate != 1:
        # A filtered/non-default sweep must not clobber the canonical
        # full-frontier record at the default paths.
        suffix = f"_{args.tiers or 'all'}_d{args.occ_dilate}"
        for attr in ("out_json", "out_png"):
            path = getattr(args, attr)
            if path == ap.get_default(attr):
                stem, ext = os.path.splitext(path)
                setattr(args, attr, stem + suffix + ext)
    for p in (args.out_json, args.out_png):
        os.makedirs(os.path.dirname(os.path.abspath(p)), exist_ok=True)

    base = checkpoint.load_model_config(args.model, white_background=True)
    pc, pf = engine.init_params(jax.random.PRNGKey(0), base)
    pc, pf = checkpoint.load_weights(args.model, pc, pf)

    loader = DatasetLoader(args.data, white_background=True)
    _, _, test = loader.load_dataset(
        batch_size=1, image_width=args.img_wh, image_height=args.img_wh,
        near=2.0, far=6.0, n_sample=base.n_coarse)
    key = jax.random.PRNGKey(17)

    # --- standard tiers (render_image_batch) -------------------------------
    def eval_psnr(config, packed_q):
        render = jax.jit(lambda a, b, r, k: engine.render_image_batch(
            a, b, r, k, config, args.ray_chunks, with_weights=False,
            coarse_image=False, packed_q=packed_q)[1]["image"])
        vals = []
        for images, rays in iter(test):
            img = render(pc, pf, rays, key)
            vals.append(float(psnr(img, images[..., :3])[0]))
        return float(np.mean(vals))

    def bench_fps(render_one):
        """render_one(rays, key) -> image; timed on synthetic 256^2 rays."""
        _, rays = random_ray_batch(1, args.bench_wh, args.bench_wh,
                                   base.n_coarse, jax.random.PRNGKey(1))
        out = render_one(rays, key)
        float(out[0, 0, 0, 0])            # axon sync = host scalar fetch
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = render_one(rays, jax.random.fold_in(key, i))
        float(out[0, 0, 0, 0])
        return args.iters / (time.perf_counter() - t0)

    def std_fps(fast, quantized):
        import bench as bench_mod
        ns = argparse.Namespace(
            num_coarse_samples=base.n_coarse,
            num_fine_samples=base.n_fine, img_wh=args.bench_wh,
            ray_chunks=min(8192, args.bench_wh * args.bench_wh),
            fp32=False, xla=False, fast_render=fast, occupancy_grid=0,
            occupancy_samples=64, quantized_render=quantized,
            warmup=3, iters=args.iters)
        return float(bench_mod.bench_render(ns)["value"])

    # --- occupancy tier (baked lazily: --tiers filters that exclude every
    # occ tier must not pay the dense density sweep on the TPU) ------------
    _setup_cache = {}

    def get_occ_grid():
        if "occ_grid" not in _setup_cache:
            density = occ_mod.model_density_fn(pf, base)
            grid = occ_mod.bake_occupancy_grid(
                density, args.occ_grid, occ_mod.DEFAULT_AABB,
                sigma_threshold=1.0, dilate=args.occ_dilate)
            _setup_cache["occ_frac"] = 100.0 * float(jnp.mean(grid))
            print(f"occupancy grid {args.occ_grid}^3 "
                  f"(dilate={args.occ_dilate}): "
                  f"{_setup_cache['occ_frac']:.1f}% occupied")
            _setup_cache["occ_grid"] = grid
        return _setup_cache["occ_grid"]

    def occ_psnr(k_samples, fine_q=None):
        occ_grid = get_occ_grid()
        render = jax.jit(lambda r, k: occ_mod.render_image_batch_occ(
            pf, r, occ_grid, k, base, n_samples=k_samples,
            ray_chunks=args.ray_chunks, packed_q=fine_q)["image"])
        vals = []
        for images, rays in iter(test):
            img = render(rays, key)
            vals.append(float(psnr(img, images[..., :3])[0]))
        return float(np.mean(vals))

    def occ_fps(k_samples, fine_q=None):
        occ_grid = get_occ_grid()
        ck = min(8192, args.bench_wh * args.bench_wh)
        render = jax.jit(lambda r, k: occ_mod.render_image_batch_occ(
            pf, r, occ_grid, k, base, n_samples=k_samples,
            ray_chunks=ck, packed_q=fine_q)["image"])
        return bench_fps(render)

    # one calibration shared by all int8 tiers (exact coarse+merged fine
    # distributions; fast_render does not change them) — also lazy, for
    # --tiers filters that exclude every int8 tier.
    def get_pq():
        if "pq" not in _setup_cache:
            _, rays0 = next(iter(test))
            _setup_cache["pq"] = jax.jit(
                lambda a, b, r, k: engine.quantize_render_params(
                    a, b, r, k, base))(pc, pf, rays0, key)
        return _setup_cache["pq"]

    def cfg(fast):
        return dataclasses.replace(base, fast_render=fast)

    # (name, family, measure_psnr, measure_fps)
    tiers = [
        ("f32 exact", "f32",
         lambda: eval_psnr(cfg(0), None), lambda: std_fps(0, False)),
        ("int8 exact-sampling", "int8",
         lambda: eval_psnr(cfg(0), get_pq()), lambda: std_fps(0, True)),
        ("f32 fast_render=96", "f32",
         lambda: eval_psnr(cfg(96), None), lambda: std_fps(96, False)),
        ("int8 fast_render=96", "int8",
         lambda: eval_psnr(cfg(96), get_pq()), lambda: std_fps(96, True)),
        ("f32 fast_render=64", "f32",
         lambda: eval_psnr(cfg(64), None), lambda: std_fps(64, False)),
        ("int8 fast_render=64", "int8",
         lambda: eval_psnr(cfg(64), get_pq()), lambda: std_fps(64, True)),
        ("occupancy K=64", "occupancy",
         lambda: occ_psnr(64), lambda: occ_fps(64)),
        ("occupancy K=32", "occupancy",
         lambda: occ_psnr(32), lambda: occ_fps(32)),
        ("int8 occ K=64", "int8+occ",
         lambda: occ_psnr(64, get_pq()[1]),
         lambda: occ_fps(64, get_pq()[1])),
        ("int8 occ K=32", "int8+occ",
         lambda: occ_psnr(32, get_pq()[1]),
         lambda: occ_fps(32, get_pq()[1])),
    ]

    if args.tiers:
        tiers = [t for t in tiers if args.tiers in t[0]]
        if not tiers:
            raise SystemExit(f"--tiers {args.tiers!r} matches no tier")

    rows = []
    print(f"{'tier':24s} {'test PSNR (dB)':>16s} "
          f"{'fps @' + str(args.bench_wh) + '^2':>12s}")
    # Delta column is always vs exact reference math, even when the filter
    # excludes the exact tier from the fps sweep.
    base_psnr = None
    if args.tiers and not any(n == "f32 exact" for n, *_ in tiers):
        base_psnr = eval_psnr(cfg(0), None)
        print(f"{'f32 exact (ref only)':24s} {base_psnr:11.3f} ({0.0:+.3f})")
    for name, family, f_psnr, f_fps in tiers:
        p = f_psnr()
        f = f_fps()
        if base_psnr is None:
            base_psnr = p
        print(f"{name:24s} {p:11.3f} ({p - base_psnr:+.3f}) {f:10.2f}")
        rows.append({"tier": name, "family": family, "psnr_db": round(p, 3),
                     "delta_db": round(p - base_psnr, 3),
                     "fps": round(f, 2)})

    record = {
        "model": args.model, "img_wh": args.img_wh,
        "bench_wh": args.bench_wh, "iters": args.iters,
        "occ_grid": args.occ_grid,
        # None when a --tiers filter skipped every occupancy tier (the
        # grid is baked lazily and the fraction only exists post-bake).
        "occ_occupied_pct": (round(_setup_cache["occ_frac"], 1)
                             if "occ_frac" in _setup_cache else None),
        "backend": jax.devices()[0].platform, "rows": rows,
    }
    with open(args.out_json, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"wrote {args.out_json}")

    plot_frontier(rows, args.out_png, args.bench_wh)


def plot_frontier(rows, out_png, bench_wh):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # Repo series convention (plot_compare.py): CVD-safe blue/orange,
    # okabe-ito green third. Identity also carried by marker shape +
    # direct labels — never color alone.
    families = [("f32", "#1f77b4", "o"), ("int8", "#ff7f0e", "s"),
                ("occupancy", "#009e73", "D"), ("int8+occ", "#cc79a7", "^")]

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    for fam, color, marker in families:
        pts = [r for r in rows if r["family"] == fam]
        ax.scatter([r["fps"] for r in pts], [r["psnr_db"] for r in pts],
                   s=55, color=color, marker=marker, label=fam, zorder=3)
        for r in pts:
            short = (r["tier"].replace(f"{fam} ", "")
                     .replace("fast_render=", "fast ")
                     .replace("occupancy ", ""))
            ax.annotate(short, (r["fps"], r["psnr_db"]),
                        textcoords="offset points", xytext=(6, 5),
                        fontsize=8, color="#444444")
    ax.axvline(20.0, color="#777777", lw=1, linestyle=":")
    ax.annotate("20 fps north star\n(budgeted for 8 chips)", (20.0, ax.get_ylim()[0]),
                textcoords="offset points", xytext=(5, 8),
                color="#777777", fontsize=8)
    ax.set_xlabel(f"render fps @{bench_wh}² (one v5e chip)")
    ax.set_ylabel("held-out test fine PSNR (dB)")
    ax.set_title("Render tiers: speed/quality frontier (one checkpoint)")
    ax.spines[["top", "right"]].set_visible(False)
    ax.grid(axis="both", alpha=0.25)
    ax.legend(frameon=False, loc="lower left", title=None)
    fig.tight_layout()
    fig.savefig(out_png)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main()
