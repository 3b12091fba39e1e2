"""Measure the int8 quantized render tier on a trained checkpoint.

One command, run on the TPU:

  python scripts/quantized_render_eval.py \
      --model model/quality128 --data data/synthetic_128 --img_wh 128

Reports, for f32 / int8 / int8+fast_render (and optionally
f32+fast_render for the quality-vs-speed frontier):
  * test-split fine PSNR (8 held-out images, exact eval math per tier)
  * 256^2 render fps (bench-style loop on synthetic rays)

The PSNR table is the tier's quality contract for docs/QUALITY.md; the
fps column is the speed side of the same table.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from keras_nerf_tpu.data.loader import DatasetLoader
from keras_nerf_tpu.data.synthetic import random_ray_batch
from keras_nerf_tpu.models import engine
from keras_nerf_tpu.ops.metrics import psnr
from keras_nerf_tpu.utils import checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="model/quality128")
    ap.add_argument("--data", default="data/synthetic_128")
    ap.add_argument("--img_wh", type=int, default=128)
    ap.add_argument("--ray_chunks", type=int, default=16384)
    ap.add_argument("--fast_render", type=int, default=96)
    ap.add_argument("--bench_wh", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import dataclasses
    base = checkpoint.load_model_config(args.model, white_background=True)
    pc, pf = engine.init_params(jax.random.PRNGKey(0), base)
    pc, pf = checkpoint.load_weights(args.model, pc, pf)

    loader = DatasetLoader(args.data, white_background=True)
    _, _, test = loader.load_dataset(
        batch_size=1, image_width=args.img_wh, image_height=args.img_wh,
        near=2.0, far=6.0, n_sample=base.n_coarse)
    key = jax.random.PRNGKey(17)

    def tier_cfg(fast):
        return dataclasses.replace(base, fast_render=fast)

    def eval_psnr(config, packed_q):
        render = jax.jit(lambda a, b, r, k: engine.render_image_batch(
            a, b, r, k, config, args.ray_chunks, with_weights=False,
            coarse_image=False, packed_q=packed_q)[1]["image"])
        vals = []
        for images, rays in iter(test):
            img = render(pc, pf, rays, key)
            vals.append(float(psnr(img, images[..., :3])[0]))
        return float(np.mean(vals))

    def bench_fps(config, packed_q):
        _, rays = random_ray_batch(1, args.bench_wh, args.bench_wh,
                                   config.n_coarse, jax.random.PRNGKey(1))
        # Canonical bench basis (bench.py): 8192-ray chunks. The 16384
        # f32 render graph has frozen a slow XLA compile plan in the
        # persistent cache on this box (plans vary run-to-run; see the
        # verify skill) — measured 3.0-6.8 fps for the same HLO.
        ck = min(8192, args.bench_wh * args.bench_wh)
        render = jax.jit(lambda a, b, r, k: engine.render_image_batch(
            a, b, r, k, config, ck, with_weights=False,
            coarse_image=False, packed_q=packed_q)[1]["image"])
        out = render(pc, pf, rays, key)
        float(out[0, 0, 0, 0])            # axon sync = host scalar fetch
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = render(pc, pf, rays, jax.random.fold_in(key, i))
        float(out[0, 0, 0, 0])
        return args.iters / (time.perf_counter() - t0)

    # one calibration, shared by all quantized tiers (fast_render does
    # not change the calibration distributions: exact coarse+merged fine)
    images0, rays0 = next(iter(test))
    pq = jax.jit(lambda a, b, r, k: engine.quantize_render_params(
        a, b, r, k, base))(pc, pf, rays0, key)

    rows = [
        ("f32 exact", tier_cfg(0), None),
        ("int8 exact-sampling", tier_cfg(0), pq),
        (f"f32 fast_render={args.fast_render}",
         tier_cfg(args.fast_render), None),
        (f"int8 fast_render={args.fast_render}",
         tier_cfg(args.fast_render), pq),
    ]
    print(f"{'tier':28s} {'test PSNR (dB)':>14s} "
          f"{'fps @' + str(args.bench_wh) + '^2':>12s}")
    base_psnr = None
    for name, cfg, q in rows:
        p = eval_psnr(cfg, q)
        f = bench_fps(cfg, q)
        if base_psnr is None:
            base_psnr = p
        print(f"{name:28s} {p:10.3f} ({p - base_psnr:+.3f}) {f:10.2f}")


if __name__ == "__main__":
    main()
