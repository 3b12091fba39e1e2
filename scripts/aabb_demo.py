"""Measured `--occupancy_aabb` demo on a scene that NEEDS it (VERDICT r4
#7): quantify the default-box culling failure and its flag-level fix.

Scene: the scale-2 spheres fixture (`write_synthetic_scene(scale=2.0)`) —
the world is a uniform 2x of the committed easy scene (orbit radius 8,
near 4 / far 12), so the outer spheres reach |x|,|y| ~ 2.5, PAST the
default [-2, 2]^3 occupancy AABB. Rendering through a grid baked with the
default box culls everything outside it to background (`inference.py
--occupancy_aabb` help); baking with a box that covers the scene restores
occupancy-render quality to its normal gap vs exact.

Prints one JSON line with test-split fine PSNR for: exact render,
occupancy render @ default AABB, occupancy render @ --aabb. Run after
training a checkpoint on the scaled scene, e.g.:

  python -c "from keras_nerf_tpu.data.synthetic import \
      write_synthetic_scene as w; w('data/scaled2_64', image_wh=64, \
      n_train=50, n_val=8, n_test=8, supersample=4, scale=2.0)"
  python train_single.py --name scaled2 --data_dir data/scaled2_64 \
      --img_wh 64 --white_bg --near 4 --far 12 --num_epochs 40 \
      --ray_chunks 4096 --learning_rate 1e-3 --log_freq 10
  python scripts/aabb_demo.py --model_path logs/scaled2/model \
      --data_dir data/scaled2_64 --img_wh 64 --near 4 --far 12 \
      --white_bg --aabb -4 -4 -4 4 4 4
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def split_psnr(nerf, dataset, render):
    """Mean fine PSNR of ``render(rays) -> {'image'}`` over a split."""
    from keras_nerf_tpu.ops.metrics import psnr

    vals = []
    for images, rays in dataset:
        out = render(rays)
        vals.append(float(psnr(out["image"], images[..., :3]).mean()))
    return float(np.mean(vals))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--img_wh", type=int, default=64)
    p.add_argument("--near", type=float, default=4.0)
    p.add_argument("--far", type=float, default=12.0)
    p.add_argument("--white_bg", action="store_true")
    p.add_argument("--ray_chunks", type=int, default=4096)
    p.add_argument("--occ_grid", type=int, default=64)
    p.add_argument("--occ_samples", type=int, default=64)
    p.add_argument("--occ_dilate", type=int, default=1)
    p.add_argument("--aabb", type=float, nargs=6, required=True,
                   metavar=("X0", "Y0", "Z0", "X1", "Y1", "Z1"),
                   help="the CORRECT box for this scene (xyz min, xyz max)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from keras_nerf_tpu.data import DatasetLoader
    from keras_nerf_tpu.models import NeRF

    nerf = NeRF(model_path=args.model_path)
    loader = DatasetLoader(args.data_dir, args.white_bg)
    _, _, test_ds = loader.load_dataset(
        batch_size=1, image_width=args.img_wh, image_height=args.img_wh,
        near=args.near, far=args.far, n_sample=nerf.config.n_coarse,
        seed=args.seed)
    nerf.compile(loss="mse", batch_size=1, image_height=args.img_wh,
                 image_width=args.img_wh, ray_chunks=args.ray_chunks,
                 white_background=args.white_bg, is_training=False,
                 seed=args.seed)

    key = jax.random.PRNGKey(args.seed)
    exact = split_psnr(nerf, test_ds, lambda r: nerf.predict_and_render_images(
        r, key, with_weights=False, coarse_image=False)[1])

    occ_render = lambda r: nerf.render_occupancy(  # noqa: E731
        r, key, near=args.near, far=args.far, n_samples=args.occ_samples)

    nerf.bake_occupancy(args.occ_grid, dilate=args.occ_dilate)  # default box
    default_frac = float(np.mean(np.asarray(nerf.occ_grid)))
    occ_default = split_psnr(nerf, test_ds, occ_render)

    aabb = (tuple(args.aabb[:3]), tuple(args.aabb[3:]))
    nerf.bake_occupancy(args.occ_grid, dilate=args.occ_dilate, aabb=aabb)
    fixed_frac = float(np.mean(np.asarray(nerf.occ_grid)))
    occ_fixed = split_psnr(nerf, test_ds, occ_render)

    print(json.dumps({
        "exact_psnr": round(exact, 2),
        "occ_default_aabb_psnr": round(occ_default, 2),
        "occ_correct_aabb_psnr": round(occ_fixed, 2),
        "default_grid_occupied_frac": round(default_frac, 4),
        "correct_grid_occupied_frac": round(fixed_frac, 4),
        "aabb": args.aabb,
    }))


if __name__ == "__main__":
    main()
