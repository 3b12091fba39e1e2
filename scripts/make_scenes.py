"""Regenerate the committed benchmark scenes with their exact parameters.

`data/` is gitignored and wiped between sessions, but every committed
measurement (QUALITY.md tables, probe logs, frontier sweeps) is tied to
these three deterministic fixtures. This script is the single source of
truth for their generation parameters — run it after a fresh checkout
before reproducing any committed number:

  python scripts/make_scenes.py            # all three scenes
  python scripts/make_scenes.py spheres    # just data/synthetic_128

Generation is deterministic (fixed seed, pure-NumPy ray tracer), so the
regenerated scenes are bit-identical to the ones behind the committed
runs — verified by the round-5 retrain reproducing the 33.9745 dB test
PSNR bit-for-bit after a full wipe (`assets/quality128_r5best_run.log`).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keras_nerf_tpu.data.synthetic import write_synthetic_scene  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (out_dir, kwargs). These parameters are LOAD-BEARING: changing
# any of them silently invalidates every committed PSNR in docs/QUALITY.md.
SCENES = {
    # The easy Lambertian-spheres quality scene (all 128^2 headline runs).
    "spheres": ("data/synthetic_128", dict(
        image_wh=128, n_train=100, n_val=8, n_test=8, supersample=4)),
    # The adversarial thin-geometry scene (hard-scene A/Bs + frontier).
    "hard": ("data/hard_128", dict(
        image_wh=128, n_train=100, n_val=8, n_test=8, supersample=4,
        scene="hard")),
    # The 2x-scale spheres scene (the --occupancy_aabb demo; train with
    # --near 4 --far 12, bake with --occupancy_aabb -4 -4 -4 4 4 4).
    "scaled2": ("data/scaled2_64", dict(
        image_wh=64, n_train=50, n_val=8, n_test=8, supersample=4,
        scale=2.0)),
}


def main():
    wanted = sys.argv[1:] or list(SCENES)
    unknown = [w for w in wanted if w not in SCENES]
    if unknown:
        raise SystemExit(f"unknown scene(s) {unknown}; "
                         f"choose from {sorted(SCENES)}")
    for name in wanted:
        rel, kwargs = SCENES[name]
        out = os.path.join(_REPO, rel)
        if os.path.exists(os.path.join(out, "transforms_train.json")):
            print(f"{name}: {rel} already exists, skipping")
            continue
        write_synthetic_scene(out, **kwargs)
        print(f"{name}: wrote {rel} {kwargs}")


if __name__ == "__main__":
    main()
