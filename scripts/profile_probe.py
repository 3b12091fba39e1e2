"""Micro-benchmark alternative formulations of the occupancy probe gather.

The probe (`ops/occupancy.py: occupancy_along_rays`) measured 4.23 ms per
4096x64 chunk — ~17 ms/step, the dominant non-kernel cost of the
occupancy-train tier (scripts/profile_occtrain.py). Candidates:

  3d     — current: occ_grid[i0, i1, i2] (XLA 3-operand gather)
  flat   — single flat int32 index into grid.reshape(-1)
  flat8  — flat index into an int8 grid (1/4 the gathered bytes)
  packbits — grid bit-packed along z into [G, G, 4] int32 columns:
             ONE gather per probe point of the int32 word + VPU bit test
             (same gather count, 1/8 the table bytes -> better locality)

Usage: python scripts/profile_probe.py [--rays 4096] [--n_probe 64]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=50, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=4096)
    p.add_argument("--n_probe", type=int, default=64)
    p.add_argument("--grid", type=int, default=128)
    args = p.parse_args()

    from keras_nerf_tpu.ops import occupancy as occ_mod

    g = args.grid
    key = jax.random.PRNGKey(0)
    coords = occ_mod.grid_coordinates(g)
    grid = (jnp.linalg.norm(coords, axis=-1) < 1.0).astype(jnp.float32)
    grid = occ_mod.dilate_occupancy(grid, 1)

    o = jnp.zeros((args.rays, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(key, (args.rays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near, far = 2.0, 6.0
    lo = jnp.asarray(occ_mod.DEFAULT_AABB[0], jnp.float32)
    hi = jnp.asarray(occ_mod.DEFAULT_AABB[1], jnp.float32)

    def points():
        edges = jnp.linspace(near, far, args.n_probe + 1, dtype=jnp.float32)
        mids = 0.5 * (edges[1:] + edges[:-1])
        pts = o[:, None, :] + d[:, None, :] * mids[None, :, None]
        rel = (pts - lo) / (hi - lo)
        idx = jnp.floor(rel * g).astype(jnp.int32)
        inside = jnp.all((idx >= 0) & (idx < g), axis=-1)
        return jnp.clip(idx, 0, g - 1), inside

    def probe_3d(grid_):
        idx, inside = points()
        occ = grid_[idx[..., 0], idx[..., 1], idx[..., 2]]
        return jnp.where(inside, occ, 0.0)

    flat_f32 = grid.reshape(-1)
    flat_i8 = grid.astype(jnp.int8).reshape(-1)

    def probe_flat(table):
        idx, inside = points()
        fi = (idx[..., 0] * g + idx[..., 1]) * g + idx[..., 2]
        occ = jnp.take(table, fi).astype(jnp.float32)
        return jnp.where(inside, occ, 0.0)

    # Bit-packed along z: word w = z // 32, bit = z % 32.
    bits = (grid.astype(jnp.int32).reshape(g, g, g // 32, 32)
            * (1 << jnp.arange(32, dtype=jnp.int32))).sum(-1)
    packed = bits.reshape(-1)  # [(G*G*G/32)]

    def probe_packed(table):
        idx, inside = points()
        word = (idx[..., 0] * g + idx[..., 1]) * (g // 32) \
            + idx[..., 2] // 32
        w = jnp.take(table, word)
        bit = idx[..., 2] % 32
        occ = ((w >> bit) & 1).astype(jnp.float32)
        return jnp.where(inside, occ, 0.0)

    n = args.rays * args.n_probe
    for name, fn, arg in [
        ("3d f32", probe_3d, grid),
        ("flat f32", probe_flat, flat_f32),
        ("flat int8", probe_flat, flat_i8),
        ("packbits int32", probe_packed, packed),
    ]:
        f = jax.jit(fn)
        ms = timeit(f, arg)
        ref = probe_3d(grid)
        got = f(arg)
        ok = bool(jnp.all(ref == got))
        print(f"{name:16s}: {ms:7.2f} ms  ({n / ms * 1e-3:,.0f} Kpts/ms)"
              f"  match={ok}")


if __name__ == "__main__":
    main()
