"""Attribute the occupancy-train step's time on the real TPU.

The opt-in `--occupancy_train` tier measured 200k rays/s (no-merge, K=64)
vs an FLOP-ideal ~2x of the exact step's 141.7k — ~40% of the theoretical
gain lost somewhere in the XLA-side probe + inverse-CDF chain
(ROADMAP.md). This script isolates: the full step (merge / no-merge), the
probe gather, the sampler, and a kernel-only variant fed precomputed fine
depths — so the fusion work targets the measured cost, not the suspected
one.

Usage: python scripts/profile_occtrain.py [--img_wh 128] [--chunks 4096]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=2, sync=None):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    (sync or default_sync)(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    (sync or default_sync)(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def default_sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf) if hasattr(leaf, "sum") else leaf)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_wh", type=int, default=128)
    p.add_argument("--chunks", type=int, default=4096)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--occ_n", type=int, default=64)
    p.add_argument("--n_probe", type=int, default=64)
    p.add_argument("--grid", type=int, default=128)
    args = p.parse_args()

    from keras_nerf_tpu.data.synthetic import random_ray_batch
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.models.engine import NeRFConfig
    from keras_nerf_tpu.ops import occupancy as occ_mod
    from keras_nerf_tpu.ops.sampling import merge_sorted

    cfg = NeRFConfig(white_background=True, compute_dtype="bfloat16")
    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    batch = random_ray_batch(1, args.img_wh, args.img_wh, cfg.n_coarse,
                             jax.random.PRNGKey(1))
    num_rays = args.img_wh * args.img_wh
    key = jax.random.PRNGKey(2)
    rc = args.chunks

    # A plausible occupancy grid: sphere of radius 1 at the origin,
    # ~matching the synthetic scene's occupied fraction after dilation.
    coords = occ_mod.grid_coordinates(args.grid)
    occ_grid = (jnp.linalg.norm(coords, axis=-1) < 1.0).astype(jnp.float32)
    occ_grid = occ_mod.dilate_occupancy(occ_grid, 1)
    frac = float(occ_grid.mean())
    print(f"devices: {jax.devices()}  grid {args.grid}^3 occ {frac:.3f}")

    occ_base = (args.occ_n, args.n_probe, 2.0, 6.0, occ_mod.DEFAULT_AABB)

    # --- full occupancy-train steps --------------------------------------
    for merge in (False, True):
        occ = occ_base + (merge,)
        step = jax.jit(lambda s, b, k, g, _o=occ: engine.train_step(
            s, b, k, occ_grid=g, optimizer=opt, config=cfg,
            ray_chunks=rc, occupancy=_o))
        ms = timeit(step, state, batch, key, occ_grid, iters=args.iters,
                    sync=lambda o: float(o[1]["fine_loss"]))
        print(f"occ step merge={int(merge)}:        {ms:8.1f} ms "
              f"({num_rays / ms * 1e3:,.0f} rays/s)")

    # --- cached-rows steps (--occupancy_train_cache): the per-step probe
    # replaced by precomputed per-image rows ------------------------------
    images_, rays_ = batch
    o_all, d_all, _ = engine._flatten_rays(rays_, num_rays, cfg.n_coarse)
    _, rows_all = occ_mod.occupancy_along_rays(
        o_all, d_all, occ_grid, 2.0, 6.0, args.n_probe)
    rows_all = rows_all.astype(jnp.uint8)
    for merge in (False, True):
        occ = occ_base + (merge,)
        step_rows = jax.jit(lambda s, b, k, r, _o=occ: engine.train_step(
            s, b, k, optimizer=opt, config=cfg, ray_chunks=rc,
            occupancy=_o, occ_rows=r))
        ms = timeit(step_rows, state, batch, key, rows_all,
                    iters=args.iters,
                    sync=lambda o: float(o[1]["fine_loss"]))
        print(f"occ step cached rows m={int(merge)}: {ms:6.1f} ms "
              f"({num_rays / ms * 1e3:,.0f} rays/s)")

    # --- exact step for reference ----------------------------------------
    step = jax.jit(lambda s, b, k: engine.train_step(
        s, b, k, optimizer=opt, config=cfg, ray_chunks=rc))
    ms = timeit(step, state, batch, key, iters=args.iters,
                sync=lambda o: float(o[1]["fine_loss"]))
    print(f"exact step:               {ms:8.1f} ms "
          f"({num_rays / ms * 1e3:,.0f} rays/s)")

    # --- the XLA chain in isolation (per chunk) ---------------------------
    o = jnp.zeros((rc, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(key, (rc, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(key, (rc, cfg.n_coarse),
                                    minval=2.0, maxval=6.0), axis=-1)

    probe = jax.jit(lambda oc, dc, g: occ_mod.occupancy_along_rays(
        oc, dc, g, 2.0, 6.0, args.n_probe))
    ms = timeit(probe, o, d, occ_grid, iters=args.iters)
    print(f"probe gather ({rc}x{args.n_probe}):   {ms:8.2f} ms/chunk")

    mids, occv = probe(o, d, occ_grid)
    samp = jax.jit(lambda k_, m_, w_: occ_mod.sample_occupied(
        k_, m_, w_, args.occ_n))
    ms = timeit(samp, key, mids, occv, iters=args.iters)
    print(f"sample_occupied ->{args.occ_n}:       {ms:8.2f} ms/chunk")

    pts = samp(key, mids, occv)
    mrg = jax.jit(merge_sorted)
    ms = timeit(mrg, t, pts, iters=args.iters)
    print(f"merge_sorted (64+{args.occ_n}):      {ms:8.2f} ms/chunk")

    chain = jax.jit(lambda oc, dc, tc, k_, g: merge_sorted(
        tc, occ_mod.sample_occupied(
            jax.random.fold_in(k_, 7),
            *occ_mod.occupancy_along_rays(oc, dc, g, 2.0, 6.0,
                                          args.n_probe),
            args.occ_n)))
    ms = timeit(chain, o, d, t, key, occ_grid, iters=args.iters)
    print(f"full chain (probe+samp+merge): {ms:8.2f} ms/chunk")

    # --- kernel-only step: fine depths precomputed OUTSIDE the timed jit --
    # (upper bound on what fusing the whole chain could recover)
    nchunks = num_rays // rc
    images, rays = batch
    tgt = images[..., :3].reshape(num_rays, 3)
    of, df, tf = engine._flatten_rays(rays, num_rays, cfg.n_coarse)
    keys = jax.random.split(key, nchunks)
    ocs = engine._chunked(of, nchunks)
    dcs = engine._chunked(df, nchunks)
    tcs = engine._chunked(tf, nchunks)
    tgts = engine._chunked(tgt, nchunks)
    for merge in (False, True):
        fps = []
        for i in range(nchunks):
            mids_i, occ_i = probe(ocs[i], dcs[i], occ_grid)
            p_i = samp(jax.random.fold_in(keys[i], 7), mids_i, occ_i)
            fps.append(merge_sorted(tcs[i], p_i) if merge else p_i)
        fps = jnp.stack(fps)

        def kernel_only(s, fps_, _m=merge):
            from keras_nerf_tpu.kernels import (pack_mlp_params,
                                                unpack_grads)
            packed_c = pack_mlp_params(s.coarse_params, cfg.mlp,
                                       cfg.pos_emb_xyz, cfg.pos_emb_dir)
            packed_f = pack_mlp_params(s.fine_params, cfg.mlp,
                                       cfg.pos_emb_xyz, cfg.pos_emb_dir)

            def body(acc, x):
                oc, dc, tc, tg, k, fp = x
                out_c, out_f = engine._fused_chunk_pair(
                    packed_c, packed_f, oc, dc, tc, k, cfg, target=tg,
                    fine_points=fp)
                acc = jax.tree.map(jnp.add, acc,
                                   (out_c[3], out_f[3]))
                return acc, (jnp.mean((out_f[0] - tg) ** 2))

            zero = jax.tree.map(
                lambda a: jnp.zeros(a.shape, jnp.float32),
                (packed_c, packed_f))
            acc, aux = jax.lax.scan(
                body, zero, (ocs, dcs, tcs, tgts, keys, fps_))
            # Consume BOTH kernels' gradient outputs: returning only the
            # fine loss lets XLA dead-code-eliminate the entire coarse
            # kernel (its image is unused) — measured 2x optimistic.
            gsum = sum(jnp.sum(g) for g in jax.tree.leaves(acc))
            return jnp.mean(aux) + 0.0 * gsum

        f = jax.jit(kernel_only)
        ms = timeit(f, state, fps, iters=args.iters,
                    sync=lambda o: float(o))
        print(f"kernels-only merge={int(merge)} (chain pre-done): "
              f"{ms:8.1f} ms ({num_rays / ms * 1e3:,.0f} rays/s)")


if __name__ == "__main__":
    main()
