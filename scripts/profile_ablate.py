"""Locate in-kernel cost: per-chunk timing of fused_train_chunk with
pieces ablated (KNT_ABL env var, ray_march._ablation hooks).

Timing discipline: N dispatches with DIFFERENT per-ray inputs enqueued
back-to-back, ONE host scalar fetch at the end (dispatch pipelines on the
axon tunnel, so wall ~= device time; same-input scan-repeats get LICM'd —
verify skill pitfalls).

Usage: KNT_ABL=none|noquad|nosin python scripts/profile_ablate.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from keras_nerf_tpu.kernels import pack_mlp_params
    from keras_nerf_tpu.kernels.ray_march import fused_train_chunk
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.models.engine import NeRFConfig

    abl = os.environ.get("KNT_ABL", "none")
    cfg = NeRFConfig(white_background=True)
    params, _ = engine.init_params(jax.random.PRNGKey(0), cfg)
    packed = pack_mlp_params(params, cfg.mlp, 10, 4)

    r = 4096
    key = jax.random.PRNGKey(1)
    n_inputs = 8

    def make_inputs(s):
        outs = []
        for i in range(n_inputs):
            k = jax.random.fold_in(key, i)
            o = jax.random.uniform(k, (r, 3)) * 0.1
            o = o.at[:, 2].add(4.0)
            d = jax.random.normal(jax.random.fold_in(k, 1), (r, 3))
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            t = jnp.sort(jax.random.uniform(
                jax.random.fold_in(k, 2), (r, s), minval=2.0, maxval=6.0),
                axis=-1)
            tgt = jax.random.uniform(jax.random.fold_in(k, 3), (r, 3))
            outs.append((o, d, t, tgt))
        return outs

    def bench(s, with_grad, iters=32):
        inputs = make_inputs(s)

        @jax.jit
        def call(o, d, t, tgt):
            out = fused_train_chunk(
                packed, o, d, t, tgt if with_grad else None, cfg.mlp,
                white_background=True, with_grad=with_grad,
                emit_weights=not with_grad)
            return out[0]

        for x in inputs[:2]:
            img = call(*x)
        float(img.sum())
        t0 = time.perf_counter()
        for i in range(iters):
            img = call(*inputs[i % n_inputs])
        float(img.sum())
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"ablation={abl}")
    for s, label in ((64, "coarse S=64"), (192, "fine S=192")):
        fwd = bench(s, with_grad=False)
        fb = bench(s, with_grad=True)
        flops_fwd = r * s * 1.376e6
        print(f"{label}: fwd {fwd:7.2f} ms ({flops_fwd/fwd*1e-9:6.1f} "
              f"TFLOPS)  fwd+bwd {fb:7.2f} ms "
              f"({3*flops_fwd/fb*1e-9:6.1f} TFLOPS)")


if __name__ == "__main__":
    main()
