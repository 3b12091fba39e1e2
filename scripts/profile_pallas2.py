"""Isolate v4 kernel vs encoding cost; scan tile sizes."""

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
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from keras_nerf_tpu.kernels import pack_mlp_params
    from keras_nerf_tpu.kernels.ray_march import (encode_block128,
                                                  fused_apply_mlp,
                                                  fused_mlp_backward)
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.models.engine import NeRFConfig

    cfg = NeRFConfig(white_background=True, compute_dtype="bfloat16")
    params, _ = engine.init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(2)

    r, s = 2048, 192
    p = r * s
    pos = jax.random.normal(key, (p, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(3), (p, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    enc_fn = jax.jit(lambda a, b: encode_block128(a, b, 10, 4))
    ms = timeit(enc_fn, pos, dirs, sync=lambda o: float(o[0, 0]))
    print(f"encode_block128 ({p} pts):        {ms:7.2f} ms")
    enc = enc_fn(pos, dirs)

    packed = pack_mlp_params(params, cfg.mlp, 10, 4)
    g128 = jax.random.normal(key, (p, 128)).astype(jnp.bfloat16)

    for tile in (512, 1024, 2048, 4096):
        fwd = jax.jit(lambda e, _t=tile: fused_apply_mlp(
            packed, e, cfg.mlp, tile=_t, interpret=False))
        ms = timeit(fwd, enc, sync=lambda o: float(o[0, 0]))
        print(f"fused_apply_mlp tile={tile:5d}:      {ms:7.2f} ms")

    for tile in (256, 512, 1024, 2048):
        try:
            bwd = jax.jit(lambda e, g, _t=tile: fused_mlp_backward(
                packed, e, g, cfg.mlp, tile=_t, interpret=False))
            ms = timeit(bwd, enc, g128,
                        sync=lambda o: float(o["b_rf"].ravel()[0]))
            print(f"fused_mlp_backward tile={tile:5d}:  {ms:7.2f} ms")
        except Exception as e:
            print(f"fused_mlp_backward tile={tile:5d}:  FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
