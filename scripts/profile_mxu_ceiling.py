"""Measure the PRACTICAL MXU ceiling for the reference MLP's matmul shapes.

The fused train kernels sustain ~149 TFLOPS (fine) / ~130 TFLOPS (coarse)
against the v5e's 197 TFLOPS bf16 nameplate — the question this script
settles is whether the missing ~25% is kernel fat or a shape property.

Method: a Pallas kernel whose ONLY work is the trunk chain itself —
``[T, 256] @ [256, 256]`` bf16 matmuls with f32 accumulation, repeated
``REP`` times over ``L`` resident weight matrices. Input is generated
in-kernel from an iota (no HBM streaming); output is an [8, 128] slice
(keeps the chain live, writes nothing meaningful). Zero DMA, zero
quadrature, zero encoding: any gap to 197 is the MXU pipeline itself at
these shapes (K=256 = 2 systolic passes, f32 result vectors).

Measured on v5e-1 (2026-08-17, round 3):

    bare (convert-only epilogue):  139.3 TFLOPS
    epi  (bias+relu+convert):      150.0 TFLOPS

(The bare/epi inversion is scheduler noise — the spread IS the plan
variance at these shapes.) A first variant that streamed the [1536, 256]
activations per grid step measured 80-108 TFLOPS — DMA-latency-bound, so
kernels must keep flop density per transferred byte high, which the real
train kernels do (per-RAY I/O only).

Conclusion recorded in docs/DESIGN.md: ~150 TFLOPS is the PRACTICAL
ceiling of this matmul chain on this part; the fused fine train kernel
(149.1 TFLOPS with encoding + quadrature + backward included) is at that
ceiling, and throughput asks that assume 197-peak MFU (e.g. 160k rays/s
= 86%) are not representable with exact reference math.

Usage: python scripts/profile_mxu_ceiling.py [--t 1536] [--rep 16]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 8  # trunk depth


def make_kernel(mode: str, t: int, u: int, rep: int):
    def kernel(seed_ref, *refs):
        out_ref = refs[-1]
        ws = [refs[i][...] for i in range(L)]
        bs = [refs[L + i][...] for i in range(L)]
        io = jax.lax.broadcasted_iota(jnp.int32, (t, u), 0).astype(jnp.float32)
        h = (io * 1e-4 + seed_ref[0, 0]).astype(jnp.bfloat16)
        for _ in range(rep):
            for i in range(L):
                acc = jnp.dot(h, ws[i], preferred_element_type=jnp.float32)
                if mode == "bare":
                    h = acc.astype(jnp.bfloat16)
                else:  # the real kernels' epilogue
                    h = jnp.maximum(acc + bs[i], 0.0).astype(jnp.bfloat16)
        out_ref[...] = h[:8, :128].astype(jnp.float32)
    return kernel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=1536,
                   help="points per tile (fine kernel: r_tile=8 x S=192)")
    p.add_argument("--u", type=int, default=256)
    p.add_argument("--rep", type=int, default=16)
    p.add_argument("--grid", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    ws = [jax.random.normal(jax.random.PRNGKey(i), (args.u, args.u),
                            jnp.bfloat16) * 0.05 for i in range(L)]
    bs = [jnp.zeros((1, args.u), jnp.float32) for _ in range(L)]
    seed = jnp.ones((args.grid * 8, 128), jnp.float32)

    for mode in ("bare", "epi"):
        cs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for w in ws + bs]
        f = pl.pallas_call(
            make_kernel(mode, args.t, args.u, args.rep),
            grid=(args.grid,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + cs,
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((args.grid * 8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        jf = jax.jit(lambda x, _f=f: _f(x, *ws, *bs))
        out = jf(seed)
        float(jnp.sum(out[:1]))  # sync (block_until_ready no-ops on axon)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(seed)
        float(jnp.sum(out[:1]))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        fl = 2 * args.grid * args.t * args.u * args.u * L * args.rep
        print(f"{mode:5s} T={args.t} U={args.u}: {ms:7.2f} ms  "
              f"{fl / ms / 1e9:7.1f} TFLOPS")


if __name__ == "__main__":
    main()
