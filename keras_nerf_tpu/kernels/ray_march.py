"""Fused Pallas ray-march MLP kernel.

The hot op of the whole framework: evaluating the radiance-field MLP over
every (ray, sample) point. The XLA path (`keras_nerf_tpu/models/mlp.py`)
round-trips every layer's [P, 256] activation tensor through HBM; this kernel
keeps the entire trunk + heads in VMEM per point tile — only the encoded
inputs stream in and a packed [P, 4] (rgb, sigma) tensor streams out. All
matmuls are lane-aligned bfloat16 on the MXU with float32 accumulation.

Design (see /opt/skills/guides/pallas_guide.md):

* grid over point tiles; the packed weights (~1.3 MB bf16 at the default
  8x256 architecture) use constant index maps, so Mosaic keeps them
  VMEM-resident across the whole grid instead of re-fetching;
* the positional encoding itself runs IN the kernel (selection-matrix
  broadcast of the raw [T, 8] xyz/dir tiles + masked sin/cos with explicit
  2-pi range reduction) in BLOCK order ([x | sin-block | cos-block]),
  zero-padded to lane-friendly widths (63 -> 64 xyz, 27 -> 32 dir); the
  packed first-layer / head weights are row-permuted + zero-padded to match
  (:func:`keras_nerf_tpu.ops.encoding.block_permutation`), so the kernel
  computes the same function as the reference-ordered XLA path
  (`tests/models/test_pallas_kernel.py` asserts equivalence);
* sigma and the feature head share one [256, 384] matmul (sigma rides in
  column 256); rgb heads are padded to 128-lane outputs.

Status (measured on v5e-1, 2048 rays x 192 samples, bf16): the bare kernel
beats XLA on the trunk (3.2 ms vs 5.7 ms trunk-only; 3.7 ms full MLP vs
6.5 ms for XLA's whole encode+MLP+render), but the pallas_call's operand
layout constraints force relayout copies of the streamed inputs that
currently cost the advantage back (8.8 ms end-to-end). It is therefore an
OPT-IN path (`NeRFConfig(use_pallas=True)` / `--use_pallas`), exact in
interpret mode and within bf16 rounding on TPU; the default compute path
remains XLA, whose fusion of this MLP chain is already strong. Training
always uses the XLA path (the kernel is forward-only).

Reference semantics covered: `keras_nerf/model/nerf/mlp.py:29-50` (the MLP
this fuses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keras_nerf_tpu.models.mlp import MLPConfig
from keras_nerf_tpu.ops.encoding import block_permutation, encoded_dim
from keras_nerf_tpu.ops.rendering import RenderOutput, render_rays

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_rows(w: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros((rows, w.shape[1]), dtype=w.dtype)
    out[: w.shape[0]] = w
    return out


def _pe_constants(num_freqs: int, pad: int):
    """In-kernel positional-encoding constants for block layout
    ``[x | sin-block | cos-block | pad]``.

    * ``B [8, pad]``: selection matrix broadcasting the (lane 0..2) xyz input
      into every encoded lane's source coordinate via one tiny MXU matmul;
    * ``f [1, pad]``: per-lane frequency ``2^l`` (1 on raw/pad lanes);
    * ``m [3, pad]``: 0/1 masks for (raw, sin, cos) lanes — pad lanes are 0
      in all three, so padded features come out exactly zero.
    """
    n = 3 * (1 + 2 * num_freqs)
    b = np.zeros((8, pad), np.float32)
    f = np.ones((1, pad), np.float32)
    m = np.zeros((3, pad), np.float32)
    for lane in range(n):
        if lane < 3:
            d, kind, l = lane, 0, 0
        elif lane < 3 + 3 * num_freqs:
            l, d = divmod(lane - 3, 3)
            kind = 1
        else:
            l, d = divmod(lane - 3 - 3 * num_freqs, 3)
            kind = 2
        b[d, lane] = 1.0
        f[0, lane] = 2.0 ** l
        m[kind, lane] = 1.0
    return (jnp.asarray(b), jnp.asarray(f), jnp.asarray(m))


def _encode_in_kernel(pos8, b_ref, f_ref, m_ref):
    """PE inside the kernel: ``[T, 8] xyz -> [T, pad] bf16`` block encoding.

    Explicit 2-pi range reduction before sin/cos: arguments reach
    ``2^(L-1) * |x|`` (~2000 rad at L=10), where the hardware transcendental
    approximation loses accuracy without it.
    """
    rep = jnp.dot(pos8, b_ref[...], preferred_element_type=jnp.float32)
    scaled = rep * f_ref[...]
    two_pi = 6.283185307179586
    scaled = scaled - two_pi * jnp.round(scaled * (1.0 / two_pi))
    m = m_ref[...]
    enc = (m[0:1, :] * rep
           + m[1:2, :] * jnp.sin(scaled)
           + m[2:3, :] * jnp.cos(scaled))
    return enc.astype(jnp.bfloat16)


def pack_mlp_params(params, config: MLPConfig, pos_emb_xyz: int,
                    pos_emb_dir: int) -> dict:
    """Pack a reference-layout param pytree into kernel-layout arrays.

    Weights -> bfloat16 with rows permuted into block-encoding order and
    zero-padded to sublane-aligned K dims; biases stay float32. Zero pad rows
    multiply the (zero) pad features, so the function is unchanged.
    """
    u = config.dense_units
    half = u // 2
    if u % LANE or half % LANE:
        raise ValueError(
            f"fused kernel requires dense_units % {LANE} == 0 and "
            f"dense_units//2 % {LANE} == 0 (got {u})")

    in_x = encoded_dim(3, pos_emb_xyz)
    in_d = encoded_dim(3, pos_emb_dir)
    in_x_pad = _round_up(in_x, 16)   # bf16 sublane multiple
    in_d_pad = _round_up(in_d, 16)
    perm_x = np.asarray(block_permutation(3, pos_emb_xyz))
    perm_d = np.asarray(block_permutation(3, pos_emb_dir))

    def host(a):
        return np.asarray(a)

    skip = set(config.skip_indices())
    trunk_w, trunk_b = [], []
    for i, layer in enumerate(params["trunk"]):
        w = host(layer["kernel"])
        if i == 0:
            w = _pad_rows(w[perm_x], in_x_pad)
        elif (i - 1) in skip:
            # Rows: [dense_units trunk | in_x encoded (permute) | pad].
            w_trunk, w_enc = w[:u], w[u:]
            w = np.concatenate([w_trunk, w_enc[perm_x]], axis=0)
            w = _pad_rows(w, u + in_x_pad)
        trunk_w.append(jnp.asarray(w, jnp.bfloat16))
        trunk_b.append(jnp.asarray(host(layer["bias"])[None, :], jnp.float32))

    def pack_trunk_reader(w):
        """Pad/permute a head that reads the trunk output: when the last
        trunk layer is a skip layer, the head fan-in is u + in_x (encoded
        rows get the block permutation + zero pad, matching the kernel's
        [trunk | enc | pad] activation layout)."""
        if w.shape[0] == u:
            return w
        return _pad_rows(
            np.concatenate([w[:u], w[u:][perm_x]], axis=0), u + in_x_pad)

    # sigma + features fused: [fan_in, u + LANE], sigma in column u.
    w_feat = pack_trunk_reader(host(params["features"]["kernel"]))
    w_sig = pack_trunk_reader(host(params["sigma"]["kernel"]))
    w_sf = np.zeros((w_feat.shape[0], u + LANE), dtype=np.float32)
    w_sf[:, :u] = w_feat
    w_sf[:, u] = w_sig[:, 0]
    b_sf = np.zeros((u + LANE,), dtype=np.float32)
    b_sf[:u] = host(params["features"]["bias"])
    b_sf[u] = host(params["sigma"]["bias"])[0]

    # rgb_features split into two matmuls (features-part + dir-part) so the
    # kernel never concatenates along lanes: rf = f @ top + enc_d @ dir + b.
    w_rf = host(params["rgb_features"]["kernel"])
    w_rf_top = w_rf[:u]
    w_rf_dir = _pad_rows(w_rf[u:][perm_d], in_d_pad)
    b_rf = host(params["rgb_features"]["bias"])

    # rgb: [half, LANE], columns 0..2.
    w_rgb = np.zeros((half, LANE), dtype=np.float32)
    w_rgb[:, :3] = host(params["rgb"]["kernel"])
    b_rgb = np.zeros((LANE,), dtype=np.float32)
    b_rgb[:3] = host(params["rgb"]["bias"])

    bx, fx, mx = _pe_constants(pos_emb_xyz, in_x_pad)
    bd, fd, md = _pe_constants(pos_emb_dir, in_d_pad)

    return {
        "bx": bx, "fx": fx, "mx": mx,
        "bd": bd, "fd": fd, "md": md,
        "trunk_w": trunk_w,
        "trunk_b": trunk_b,
        "w_sf": jnp.asarray(w_sf, jnp.bfloat16),
        "b_sf": jnp.asarray(b_sf[None, :], jnp.float32),
        "w_rf_top": jnp.asarray(w_rf_top, jnp.bfloat16),
        "w_rf_dir": jnp.asarray(w_rf_dir, jnp.bfloat16),
        "b_rf": jnp.asarray(b_rf[None, :], jnp.float32),
        "w_rgb": jnp.asarray(w_rgb, jnp.bfloat16),
        "b_rgb": jnp.asarray(b_rgb[None, :], jnp.float32),
    }


def _mlp_kernel(config: MLPConfig, n_trunk: int, pos_ref, dir_ref, *refs):
    """Kernel body: in-kernel PE + full trunk + heads over one point tile.

    Inputs are RAW ``[T, 8]`` float32 xyz / view-dir tiles (3 lanes used) —
    the positional encoding happens in VMEM (selection-matrix broadcast +
    masked sin/cos), so the big ``[P, 64/32]`` encoded tensors never exist in
    HBM. Lane discipline everywhere else: 128-aligned slices, split matmuls
    instead of lane concats, and a full 128-lane output tile with rgb in
    lanes 0..2 and sigma rolled into lane 3 — unaligned small-lane ops were
    measured to cost more than the whole trunk.
    """
    out_ref = refs[-1]
    trunk_w = refs[:n_trunk]
    trunk_b = refs[n_trunk:2 * n_trunk]
    (w_sf, b_sf, w_rf_top, w_rf_dir, b_rf, w_rgb, b_rgb,
     bx, fx, mx, bd, fd, md) = refs[2 * n_trunk:-1]

    skip = set(config.skip_indices())
    x = _encode_in_kernel(pos_ref[...], bx, fx, mx)
    enc_d = _encode_in_kernel(dir_ref[...], bd, fd, md)
    h = x
    for i in range(n_trunk):
        acc = jnp.dot(h, trunk_w[i][...],
                      preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + trunk_b[i][...], 0.0).astype(jnp.bfloat16)
        if i in skip:
            h = jnp.concatenate([h, x], axis=-1)

    u = config.dense_units
    sf = (jnp.dot(h, w_sf[...], preferred_element_type=jnp.float32)
          + b_sf[...])
    features = sf[:, :u].astype(jnp.bfloat16)       # lane-aligned slice
    sigma_block = jnp.maximum(sf[:, u:u + LANE], 0.0)  # sigma in lane 0

    rf = (jnp.dot(features, w_rf_top[...], preferred_element_type=jnp.float32)
          + jnp.dot(enc_d, w_rf_dir[...],
                    preferred_element_type=jnp.float32)
          + b_rf[...]).astype(jnp.bfloat16)
    rgb_pre = (jnp.dot(rf, w_rgb[...], preferred_element_type=jnp.float32)
               + b_rgb[...])

    lane = jax.lax.broadcasted_iota(jnp.int32, rgb_pre.shape, 1)
    sigma_in_lane3 = pltpu.roll(sigma_block, 3, axis=1)
    out_ref[...] = jnp.where(
        lane < 3, jax.nn.sigmoid(rgb_pre),
        jnp.where(lane == 3, sigma_in_lane3, 0.0))


def _default_interpret() -> bool:
    platform = jax.devices()[0].platform
    return platform not in ("tpu", "axon")


@functools.partial(
    jax.jit,
    static_argnames=("config", "tile", "interpret"),
)
def fused_apply_mlp(
    packed: dict,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    config: MLPConfig,
    tile: int = 1024,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused PE + MLP over points: ``(positions [P, 3] f32, directions
    [P, 3] f32) -> (rgb [P, 3] f32, sigma [P, 1] f32)``.

    ``P`` is padded up to a tile multiple internally; the 3-lane inputs are
    padded to 8 lanes for sublane alignment.
    """
    if interpret is None:
        interpret = _default_interpret()
    p = positions.shape[0]
    tile = min(tile, _round_up(p, 8))
    p_pad = _round_up(p, tile)
    positions = jnp.pad(
        positions.astype(jnp.float32),
        ((0, p_pad - p), (0, 8 - positions.shape[1])))
    directions = jnp.pad(
        directions.astype(jnp.float32),
        ((0, p_pad - p), (0, 8 - directions.shape[1])))

    n_trunk = len(packed["trunk_w"])
    weight_args = (
        list(packed["trunk_w"]) + list(packed["trunk_b"])
        + [packed["w_sf"], packed["b_sf"], packed["w_rf_top"],
           packed["w_rf_dir"], packed["b_rf"],
           packed["w_rgb"], packed["b_rgb"],
           packed["bx"], packed["fx"], packed["mx"],
           packed["bd"], packed["fd"], packed["md"]]
    )

    def const_spec(a):
        return pl.BlockSpec(
            a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    grid = p_pad // tile
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, config, n_trunk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[const_spec(a) for a in weight_args],
        ],
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(positions, directions, *weight_args)

    out = out[:p]
    return out[:, :3], out[:, 3:4]


def fused_render_chunk(
    packed: dict,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    points: jnp.ndarray,
    config,
    tile: int = 1024,
    interpret: bool | None = None,
) -> RenderOutput:
    """Encode -> fused MLP -> volume render for one chunk of rays.

    Drop-in equivalent of the no-gradient path of
    :func:`keras_nerf_tpu.models.engine.render_chunk` (same outputs up to
    bf16 matmul rounding), with the MLP fused in VMEM.

    Args:
      packed: output of :func:`pack_mlp_params`.
      origin/direction: ``[R, 3]``; points: ``[R, S]`` sorted depths.
      config: a :class:`keras_nerf_tpu.models.engine.NeRFConfig`.
    """
    r, s = points.shape
    positions = (origin[..., None, :]
                 + direction[..., None, :] * points[..., None])
    dirs = jnp.broadcast_to(direction[:, None, :], (r, s, 3))

    rgb, sigma = fused_apply_mlp(
        packed, positions.reshape(r * s, 3), dirs.reshape(r * s, 3),
        config.mlp, tile=tile, interpret=interpret)
    return render_rays(
        rgb.reshape(r, s, 3).astype(jnp.float32),
        sigma.reshape(r, s),
        points,
        white_background=config.white_background,
    )
