"""Fused Pallas TPU kernels for the NeRF ray march.

The hot op of the whole framework: evaluating the radiance-field MLP over
every (ray, sample) point, forward AND backward. The XLA path
(`keras_nerf_tpu/models/mlp.py`) round-trips every layer's [P, 256]
activation through HBM — at the headline config that makes both passes
HBM-bandwidth-bound (measured ~2-3x the MXU roofline). These kernels keep
everything per ray tile in VMEM. Three tiers, fastest first:

1. :func:`fused_train_chunk` — THE DEFAULT TRAIN/EVAL PATH on TPU
   (``NeRFConfig.use_pallas=None`` auto). One kernel per ray tile runs the
   positional encoding, the MLP forward, the volume-rendering quadrature,
   the MSE loss cotangent and the full backward: activations never leave
   VMEM and there is no recompute pass (a custom-vjp split pays a 4th
   matmul pass; this pays 3). Host-side inputs are per-RAY only (base/slope
   encoding coefficients + depths ~5 MB/chunk, vs ~300 MB of materialized
   enc/delta tensors). Measured v5e-1, 128^2 headline: 130 ms/step =
   125.7k rays/s (XLA path: 218 ms; reference V100: 5.5k rays/s).
2. :func:`fused_point_forward` — a custom_vjp (pre-encoded [T, 128] input,
   forward kernel + recompute-backward kernel) used when training with a
   NON-MSE loss: XLA differentiates the quadrature/loss and the kernels
   handle the MLP. Also the building block of :func:`fused_render_chunk`.
3. the pure-XLA path (`models/mlp.py` + `ops/rendering.py`) — CPU, debug,
   and shapes outside :func:`kernel_supported`.

Design rules that made the kernels win (round 1 lost to XLA end-to-end):

* every operand/activation is lane-aligned: [T, 128] or [T, 256] tiles, no
  lane concatenations, no sub-128 slices. Where the reference concatenates
  (skip connection `mlp.py:36-38`, view-dir concat `mlp.py:43-44`) the
  kernels run SPLIT matmuls against row-masked packed weights — identical
  function, zero relayouts;
* per-ray/per-sample scalars (sigma, alpha, transmittance, weights) live
  REPLICATED across all 128 lanes of [R_T, S, 128] tensors; the
  transmittance cumulative sum and the backward's suffix sum ride the MXU
  as strictly-triangular batched matmuls (:func:`_tri_matmul_sub` — ~1%
  extra matmul FLOPs replacing ~2 log2(S) full-tensor VPU passes each).
  Mosaic cannot shape-cast lanes<->sublanes ([T, 1] <-> [R_T, S]); the
  two required conversions are mask+reduce diagonal selects (depths in:
  :func:`_replicate_lanes`; compact weights out: the emit_weights block of
  :func:`_train_chunk_kernel`);
* the positional encoding is a selection MATMUL (one nonzero per column =
  exact products) off per-ray base/slope coefficients; ``cos`` rides the
  ``sin`` unit via a masked +pi/2 phase; the [..., L, 3] broadcast layout
  the reference implies costs more in relayouts than the transcendentals;
* sigma and the feature head share one [256, 384] matmul (sigma in column
  256 — `mlp.py:17-21`); all matmuls accumulate in float32; bf16 operands;
* packed weights (~1.3 MB bf16) use constant index maps, so Mosaic keeps
  them VMEM-resident across the whole grid; dW accumulates across the
  sequential grid in VMEM f32 and is unpacked to the reference layout once
  per step;
* recompute beats an HBM activation stash (ROADMAP round-1 path b): one
  extra forward is ~2.4 ms of MXU per fine chunk vs ~4 ms of HBM round
  trip for the ~1.6 GB of stashed activations — and the fused train kernel
  eliminates both;
* the v5e has far more physical VMEM than Mosaic's conservative 16 MB
  scoped default — the fine train tile legitimately holds ~24 MB
  (vmem_limit_bytes raised).

Gradients are verified leaf-for-leaf against XLA autodiff on hardware and
in interpret mode (tests/models/test_pallas_kernel.py). Reference
semantics covered: `keras_nerf/model/nerf/mlp.py:29-50` (MLP),
`utils.py:17-58` (quadrature), `utils.py:177-210` (encoding).
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
ENC_XYZ_OFF = 0    # xyz block occupies lanes [0, 64)
ENC_DIR_OFF = 64   # dir block occupies lanes [64, 128)

# Diagnostic ablations for scripts/profile_ablate.py (KNT_ABL env var):
# 'noquad' removes the quadrature math, 'notri' removes only the
# triangular scan matmuls, 'nosin' removes the encoding transcendentals,
# 'norep' removes the lane->sublane sample replication, 'noenc' removes
# all encoding construction past the replication, 'noepi' removes the
# per-layer bias/relu epilogues. Wrong math by design — never set outside
# profiling.
_ABL = __import__("os").environ.get("KNT_ABL", "none")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def kernel_supported(config: MLPConfig, pos_emb_xyz: int,
                     pos_emb_dir: int) -> bool:
    """Static shape envelope of the fused kernels."""
    u = config.dense_units
    return (u % LANE == 0 and (u // 2) % LANE == 0
            and encoded_dim(3, pos_emb_xyz) <= 64
            and encoded_dim(3, pos_emb_dir) <= 64)


def encode_block128(
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    pos_emb_xyz: int,
    pos_emb_dir: int,
) -> jnp.ndarray:
    """XLA-side input packing: ``([..., 3], [..., 3]) -> [..., 128]`` bf16.

    Block-order positional encodings (`ops/encoding.py:
    positional_encoding_block`) for xyz (63 dims, lanes 0..62) and view dir
    (27 dims, lanes 64..90); zero pad elsewhere. The packed first-layer /
    head weights are row-permuted to this layout, so kernel output ==
    reference-order math.
    """
    b, masks = _enc128_constants(pos_emb_xyz, pos_emb_dir)
    x6 = jnp.concatenate([positions, directions], axis=-1)
    # HIGHEST precision: a default-precision TPU dot quantizes the
    # coordinate to bf16 BEFORE the 2^l scaling (multi-radian phase error
    # at the top octaves). K = 6, so exactness is free.
    rep = jnp.dot(x6, jnp.asarray(b), preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return _masked_sincos(rep, masks)


def _masked_sincos(rep, masks):
    enc = (masks[0] * rep + masks[1] * jnp.sin(rep)
           + masks[2] * jnp.cos(rep))
    return enc.astype(jnp.bfloat16)


def ray_encoding_coeffs(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    pos_emb_xyz: int,
    pos_emb_dir: int,
):
    """Per-RAY encoding coefficients ``(base [R, 128], slope [R, 128])``.

    Folds the position expansion ``p = o + t d`` (`utils.py:193-194`) into
    the selection matmuls: every scaled positional-encoding argument is
    ``rep[r, s] = base_r + t[r, s] * slope_r`` — the kernel derives the
    per-point encoding from these two [R, 128] rows, so no [P, 3]-shaped
    tensor (tiny-lane relayout pathology) ever materializes and host->
    kernel traffic stays per-ray.
    """
    b, masks = _enc128_constants(pos_emb_xyz, pos_emb_dir)
    b = jnp.asarray(b)
    # b rows 0..2 scale xyz lanes (zero on dir lanes); rows 3..5 vice versa.
    # HIGHEST precision: see encode_block128 (bf16-quantized coordinates
    # would corrupt the top PE octaves).
    hi = jax.lax.Precision.HIGHEST
    base = (jnp.dot(origin, b[0:3], preferred_element_type=jnp.float32,
                    precision=hi)
            + jnp.dot(direction, b[3:6], preferred_element_type=jnp.float32,
                      precision=hi))
    slope = jnp.dot(direction, b[0:3], preferred_element_type=jnp.float32,
                    precision=hi)
    return base, slope, masks


@functools.lru_cache(maxsize=None)
def _enc128_constants(pos_emb_xyz: int, pos_emb_dir: int):
    """One-matmul encoding constants: ``[P, 6] @ [6, 128]`` produces every
    scaled argument exactly (one nonzero per column), then 0/1 masks pick
    raw/sin/cos per lane. Replaces the ``[..., L, 3]`` broadcast whose tiny
    lane dim costs ~6x the sin/cos in TPU relayouts (same trick as
    `ops/encoding.py:_selection_constants`, both blocks in one matmul)."""
    from keras_nerf_tpu.ops.encoding import _selection_constants

    bx, mx = _selection_constants(3, pos_emb_xyz, "block")
    bd, md = _selection_constants(3, pos_emb_dir, "block")
    n_x, n_d = bx.shape[1], bd.shape[1]
    b = np.zeros((6, LANE), np.float32)
    masks = np.zeros((3, LANE), np.float32)
    b[0:3, ENC_XYZ_OFF:ENC_XYZ_OFF + n_x] = bx
    b[3:6, ENC_DIR_OFF:ENC_DIR_OFF + n_d] = bd
    masks[:, ENC_XYZ_OFF:ENC_XYZ_OFF + n_x] = mx
    masks[:, ENC_DIR_OFF:ENC_DIR_OFF + n_d] = md
    return b, masks


def _layer_uses_enc(i: int, skip: set) -> bool:
    """Trunk layer ``i`` reads the encoded input: layer 0 always; any layer
    right after a skip concat (`mlp.py:36-38`)."""
    return i == 0 or (i - 1) in skip


def padded_fwd_flop_per_point(config: MLPConfig,
                              sigma_only: bool = False) -> int:
    """Padded (lane-aligned) matmul FLOPs ONE point costs in the fused
    forward kernel — exactly the dot shapes `_forward_core` issues against
    the `pack_mlp_params` layout (encoded input block = LANE lanes, heads
    lane-padded). This is the FLOP model behind every MFU number the repo
    reports (bench.py, docs/DESIGN.md rooflines); deriving it from the
    config keeps those numbers honest when shape flags change. The per-RAY
    encoding selection matmuls (`ray_encoding_coeffs`) are excluded — they
    run XLA-side and are O(rays), not O(points). Training cost is 3x this
    (fwd + dX + dW).

    Default 8x256 reference MLP: 1,376,256 (the "1.376 MFLOP/point" of
    docs/DESIGN.md); sigma-only (render coarse pass): 1,114,112.
    """
    u = config.dense_units
    skip = set(config.skip_indices())
    last_skip = (config.n_layers - 1) in skip
    flops = 2 * LANE * u  # trunk layer 0 reads the [T, 128] encoded tile
    for i in range(1, config.n_layers):
        flops += 2 * u * u
        if _layer_uses_enc(i, skip):
            flops += 2 * LANE * u  # post-skip layers add the enc matmul
    if sigma_only:
        # Only the (128-aligned) sigma slice of the fused head.
        flops += 2 * u * LANE
        if last_skip:
            flops += 2 * LANE * LANE
        return flops
    flops += 2 * u * (u + LANE)  # fused sigma/features head
    if last_skip:
        flops += 2 * LANE * (u + LANE)
    half = u // 2
    flops += 2 * u * half + 2 * LANE * half  # rgb_features: top + enc-dir
    flops += 2 * half * LANE  # rgb head, lane-padded
    return flops


def pack_mlp_params(params, config: MLPConfig, pos_emb_xyz: int,
                    pos_emb_dir: int) -> dict:
    """Pack a reference-layout param pytree into kernel-layout arrays.

    Weights -> bfloat16; every matrix that reads the encoded input gets its
    encoding rows permuted into block order and placed in a ``[128, n]``
    matrix at the xyz/dir lane offsets (zero rows elsewhere — zero rows
    multiply zero or irrelevant lanes, so the function is unchanged).
    Biases stay float32, shaped ``[1, n]`` for VMEM tiling.

    Fully jnp-traceable: callable inside jit (the training custom_vjp packs
    on the fly) as well as on concrete params.
    """
    u = config.dense_units
    if not kernel_supported(config, pos_emb_xyz, pos_emb_dir):
        raise ValueError(
            f"fused kernel requires dense_units % {LANE} == 0, "
            f"dense_units//2 % {LANE} == 0 and encodings <= 64 dims "
            f"(got units={u}, Lx={pos_emb_xyz}, Ld={pos_emb_dir})")

    in_x = encoded_dim(3, pos_emb_xyz)
    in_d = encoded_dim(3, pos_emb_dir)
    perm_x = np.asarray(block_permutation(3, pos_emb_xyz))
    perm_d = np.asarray(block_permutation(3, pos_emb_dir))
    skip = set(config.skip_indices())
    n = config.n_layers
    last_skip = (n - 1) in skip  # heads read concat(h, enc_xyz)

    def enc128_rows(w_x=None, w_d=None, cols=None):
        """[128, cols] matrix with permuted xyz rows at ENC_XYZ_OFF and/or
        permuted dir rows at ENC_DIR_OFF."""
        out = jnp.zeros((LANE, cols), dtype=jnp.float32)
        if w_x is not None:
            out = out.at[ENC_XYZ_OFF:ENC_XYZ_OFF + in_x].set(
                jnp.take(w_x, perm_x, axis=0))
        if w_d is not None:
            out = out.at[ENC_DIR_OFF:ENC_DIR_OFF + in_d].set(
                jnp.take(w_d, perm_d, axis=0))
        return out

    trunk_w, trunk_enc_w, trunk_b = [], [], []
    for i, layer in enumerate(params["trunk"]):
        w = layer["kernel"]
        if i == 0:
            trunk_w.append(enc128_rows(w_x=w, cols=u).astype(jnp.bfloat16))
            trunk_enc_w.append(None)
        elif (i - 1) in skip:
            trunk_w.append(w[:u].astype(jnp.bfloat16))
            trunk_enc_w.append(
                enc128_rows(w_x=w[u:], cols=u).astype(jnp.bfloat16))
        else:
            trunk_w.append(w.astype(jnp.bfloat16))
            trunk_enc_w.append(None)
        trunk_b.append(layer["bias"][None, :].astype(jnp.float32))

    # sigma + features fused: [fan, u + LANE], sigma in column u.
    w_feat = params["features"]["kernel"]
    w_sig = params["sigma"]["kernel"]
    w_sf_full = jnp.concatenate([w_feat, w_sig], axis=1)  # [fan, u+1]
    w_sf_full = jnp.pad(w_sf_full, ((0, 0), (0, LANE - 1)))
    if last_skip:
        w_sf = w_sf_full[:u]
        w_sf_enc = enc128_rows(w_x=w_sf_full[u:], cols=u + LANE)
    else:
        w_sf = w_sf_full
        w_sf_enc = None
    b_sf = jnp.concatenate(
        [params["features"]["bias"], params["sigma"]["bias"]])
    b_sf = jnp.pad(b_sf, (0, LANE - 1))

    # rgb_features: fan is ALWAYS u (features output) + in_d — split into
    # a trunk-feature matmul and an enc-dir matmul.
    half = u // 2
    w_rf = params["rgb_features"]["kernel"]
    w_rf_top = w_rf[:u]
    w_rf_enc = enc128_rows(w_d=w_rf[u:], cols=half)
    b_rf = params["rgb_features"]["bias"]

    # rgb: [half, LANE], columns 0..2.
    w_rgb = jnp.pad(params["rgb"]["kernel"], ((0, 0), (0, LANE - 3)))
    b_rgb = jnp.pad(params["rgb"]["bias"], (0, LANE - 3))

    return {
        "trunk_w": trunk_w,
        "trunk_enc_w": trunk_enc_w,  # None entries for non-enc layers
        "trunk_b": trunk_b,
        "w_sf": w_sf.astype(jnp.bfloat16),
        "w_sf_enc": (None if w_sf_enc is None
                     else w_sf_enc.astype(jnp.bfloat16)),
        "b_sf": b_sf[None, :].astype(jnp.float32),
        "w_rf_top": w_rf_top.astype(jnp.bfloat16),
        "w_rf_enc": w_rf_enc.astype(jnp.bfloat16),
        "b_rf": b_rf[None, :].astype(jnp.float32),
        "w_rgb": w_rgb.astype(jnp.bfloat16),
        "b_rgb": b_rgb[None, :].astype(jnp.float32),
    }


def _flatten_packed(packed: dict) -> list:
    """Deterministic operand order for pallas_call (skips None entries)."""
    out = list(packed["trunk_w"])
    out += [w for w in packed["trunk_enc_w"] if w is not None]
    out += list(packed["trunk_b"])
    out += [packed["w_sf"]]
    if packed["w_sf_enc"] is not None:
        out += [packed["w_sf_enc"]]
    out += [packed["b_sf"], packed["w_rf_top"], packed["w_rf_enc"],
            packed["b_rf"], packed["w_rgb"], packed["b_rgb"]]
    return out


def _unflatten_packed(config: MLPConfig, last_skip: bool, args):
    """Inverse of :func:`_flatten_packed` over a flat ref/array list."""
    n = config.n_layers
    skip = set(config.skip_indices())
    it = iter(args)
    trunk_w = [next(it) for _ in range(n)]
    trunk_enc_w = [next(it) if (_layer_uses_enc(i, skip) and i > 0) else None
                   for i in range(n)]
    trunk_b = [next(it) for _ in range(n)]
    w_sf = next(it)
    w_sf_enc = next(it) if last_skip else None
    b_sf, w_rf_top, w_rf_enc, b_rf, w_rgb, b_rgb = (
        next(it), next(it), next(it), next(it), next(it), next(it))
    rest = list(it)
    return {
        "trunk_w": trunk_w, "trunk_enc_w": trunk_enc_w, "trunk_b": trunk_b,
        "w_sf": w_sf, "w_sf_enc": w_sf_enc, "b_sf": b_sf,
        "w_rf_top": w_rf_top, "w_rf_enc": w_rf_enc, "b_rf": b_rf,
        "w_rgb": w_rgb, "b_rgb": b_rgb,
    }, rest


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _forward_core(config: MLPConfig, last_skip: bool, enc, w,
                  keep_acts: bool = False, sigma_only: bool = False):
    """Shared fwd math over one ``[T, 128]`` encoded tile.

    Returns ``(rgb_pre [T, 128] f32, sigma_pre [T, 128] f32 (sigma lane 0),
    acts)`` where ``acts`` (kept only for the backward) is
    ``(h_list, features, rf)``.

    ``sigma_only`` skips the color heads entirely (``rgb_pre`` is None):
    the trunk + the sigma half of the sigma/feature matmul — ~19% fewer
    FLOPs. Exact for consumers that never read rgb (the render path's
    coarse pass, which only feeds hierarchical sampling).
    """
    u = config.dense_units
    skip = set(config.skip_indices())

    h = None
    h_list = []
    for i in range(config.n_layers):
        # f32 accumulate + f32 bias/relu, converted once: a bf16 epilogue
        # (dot16 + bf16 bias) was tried and pushed the deepest trunk
        # gradient past the 5% XLA-parity budget (relu mask flips at the
        # rounding boundary) for no measured step-time win.
        acc = _dot(enc, w["trunk_w"][i][...]) if i == 0 else \
            _dot(h, w["trunk_w"][i][...])
        if i > 0 and _layer_uses_enc(i, skip):
            acc = acc + _dot(enc, w["trunk_enc_w"][i][...])
        if _ABL == "noepi":
            h = acc.astype(jnp.bfloat16)
        else:
            h = jnp.maximum(acc + w["trunk_b"][i][...],
                            0.0).astype(jnp.bfloat16)
        if keep_acts:
            h_list.append(h)

    if sigma_only:
        # Only the sigma block of the fused sigma/feature matmul (the
        # [.., u:] lane slice of the packed weights is 128-aligned).
        sigma_pre = _dot(h, w["w_sf"][:, u:])
        if last_skip:
            sigma_pre = sigma_pre + _dot(enc, w["w_sf_enc"][:, u:])
        sigma_pre = sigma_pre + w["b_sf"][:, u:]
        return None, sigma_pre, None

    sf = _dot(h, w["w_sf"][...])
    if last_skip:
        sf = sf + _dot(enc, w["w_sf_enc"][...])
    sf = sf + w["b_sf"][...]
    features = sf[:, :u].astype(jnp.bfloat16)      # lane-aligned slice
    sigma_pre = sf[:, u:u + LANE]                  # sigma in lane 0

    rf = (_dot(features, w["w_rf_top"][...])
          + _dot(enc, w["w_rf_enc"][...])
          + w["b_rf"][...]).astype(jnp.bfloat16)
    rgb_pre = _dot(rf, w["w_rgb"][...]) + w["b_rgb"][...]

    acts = (h_list, features, rf) if keep_acts else None
    return rgb_pre, sigma_pre, acts


def _pack_out(rgb_pre, sigma_pre):
    """[T, 128]: sigmoid(rgb) in lanes 0..2, relu(sigma) in lane 3."""
    lane = jax.lax.broadcasted_iota(jnp.int32, rgb_pre.shape, 1)
    sigma_in_lane3 = pltpu.roll(jnp.maximum(sigma_pre, 0.0), 3, axis=1)
    return jnp.where(
        lane < 3, jax.nn.sigmoid(rgb_pre),
        jnp.where(lane == 3, sigma_in_lane3, 0.0))


def _mlp_fwd_kernel(config: MLPConfig, last_skip: bool, enc_ref, *refs):
    out_ref = refs[-1]
    w, _ = _unflatten_packed(config, last_skip, refs[:-1])
    rgb_pre, sigma_pre, _ = _forward_core(config, last_skip, enc_ref[...], w)
    out_ref[...] = _pack_out(rgb_pre, sigma_pre)


def _default_interpret() -> bool:
    platform = jax.devices()[0].platform
    return platform not in ("tpu", "axon")


def _const_spec(a):
    return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("config", "tile", "interpret"))
def fused_apply_mlp(
    packed: dict,
    enc128: jnp.ndarray,
    config: MLPConfig,
    tile: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused MLP over pre-encoded points: ``enc128 [P, 128] bf16 ->
    [P, 128] f32`` with sigmoid(rgb) in lanes 0..2, relu(sigma) in lane 3.

    ``P`` is padded up to a tile multiple internally.
    """
    if interpret is None:
        interpret = _default_interpret()
    p = enc128.shape[0]
    tile = min(tile, _round_up(p, 8))
    p_pad = _round_up(p, tile)
    enc128 = jnp.pad(enc128, ((0, p_pad - p), (0, 0)))

    last_skip = (config.n_layers - 1) in set(config.skip_indices())
    weight_args = _flatten_packed(packed)
    grid = p_pad // tile
    out = pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, config, last_skip),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[_const_spec(a) for a in weight_args],
        ],
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(enc128, *weight_args)
    return out[:p]


# ---------------------------------------------------------------------------
# Training support: recompute-based backward kernel + custom_vjp.
# ---------------------------------------------------------------------------

def _acc_out(ref, value):
    """Accumulate a per-tile gradient into a grid-constant output block.

    TPU grids execute sequentially ('arbitrary' dimension semantics), so the
    first program initializes and the rest add — the standard dW-accumulation
    pattern for weight-gradient kernels.
    """
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        ref[...] = value

    @pl.when(jnp.logical_not(first))
    def _():
        ref[...] = ref[...] + value


def _mlp_bwd_kernel(config: MLPConfig, last_skip: bool, enc_ref, g_ref,
                    *refs):
    """Backward kernel: recompute the forward per tile entirely in VMEM,
    then backprop heads + trunk, accumulating weight/bias gradients across
    the grid. Inputs: the encoded tile and a [T, 128] cotangent tile (lanes
    0..2 = d rgb, lane 3 = d sigma). Gradients w.r.t. the encoded input are
    NOT produced (positions/directions are data in this framework).
    """
    u = config.dense_units
    skip = set(config.skip_indices())
    n = config.n_layers

    # Split refs: weights first (same count as _flatten_packed), then the
    # same-structured gradient outputs.
    n_enc = sum(1 for i in range(n) if i > 0 and _layer_uses_enc(i, skip))
    n_weights = (2 * n + n_enc + 7 + (1 if last_skip else 0))
    w, _ = _unflatten_packed(config, last_skip, refs[:n_weights])
    d, _ = _unflatten_packed(config, last_skip, refs[n_weights:])

    enc = enc_ref[...]

    def rowsum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    def dW(a, g):  # a^T @ g contracting the point axis
        return jax.lax.dot_general(
            a, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dX(g, ww):  # g @ ww^T contracting the feature axis
        # f32 output: cotangents compound through the 8-layer chain, and
        # bf16 storage here pushed the deepest trunk gradient past the 5%
        # XLA-parity budget (measured 6.1%) — the epilogue saving is not
        # worth the precision.
        return jax.lax.dot_general(
            g, ww, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---- forward recompute, keeping every trunk activation ---------------
    rgb_pre, sigma_pre, (h_list, features, rf) = _forward_core(
        config, last_skip, enc, w, keep_acts=True)
    rgb = jax.nn.sigmoid(rgb_pre)

    # ---- head backward ----------------------------------------------------
    g128 = g_ref[...].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, g128.shape, 1)
    g_rgb = jnp.where(lane < 3, g128, 0.0)
    # Circular roll by LANE - 3 moves lane 3 -> lane 0 (negative shifts are
    # not supported by pltpu.roll).
    g_sigma = pltpu.roll(jnp.where(lane == 3, g128, 0.0), LANE - 3, axis=1)

    d_rgb_pre = (g_rgb * rgb * (1.0 - rgb)).astype(jnp.bfloat16)
    _acc_out(d["w_rgb"], dW(rf, d_rgb_pre))
    _acc_out(d["b_rgb"], rowsum(d_rgb_pre.astype(jnp.float32)))

    d_rf = dX(d_rgb_pre, w["w_rgb"][...]).astype(jnp.bfloat16)
    _acc_out(d["w_rf_top"], dW(features, d_rf))
    _acc_out(d["w_rf_enc"], dW(enc, d_rf))
    _acc_out(d["b_rf"], rowsum(d_rf.astype(jnp.float32)))

    d_features = dX(d_rf, w["w_rf_top"][...]).astype(jnp.bfloat16)  # [T, u]
    d_sigma_pre = (g_sigma * (sigma_pre > 0.0)).astype(jnp.bfloat16)  # relu'
    # The sf head's cotangent is [d_features | d_sigma] along lanes; split
    # every consumer into two matmuls instead of materializing the concat
    # (w_sf columns are lane-aligned at u).
    _acc_out(d["w_sf"], jnp.concatenate(
        [dW(h_list[-1], d_features), dW(h_list[-1], d_sigma_pre)], axis=1))
    if last_skip:
        _acc_out(d["w_sf_enc"], jnp.concatenate(
            [dW(enc, d_features), dW(enc, d_sigma_pre)], axis=1))
    _acc_out(d["b_sf"], jnp.concatenate(
        [rowsum(d_features.astype(jnp.float32)),
         rowsum(d_sigma_pre.astype(jnp.float32))], axis=1))

    u_lanes = config.dense_units
    d_h = (dX(d_features, w["w_sf"][:, :u_lanes])
           + dX(d_sigma_pre, w["w_sf"][:, u_lanes:]))       # [T, u] f32

    # ---- trunk backward ---------------------------------------------------
    for i in reversed(range(n)):
        # Mask compare in f32 — v5e Mosaic rejects bf16 comparisons.
        d_pre = (d_h * (h_list[i].astype(jnp.float32) > 0.0)
                 ).astype(jnp.bfloat16)
        a_in = enc if i == 0 else h_list[i - 1]
        _acc_out(d["trunk_w"][i], dW(a_in, d_pre))
        if i > 0 and _layer_uses_enc(i, skip):
            _acc_out(d["trunk_enc_w"][i], dW(enc, d_pre))
        _acc_out(d["trunk_b"][i], rowsum(d_pre.astype(jnp.float32)))
        if i > 0:
            d_h = dX(d_pre, w["trunk_w"][i][...])


@functools.partial(jax.jit, static_argnames=("config", "tile", "interpret"))
def fused_mlp_backward(
    packed: dict,
    enc128: jnp.ndarray,
    g128: jnp.ndarray,
    config: MLPConfig,
    tile: int = 1024,
    interpret: bool | None = None,
) -> dict:
    """Run the backward kernel; returns packed-layout gradient arrays."""
    if interpret is None:
        interpret = _default_interpret()
    p = enc128.shape[0]
    tile = min(tile, _round_up(p, 8))
    p_pad = _round_up(p, tile)
    # Pad points carry zero cotangents, so they contribute nothing to dW.
    enc128 = jnp.pad(enc128, ((0, p_pad - p), (0, 0)))
    g128 = jnp.pad(g128, ((0, p_pad - p), (0, 0)))

    last_skip = (config.n_layers - 1) in set(config.skip_indices())
    weight_args = _flatten_packed(packed)
    out_shapes = tuple(
        jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in weight_args)
    out_specs = tuple(_const_spec(s) for s in out_shapes)

    grid = p_pad // tile
    outs = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, config, last_skip),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[_const_spec(a) for a in weight_args],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(enc128, g128, *weight_args)

    d_packed, _ = _unflatten_packed(config, last_skip, list(outs))
    return d_packed


def unpack_grads(d_packed: dict, config: MLPConfig, pos_emb_xyz: int,
                 pos_emb_dir: int) -> dict:
    """Packed-layout gradient arrays -> reference-layout param pytree."""
    u = config.dense_units
    in_x = encoded_dim(3, pos_emb_xyz)
    in_d = encoded_dim(3, pos_emb_dir)
    inv_x = np.argsort(np.asarray(block_permutation(3, pos_emb_xyz)))
    inv_d = np.argsort(np.asarray(block_permutation(3, pos_emb_dir)))
    skip = set(config.skip_indices())
    n = config.n_layers
    last_skip = (n - 1) in skip

    def unpack_xyz(rows128):
        return jnp.take(rows128[ENC_XYZ_OFF:ENC_XYZ_OFF + in_x], inv_x,
                        axis=0)

    def unpack_dir(rows128):
        return jnp.take(rows128[ENC_DIR_OFF:ENC_DIR_OFF + in_d], inv_d,
                        axis=0)

    trunk = []
    for i in range(n):
        if i == 0:
            kernel = unpack_xyz(d_packed["trunk_w"][0])
        elif (i - 1) in skip:
            kernel = jnp.concatenate(
                [d_packed["trunk_w"][i],
                 unpack_xyz(d_packed["trunk_enc_w"][i])], axis=0)
        else:
            kernel = d_packed["trunk_w"][i]
        trunk.append({"kernel": kernel, "bias": d_packed["trunk_b"][i][0]})

    d_sf = d_packed["w_sf"]
    if last_skip:
        d_sf = jnp.concatenate([d_sf, unpack_xyz(d_packed["w_sf_enc"])],
                               axis=0)
    features_kernel = d_sf[:, :u]
    sigma_kernel = d_sf[:, u:u + 1]
    b_sf = d_packed["b_sf"][0]

    rgb_features_kernel = jnp.concatenate(
        [d_packed["w_rf_top"], unpack_dir(d_packed["w_rf_enc"])], axis=0)

    return {
        "trunk": trunk,
        "sigma": {"kernel": sigma_kernel, "bias": b_sf[u:u + 1]},
        "features": {"kernel": features_kernel, "bias": b_sf[:u]},
        "rgb_features": {"kernel": rgb_features_kernel,
                         "bias": d_packed["b_rf"][0]},
        "rgb": {"kernel": d_packed["w_rgb"][:, :3],
                "bias": d_packed["b_rgb"][0, :3]},
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_point_forward(params, positions, directions, config: MLPConfig,
                        pos_emb_xyz: int, pos_emb_dir: int,
                        tile: int = 2048, interpret: bool | None = None):
    """Differentiable fused PE + MLP over points.

    ``(params, positions [P, 3] f32, directions [P, 3] f32) ->
    (rgb [P, 3] f32, sigma [P, 1] f32)`` — the fused equivalent of
    ``apply_mlp(params, *encode(...))`` (`mlp.py:29-50`). The custom VJP
    runs the recompute backward kernel for the parameter gradients;
    positions/directions are treated as data (zero cotangents) — in the
    engine they are sampled depths under stop_gradient.
    """
    enc = encode_block128(positions, directions, pos_emb_xyz, pos_emb_dir)
    packed = pack_mlp_params(params, config, pos_emb_xyz, pos_emb_dir)
    out = fused_apply_mlp(packed, enc, config, tile=tile,
                          interpret=interpret)
    return out[:, :3], out[:, 3:4]


def _fpf_fwd(params, positions, directions, config, pos_emb_xyz,
             pos_emb_dir, tile, interpret):
    enc = encode_block128(positions, directions, pos_emb_xyz, pos_emb_dir)
    packed = pack_mlp_params(params, config, pos_emb_xyz, pos_emb_dir)
    out = fused_apply_mlp(packed, enc, config, tile=tile,
                          interpret=interpret)
    return (out[:, :3], out[:, 3:4]), (params, enc)


def _fpf_bwd(config, pos_emb_xyz, pos_emb_dir, tile, interpret, res, g):
    params, enc = res
    g_rgb, g_sigma = g
    # Cotangent tile: lanes 0..2 rgb, lane 3 sigma (bf16 — the same
    # precision XLA's bf16 backward matmuls see).
    g128 = jnp.pad(
        jnp.concatenate([g_rgb, g_sigma], axis=1),
        ((0, 0), (0, LANE - 4))).astype(jnp.bfloat16)
    packed = pack_mlp_params(params, config, pos_emb_xyz, pos_emb_dir)
    # The backward tile is smaller than the forward's: the recompute keeps
    # every trunk activation live in VMEM.
    d_packed = fused_mlp_backward(packed, enc, g128, config,
                                  tile=min(tile, 1024), interpret=interpret)
    d_params = unpack_grads(d_packed, config, pos_emb_xyz, pos_emb_dir)
    p = enc.shape[0]
    return (d_params, jnp.zeros((p, 3), jnp.float32),
            jnp.zeros((p, 3), jnp.float32))


fused_point_forward.defvjp(_fpf_fwd, _fpf_bwd)


def fused_render_chunk(
    packed: dict,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    points: jnp.ndarray,
    config,
    tile: int = 2048,
    interpret: bool | None = None,
) -> RenderOutput:
    """Encode -> fused MLP -> volume render for one chunk of rays
    (no-gradient path; pre-packed weights).

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
    enc = encode_block128(positions.reshape(r * s, 3), dirs.reshape(r * s, 3),
                          config.pos_emb_xyz, config.pos_emb_dir)
    out = fused_apply_mlp(packed, enc, config.mlp, tile=tile,
                          interpret=interpret)
    return render_rays(
        out[:, :3].reshape(r, s, 3),
        out[:, 3].reshape(r, s),
        points,
        white_background=config.white_background,
    )


# ---------------------------------------------------------------------------
# Fully fused training kernel: forward + quadrature + MSE cotangent +
# backward in ONE kernel — no recompute pass, activations never leave VMEM.
# ---------------------------------------------------------------------------

def _backward_core(config: MLPConfig, last_skip: bool, enc, g_rgb128,
                   g_sigma128, fwd_state, w, d):
    """Shared MLP backward given head cotangents and live forward state.

    Args:
      g_rgb128: [T, 128] f32 cotangent of sigmoid(rgb), lanes 0..2 (others 0).
      g_sigma128: [T, 128] f32 cotangent of relu(sigma), lane 0 (others 0).
      fwd_state: ``(rgb_pre or rgb, sigma_pre, (h_list, features, rf))``
        with ``rgb`` POST-sigmoid.
      w/d: weight refs / gradient output refs (packed dict of refs).
    """
    skip = set(config.skip_indices())
    n = config.n_layers
    rgb, sigma_pre, (h_list, features, rf) = fwd_state

    def rowsum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    def dW(a, g):
        return jax.lax.dot_general(
            a, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dX(g, ww):
        # f32 output: cotangents compound through the 8-layer chain, and
        # bf16 storage here pushed the deepest trunk gradient past the 5%
        # XLA-parity budget (measured 6.1%) — the epilogue saving is not
        # worth the precision.
        return jax.lax.dot_general(
            g, ww, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    d_rgb_pre = (g_rgb128 * rgb * (1.0 - rgb)).astype(jnp.bfloat16)
    _acc_out(d["w_rgb"], dW(rf, d_rgb_pre))
    _acc_out(d["b_rgb"], rowsum(d_rgb_pre.astype(jnp.float32)))

    d_rf = dX(d_rgb_pre, w["w_rgb"][...]).astype(jnp.bfloat16)
    _acc_out(d["w_rf_top"], dW(features, d_rf))
    _acc_out(d["w_rf_enc"], dW(enc, d_rf))
    _acc_out(d["b_rf"], rowsum(d_rf.astype(jnp.float32)))

    d_features = dX(d_rf, w["w_rf_top"][...]).astype(jnp.bfloat16)
    d_sigma_pre = (g_sigma128 * (sigma_pre > 0.0)).astype(jnp.bfloat16)
    _acc_out(d["w_sf"], jnp.concatenate(
        [dW(h_list[-1], d_features), dW(h_list[-1], d_sigma_pre)], axis=1))
    if last_skip:
        _acc_out(d["w_sf_enc"], jnp.concatenate(
            [dW(enc, d_features), dW(enc, d_sigma_pre)], axis=1))
    _acc_out(d["b_sf"], jnp.concatenate(
        [rowsum(d_features.astype(jnp.float32)),
         rowsum(d_sigma_pre.astype(jnp.float32))], axis=1))

    u = config.dense_units
    d_h = (dX(d_features, w["w_sf"][:, :u])
           + dX(d_sigma_pre, w["w_sf"][:, u:]))

    for i in reversed(range(n)):
        if _ABL == "noepi":
            d_pre = d_h.astype(jnp.bfloat16)
        else:
            d_pre = (d_h * (h_list[i].astype(jnp.float32) > 0.0)
                     ).astype(jnp.bfloat16)
        a_in = enc if i == 0 else h_list[i - 1]
        _acc_out(d["trunk_w"][i], dW(a_in, d_pre))
        if i > 0 and _layer_uses_enc(i, skip):
            _acc_out(d["trunk_enc_w"][i], dW(enc, d_pre))
        _acc_out(d["trunk_b"][i], rowsum(d_pre.astype(jnp.float32)))
        if i > 0:
            d_h = dX(d_pre, w["trunk_w"][i][...])


def _sin_poly(x):
    """Degree-9 odd minimax polynomial for sin on the range-reduced
    [-pi, pi] argument: max abs error 1.4e-5, far below the bfloat16
    quantization the encoding output immediately undergoes (ulp 3.9e-3 at
    |sin| ~ 1; a degree-7 fit at 5.4e-4 measurably shifted first-layer
    weight gradients vs XLA). Profiled: the generic in-kernel ``jnp.sin``
    lowering cost ~2.5 ms per fine-chunk forward (scripts/
    profile_ablate.py, KNT_ABL=nosin); this is 6 cheap VPU ops. The
    ARGUMENT stays f32 end-to-end — round 2 established that bf16 phase
    error upstream of the top PE octaves is the harmful failure mode."""
    x2 = x * x
    p = 2.16657012e-6 * x2 + -1.93030430e-4
    p = p * x2 + 8.31153094e-3
    p = p * x2 + -1.66630582e-1
    p = p * x2 + 9.99983358e-1
    return x * p


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _lane_bcast(x):
    """Broadcast a lane-0-only [.., 128] value across all lanes (reduce +
    broadcast — the softmax pattern, natively supported; all other lanes of
    ``x`` must be zero)."""
    return jnp.broadcast_to(jnp.sum(x, axis=-1, keepdims=True), x.shape)


def _replicate_lanes(x, out_lanes=LANE):
    """``[R_T, S (lanes)] -> [R_T, S (sublanes), out_lanes]`` replicated.

    Mosaic cannot shape-cast lanes<->sublanes; this does it as (supported)
    primitives: sublane-broadcast, a diagonal select against iota, a lane
    reduction and a lane broadcast. Cost ~2 passes over [R_T, S, S].
    """
    r_tile, s = x.shape
    x3 = jnp.broadcast_to(x[:, None, :], (r_tile, s, s))
    sub = jax.lax.broadcasted_iota(jnp.int32, x3.shape, 1)
    lane = _lane_iota(x3.shape)
    picked = jnp.sum(jnp.where(sub == lane, x3, 0.0), axis=-1, keepdims=True)
    return jnp.broadcast_to(picked, (r_tile, s, out_lanes))


def _shift_up(x, k, s):
    """Along the sample (sublane) axis of ``[R_T, S, 128]``: out_s = x_{s+k}
    (zero beyond the end). pltpu.roll is circular and rejects negative
    shifts, so shift by S - k and mask."""
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(sub < s - k, pltpu.roll(x, s - k, axis=1), 0.0)


def _tri_matmul_sub(x3, s, *, upper: bool):
    """Strictly-triangular matmul along the sample (sublane) axis of
    ``[R_T, S, 128]``: exclusive cumulative sum (``upper=False``) or strict
    suffix sum (``upper=True``).

    Runs on the MXU as batched ``[S, S] @ [S, 128]`` contractions per ray
    instead of the round-2 Hillis-Steele shift chain — ~2·log2(S)
    full-tensor VPU passes collapse into ~1% of the tile's matmul FLOPs
    (the dominant kernel overhead in the round-2 profile).

    Precision: the 0/1 triangular operand is exact in bfloat16, but a
    single default-precision dot would round each x term to bf16
    (measured 4e-4 relative cumsum error — a multi-percent transmittance
    error at optical depth ~10, vs the f32 quadrature policy of
    docs/DESIGN.md). Instead x is split into two exact bf16 pieces
    (hi + residual — together ~16 mantissa bits) and contracted with TWO
    default-precision dots accumulated in f32: ~1.5e-5 relative error at
    one third the passes of a HIGHEST-precision f32 dot (measured: the
    HIGHEST form cost ~20 ms/step end-to-end)."""
    r_tile = x3.shape[0]
    shape = (r_tile, s, s)
    sub = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    tri = ((lane > sub) if upper else (lane < sub)).astype(jnp.bfloat16)
    x_hi = x3.astype(jnp.bfloat16)
    x_lo = (x3 - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((2,), (1,)), ((0,), (0,)))
    return (jax.lax.dot_general(tri, x_hi, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(tri, x_lo, dims,
                                  preferred_element_type=jnp.float32))


_BIG = 3.0e38  # finite +/- sentinel for masked min/max (avoids inf lowering)

# Marks "merge the draws with the CDF-source depths themselves" in
# fused_train_chunk's sample_inputs (the exact hierarchical path).
_SELF_MERGE = object()


def _prefix_sum_sub(x3, s):
    """Inclusive cumulative sum along the sample (sublane) axis of
    ``[R_T, S, 128]`` — f32 Hillis-Steele (log2(S) roll+add passes).

    Used where the summands' scale is unknown a priori (the sampling
    CDF over raw weights): unlike :func:`_tri_matmul_sub`'s two-piece
    bf16 MXU contraction (~1.5e-5 relative), this is plain f32
    parallel-prefix arithmetic — the same error class as XLA's
    ``jnp.cumsum`` — so the in-kernel CDF cannot amplify through the
    inverse-CDF's ``denom >= 1e-5`` clamp.
    """
    sub = jax.lax.broadcasted_iota(jnp.int32, x3.shape, 1)
    acc = x3
    k = 1
    while k < s:
        acc = acc + jnp.where(sub >= k, pltpu.roll(acc, k, axis=1), 0.0)
        k *= 2
    return acc


def _sample_merge_prologue(cp128, w128, u128, r_tile, s_c, n,
                           mp128=None, s_m=-1):
    """In-kernel hierarchical sampling: inverse-CDF draw + rank merge.

    The fine pass's prologue — replaces the XLA-side
    ``sample_pdf_sorted`` + ``merge_sorted`` chain
    (`ops/sampling.py`; reference `keras_nerf/model/nerf/utils.py:61-97`,
    `nerf.py:182-191`) with the same math on VMEM-resident tiles, and
    produces the merged depths DIRECTLY in the lane-replicated
    ``[R_T, S_c + N, 128]`` layout every downstream consumer wants (the
    separate O(S^2) :func:`_replicate_lanes` pass over the merged depths
    disappears too).

    Args:
      cp128: ``[r_tile, 128]`` f32 — sorted CDF-source depths in lanes
        ``< s_c`` (their midpoints form the inverse-CDF bins), ``+_BIG``
        in the padding lanes (pushes phantom merge ranks past every real
        slot when they double as the merge partner).
      w128: ``[r_tile, 128]`` f32 — bin weights in lanes ``< s_c``
        (padding lanes ignored).
      u128: ``[r_tile, 128]`` f32 — SORTED uniform draws in lanes
        ``< n``, ``2.0`` in the padding lanes.
      mp128/s_m: the merge partner. ``s_m == -1`` (default) merges with
        ``cp128`` itself — the exact hierarchical path (`nerf.py:190-191`).
        ``s_m == 0`` skips the merge: the sorted draws ARE the output
        (the occupancy-train tier's no-merge mode). ``s_m > 0`` merges
        with ``mp128`` (``[r_tile, 128]`` f32, real depths in lanes
        ``< s_m``, ``+_BIG`` padding) — the occupancy-train tier's
        stratified-merge mode, where the CDF source (probe bins) differs
        from the merge partner (the stratified coarse depths).

    Returns:
      ``[r_tile, s_out, 128]`` f32 sorted depths, replicated across
      lanes; ``s_out = n`` (no merge) or partner size + ``n``.

    Math parity with the XLA chain (`ops/sampling.py: invert_cdf`): the
    65-entry 0-prepended CDF is realized as the s_c exclusive prefix
    sums (entries 0..s_c-1) — the final entry (the total, ~1) can never
    be a "below" candidate for u < 1 and equals the clamp value the
    reference uses when no entry exceeds u, so both layouts compute
    identical below/above brackets. Midpoints are edge-padded exactly
    like the reference's two-past-the-end clamp resolves.
    """
    lane2 = _lane_iota(cp128.shape)
    cp = cp128[:, :s_c]                              # [r, s_c] lanes
    wp = w128[:, :s_c] + 1e-5

    # CDF in the [r, s_c(sub), 128] layout: replicate bins onto
    # sublanes once, then an exclusive f32 prefix sum.
    wp3 = _replicate_lanes(wp)                       # [r, s_c, 128]
    total_w3 = jnp.sum(wp3, axis=1, keepdims=True)
    pdf3 = wp3 / total_w3
    incl3 = _prefix_sum_sub(pdf3, s_c)
    cdf3 = incl3 - pdf3                              # exclusive prefix
    total = jnp.max(incl3, axis=1)                   # [r, 128] (~1.0)

    # Bin midpoints, edge-padded onto the s_c sublane entries.
    cp3 = _replicate_lanes(cp)                       # [r, s_c, 128]
    sub = jax.lax.broadcasted_iota(jnp.int32, cp3.shape, 1)
    mids_raw = 0.5 * (cp3 + _shift_up(cp3, 1, s_c))
    interior = sub < s_c - 1
    mids_last3 = jnp.max(jnp.where(interior, mids_raw, -_BIG),
                         axis=1, keepdims=True)
    mids3 = jnp.where(interior, mids_raw, mids_last3)
    mids_last = jnp.max(mids3, axis=1)               # [r, 128]

    # Inverse CDF: bracket each draw by masked sublane reductions.
    u = u128[...]
    le3 = cdf3 <= u[:, None, :]                      # [r, s_c, 128]
    cdf_below = jnp.max(jnp.where(le3, cdf3, -_BIG), axis=1)
    cdf_above = jnp.min(jnp.where(le3, _BIG, cdf3), axis=1)
    cdf_above = jnp.where(cdf_above >= 0.5 * _BIG, total, cdf_above)
    bins_below = jnp.max(jnp.where(le3, mids3, -_BIG), axis=1)
    bins_above = jnp.min(jnp.where(le3, _BIG, mids3), axis=1)
    bins_above = jnp.where(bins_above >= 0.5 * _BIG, mids_last,
                           bins_above)
    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    fine_t = bins_below + t * (bins_above - bins_below)  # [r, 128] sorted
    if s_m == 0:
        # No merge: the draws are already sorted (monotone CDF inversion
        # of sorted u) — replicate them straight into the sample layout.
        return _replicate_lanes(fine_t[:, :n])
    # Phantom draw lanes (n < 128) get +_BIG so their merge ranks fall
    # past every real output slot.
    fine_t = jnp.where(lane2 < n, fine_t, _BIG)

    if s_m == -1:
        mp128, mp3, s_m = cp128, cp3, s_c
    else:
        mp3 = _replicate_lanes(mp128[:, :s_m])       # [r, s_m, 128]

    # Rank merge (ops/sampling.py: merge_sorted — same tie-break: a
    # partner depth precedes an equal fine depth).
    s_total = s_m + n
    fine3 = _replicate_lanes(fine_t)                 # [r, 128, 128]
    cnt_c = jnp.sum(jnp.where(fine3 < mp128[:, None, :], 1.0, 0.0),
                    axis=1)                          # [r, 128]
    rank_c = lane2.astype(jnp.float32) + cnt_c
    cnt_f = jnp.sum(jnp.where(mp3 <= fine_t[:, None, :], 1.0, 0.0),
                    axis=1)                          # [r, 128]
    rank_f = lane2.astype(jnp.float32) + cnt_f

    slot = jax.lax.broadcasted_iota(
        jnp.int32, (r_tile, s_total, LANE), 1).astype(jnp.float32)
    picked_c = jnp.sum(
        jnp.where(rank_c[:, None, :] == slot, mp128[:, None, :], 0.0),
        axis=-1, keepdims=True)
    picked_f = jnp.sum(
        jnp.where(rank_f[:, None, :] == slot, fine_t[:, None, :], 0.0),
        axis=-1, keepdims=True)
    return jnp.broadcast_to(picked_c + picked_f, (r_tile, s_total, LANE))


def _quadrature_fwd(rgb3, sigma_b, delta3, r_tile, s,
                    white_background: bool):
    """Volume rendering on lane-replicated ray tiles.

    Every per-sample scalar (sigma, alpha, transmittance, weights) lives
    replicated across all 128 lanes of a ``[R_T, S, 128]`` tensor — rgb
    rides in lanes 0..2, reductions are sublane ops, and NO lane<->sublane
    shape cast ever happens (Mosaic cannot lower ``[T, 1] <-> [R_T, S]``
    casts; the round-1 v3 kernel lost to exactly this relayout).

    Semantics match `ops/rendering.py: render_rays` (reference
    `utils.py:17-58`): eps-padded last delta (delta3 arrives padded from
    XLA), exclusive-product transmittance, white completion, clip — with
    ONE deliberate reformulation: transmittance is computed EXACTLY as
    ``T_s = exp(-sum_{i<s} sigma_i delta_i)`` (an MXU cumulative sum of
    optical depth, :func:`_tri_matmul_sub`) instead of the reference's
    running product of ``1 - alpha + 1e-10``. The two differ by at most a
    factor ``(1 + eps/e_i)`` per sample — a ~1e-10-relative stabilizer
    artifact, orders below the MLP's own bf16 matmul noise — and the exact
    form needs no epsilon at all: the backward has NO division (the
    round-2 ``suffix / y`` saturation hazard and its interpret-mode
    constant-folding NaN are gone by construction).
    """
    x = sigma_b * delta3                          # per-sample optical depth
    if _ABL == "noquad":
        e = x
        trans = x
        weights = x
    elif _ABL == "notri":
        e = jnp.exp(-x)
        trans = jnp.exp(-x)
        weights = (1.0 - e) * trans
    else:
        e = jnp.exp(-x)
        alpha = 1.0 - e
        trans = jnp.exp(-_tri_matmul_sub(x, s, upper=False))
        weights = alpha * trans                   # [R_T, S, 128] replicated

    image_raw = jnp.sum(weights * rgb3, axis=1)   # [R_T, 128], lanes 0..2
    lane = _lane_iota(image_raw.shape)
    if white_background:
        wsum = jnp.sum(weights, axis=1)
        image_raw = image_raw + (1.0 - wsum)
    pre_clip = jnp.where(lane < 3, image_raw, 0.0)
    image = jnp.clip(pre_clip, 0.0, 1.0)
    return image, weights, (e, trans, pre_clip)


def _depth_lane3(weights, t3, image):
    """depth = sum_s w_s t_s, packed into lane 3 of the image tile
    (reference `utils.py:51`; depth carries no gradient)."""
    depth = jnp.sum(weights * t3, axis=1)         # [R_T, 128] replicated
    lane = _lane_iota(image.shape)
    return jnp.where(lane == 3, depth, image)


def _quadrature_bwd(d_image, rgb3, weights, delta3, quad_state,
                    r_tile, s, white_background: bool):
    """Hand-derived backward of :func:`_quadrature_fwd`.

    With ``x_s = sigma_s delta_s``, ``T_s = exp(-sum_{i<s} x_i)`` and
    ``w_s = (1 - e^{-x_s}) T_s``:
    ``dL/dx_s = e_s T_s d_w_s - sum_{j>s} w_j d_w_j`` (the suffix sum runs
    on the MXU, :func:`_tri_matmul_sub`) and ``d_sigma_s = delta_s dL/dx_s``
    — division-free, so saturated samples (e -> 0) cannot produce inf/NaN.

    Returns ``(d_rgb3 [R_T, S, 128] lanes 0..2, d_sigma3 replicated)``.
    """
    e, trans, pre_clip = quad_state
    # clip backward, matching XLA autodiff's subgradient convention: 1
    # inside (0, 1), 0.5 at EXACT saturation, 0 outside. Exact saturation
    # is systematic, not measure-zero — a ray whose density collapsed to 0
    # renders pre_clip == 1.0 exactly on white background — and a strict
    # (0, 1) mask would zero its gradient forever (dead pixel), diverging
    # from the XLA path (guarded by
    # test_saturated_pixel_gradient_matches_xla).
    inside = jnp.logical_and(pre_clip > 0.0, pre_clip < 1.0)
    boundary = jnp.logical_or(pre_clip == 0.0, pre_clip == 1.0)
    d_pre = jnp.where(inside, d_image,
                      jnp.where(boundary, 0.5 * d_image, 0.0))

    d_pre3 = d_pre[:, None, :]
    d_rgb3 = weights * d_pre3
    # d_w = rgb . d_img per sample (replicated via lane reduce+broadcast).
    d_w = jnp.broadcast_to(
        jnp.sum(rgb3 * d_pre3, axis=-1, keepdims=True), weights.shape)
    if white_background:
        d_w = d_w - jnp.broadcast_to(
            jnp.sum(d_pre3, axis=-1, keepdims=True), weights.shape)

    if _ABL == "noquad":
        d_x = d_w
    elif _ABL == "notri":
        d_x = e * trans * d_w
    else:
        suffix = _tri_matmul_sub(weights * d_w, s, upper=True)
        d_x = e * trans * d_w - suffix
    d_sigma3 = d_x * delta3
    return d_rgb3, d_sigma3


def _train_chunk_kernel(config: MLPConfig, last_skip: bool,
                        white_background: bool, r_tile: int, s: int,
                        inv_n3: float, with_grad: bool, emit_weights: bool,
                        sigma_only: bool, sample_cfg: tuple | None,
                        quantized: bool,
                        base_ref, slope_ref, points_ref, masks_ref, *refs):
    """Per-ray-tile fused train kernel.

    Inputs: per-ray encoding coefficients base/slope [r_tile, 128] f32
    (``rep = base + t * slope`` reproduces every positional-encoding
    argument — the p = o + t d expansion folded into the selection matmul),
    points [r_tile, S] f32, masks [8, 128] f32 (raw/sin/cos lane selectors),
    (target [r_tile, 128] f32 when with_grad), packed weights. The encoding
    AND the sample intervals are derived IN-kernel, so per chunk only a few
    MB stream in instead of the ~300 MB of XLA-materialized enc/delta
    tensors (measured ~3.5 ms/chunk of pure broadcast/convert fusions).

    Outputs: image [r_tile, 128] f32 (lanes 0..2, depth in lane 3), compact
    weights [r_tile, S_pad] f32, (packed gradient accumulators when
    with_grad).
    """
    if sample_cfg is not None:
        # Fused hierarchical sampling: points_ref carries the CDF-source
        # depths (padded to 128 lanes) and the next two refs the bin
        # weights + sorted uniform draws; a distinct merge partner
        # (occupancy-train's stratified-merge mode) rides one more ref.
        w128_ref, u128_ref = refs[0], refs[1]
        refs = refs[2:]
        mp128_ref = None
        if sample_cfg[2] > 0:
            mp128_ref = refs[0]
            refs = refs[1:]
    if with_grad:
        target_ref = refs[0]
        refs = refs[1:]
    if quantized:
        from keras_nerf_tpu.kernels.quantize import unflatten_quantized
        w, out_refs = unflatten_quantized(config, last_skip, refs)
    else:
        w, out_refs = _unflatten_packed(config, last_skip, refs)
    image_ref = out_refs[0]
    weights_ref = out_refs[1] if emit_weights else None
    if with_grad:
        d, _ = _unflatten_packed(
            config, last_skip, out_refs[2 if emit_weights else 1:])

    # ---- in-kernel (sampling +) encoding + sample intervals --------------
    if sample_cfg is not None:
        s_c, n_fine, s_m = sample_cfg
        t3 = _sample_merge_prologue(
            points_ref[...], w128_ref[...], u128_ref[...], r_tile, s_c,
            n_fine, mp128_ref[...] if mp128_ref is not None else None, s_m)
    elif _ABL == "norep":
        t3 = points_ref[0, 0] * jnp.ones((r_tile, s, LANE), jnp.float32)
    else:
        t3 = _replicate_lanes(points_ref[...])           # [r_tile, S, 128]
    rep = (base_ref[...][:, None, :]
           + t3 * slope_ref[...][:, None, :])
    mm = masks_ref[...]
    # One transcendental instead of two: cos(x) = sin(x + pi/2); the phase
    # add costs <= 1 ulp of |rep|, far below the bf16 output quantization.
    rep_shift = rep + (np.pi / 2) * mm[2:3, :][None]
    # Explicit 2-pi range reduction before the in-kernel sin: arguments
    # reach 2^(L-1) * |x| (~3000 rad at L=10) where a hardware polynomial
    # approximation cannot be trusted without it (DESIGN.md precision
    # policy; the raw-coordinate lanes use the unreduced rep).
    two_pi = 2.0 * np.pi
    if _ABL == "noenc":
        enc3 = jnp.broadcast_to(base_ref[...][:, None, :],
                                (r_tile, s, LANE))
    elif _ABL == "nosin":
        enc3 = (mm[0:1, :] + mm[1:2, :] + mm[2:3, :])[None] * rep_shift
    else:
        rep_red = rep_shift - two_pi * jnp.round(rep_shift * (1.0 / two_pi))
        enc3 = (mm[0:1, :][None] * rep
                + (mm[1:2, :] + mm[2:3, :])[None] * _sin_poly(rep_red))
    enc_f32 = enc3.reshape(r_tile * s, LANE)
    enc = enc_f32.astype(jnp.bfloat16)

    sub = jax.lax.broadcasted_iota(jnp.int32, t3.shape, 1)
    delta3 = jnp.where(sub < s - 1, _shift_up(t3, 1, s) - t3, 1e-10)

    if quantized:
        # int8 render tier: W8A8 MXU trunk with static calibrated
        # scales (kernels/quantize.py) — no-grad path only.
        from keras_nerf_tpu.kernels.quantize import forward_core_int8
        rgb_pre, sigma_pre, acts = forward_core_int8(
            config, last_skip, enc_f32, w, sigma_only=sigma_only)
    else:
        rgb_pre, sigma_pre, acts = _forward_core(
            config, last_skip, enc, w, keep_acts=with_grad,
            sigma_only=sigma_only)

    if sigma_only:
        # Density-only render pass: weights + depth, no color. The weights
        # math is identical to _quadrature_fwd's (same tri-matmul
        # transmittance); the image/white-bg/clip lanes are never built.
        lane = _lane_iota(sigma_pre.shape)
        sigma_b = _lane_bcast(
            jnp.maximum(jnp.where(lane == 0, sigma_pre, 0.0), 0.0)
        ).reshape(r_tile, s, LANE)
        x = sigma_b * delta3
        weights = (1.0 - jnp.exp(-x)) * jnp.exp(
            -_tri_matmul_sub(x, s, upper=False))
        depth = jnp.sum(weights * t3, axis=1)        # [r_tile, 128]
        image_ref[...] = jnp.where(_lane_iota(depth.shape) == 3, depth, 0.0)
        w_sub = jax.lax.broadcasted_iota(jnp.int32, weights.shape, 1)
        w_lane = _lane_iota(weights.shape)
        for k in range(0, s, LANE):
            weights_ref[:, k:k + LANE] = jnp.sum(
                jnp.where(w_sub == w_lane + k, weights, 0.0), axis=1)
        return

    rgb = jax.nn.sigmoid(rgb_pre)
    lane = _lane_iota(rgb.shape)
    rgb3 = jnp.where(lane < 3, rgb, 0.0).reshape(r_tile, s, LANE)
    # sigma lives in lane 3... lane 0 of sigma_pre; replicate across lanes.
    sigma_b = _lane_bcast(
        jnp.maximum(jnp.where(lane == 0, sigma_pre, 0.0), 0.0)
    ).reshape(r_tile, s, LANE)

    image, weights, quad_state = _quadrature_fwd(
        rgb3, sigma_b, delta3, r_tile, s, white_background)

    image_ref[...] = _depth_lane3(weights, t3, image)
    if emit_weights:
        # COMPACT [r_tile, S] output (S on lanes): each sample's
        # lane-replicated weight is picked onto its own lane by a diagonal
        # select + sublane reduce, one pass per 128-lane chunk. The round-2
        # kernel wrote the full replicated [r_tile*S, 128] f32 tensor —
        # 128x the information content, ~134 MB of HBM write per 4096-ray
        # coarse chunk — only for lane 0 to be read back.
        w_sub = jax.lax.broadcasted_iota(jnp.int32, weights.shape, 1)
        w_lane = _lane_iota(weights.shape)
        for k in range(0, s, LANE):
            picked = jnp.sum(
                jnp.where(w_sub == w_lane + k, weights, 0.0), axis=1)
            weights_ref[:, k:k + LANE] = picked

    if not with_grad:
        return

    # MSE cotangent: d image = 2 (image - target) / (R_chunk * 3), computed
    # against the CLIPPED image exactly like the XLA loss.
    out_lane = _lane_iota(image.shape)
    d_image = jnp.where(out_lane < 3,
                        (image - target_ref[...]) * inv_n3, 0.0)

    d_rgb3, d_sigma3 = _quadrature_bwd(
        d_image, rgb3, weights, delta3, quad_state, r_tile, s,
        white_background)

    g_rgb128 = d_rgb3.reshape(r_tile * s, LANE)
    # Place the (replicated) sigma cotangent in lane 0 only; the shared
    # backward core applies relu' via (sigma_pre > 0).
    d_sigma128 = d_sigma3.reshape(r_tile * s, LANE)
    g_sigma128 = jnp.where(lane == 0, d_sigma128, 0.0)

    _backward_core(config, last_skip, enc, g_rgb128, g_sigma128,
                   (rgb, sigma_pre, acts), w, d)


def _pick_r_tile(num_rays: int, s: int, target_points: int) -> int:
    """Largest ray tile with r_tile * S ~<= target_points that divides the
    chunk's ray count. Mosaic block shapes need the sublane dim divisible
    by 8 (or equal to the full dim), so tiles are multiples of 8 unless the
    whole chunk becomes one block."""
    if num_rays <= 8 or num_rays % 8:
        return num_rays
    r = max(8, min(num_rays, target_points // max(s, 1)))
    r -= r % 8
    while r > 8 and (num_rays % r or (r * s) % 16):
        r -= 8
    return r if num_rays % r == 0 else num_rays


@functools.partial(
    jax.jit,
    static_argnames=("config", "pos_emb_xyz", "pos_emb_dir",
                     "white_background", "with_grad", "emit_weights",
                     "sigma_only", "quantized", "interpret"))
def fused_train_chunk(
    packed: dict,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    points: jnp.ndarray | None,
    target: jnp.ndarray | None,
    config: MLPConfig,
    pos_emb_xyz: int = 10,
    pos_emb_dir: int = 4,
    white_background: bool = False,
    with_grad: bool = True,
    emit_weights: bool = True,
    sigma_only: bool = False,
    sample_inputs: tuple | None = None,
    quantized: bool = False,
    interpret: bool | None = None,
):
    """One model's fused encode+forward+render(+backward) over a ray chunk.

    ``emit_weights=False`` skips the compact [R, S] weights output — the
    fine TRAIN pass never consumes it.

    ``sigma_only`` (render only: requires ``not with_grad`` and
    ``emit_weights``) skips the color heads and the image quadrature —
    the returned image tensor carries depth only (rgb lanes are zero).
    Exact for the render path's coarse pass, whose only consumers are the
    sampling weights (the reference CLI discards the coarse image,
    `inference.py:63`).

    The flagship kernel: positional encoding, MLP forward, volume-rendering
    quadrature, the MSE loss cotangent AND the full backward all run in ONE
    Pallas kernel per ray tile — activations never leave VMEM and there is
    no recompute pass (the autodiff path runs forward twice: once for the
    loss, once inside the backward's rematerialization). Host-side inputs
    are per-RAY only (a few MB per chunk): two tiny selection matmuls turn
    (o, d) into per-ray encoding coefficients and the kernel derives every
    per-point quantity itself.

    Args:
      packed: :func:`pack_mlp_params` output.
      origin/direction: ``[R, 3]`` f32 rays.
      points: ``[R, S]`` f32 sorted depths.
      target: ``[R, 3]`` f32 ground-truth rgb (required when with_grad).

    Returns:
      ``(image [R, 3], depth [R], weights [R, S])`` plus, when ``with_grad``,
      the packed gradient dict of ``mean((image - target)**2)`` over the
      chunk — the exact per-chunk loss the engine accumulates
      (`nerf.py:366-388`).
    """
    if interpret is None:
        interpret = _default_interpret()
    if sigma_only:
        assert not with_grad and emit_weights, (
            "sigma_only is a render-path mode: no gradients, weights out")
    if sample_inputs is not None:
        # Fused hierarchical sampling (the fine pass): inverse-CDF +
        # rank merge run in the kernel prologue off the coarse pass's
        # compact weights; only the tiny sorted uniform draws come from
        # XLA (RNG-stream parity with ops/sampling.py:
        # sorted_uniforms). `points` must be None. A 4-tuple
        # ``(cdf_points, weights, u, merge_points)`` separates the CDF
        # source from the merge partner (the occupancy-train tier:
        # probe bins feed the CDF, the stratified coarse depths — or
        # nothing, when ``merge_points is None`` — get merged in).
        assert points is None
        if len(sample_inputs) == 3:
            cp, wc, u = sample_inputs
            mp = _SELF_MERGE
        else:
            cp, wc, u, mp = sample_inputs
        r, s_c = cp.shape
        n_fine = u.shape[1]
        if mp is _SELF_MERGE:
            s_m, s = -1, s_c + n_fine
        elif mp is None:
            s_m, s = 0, n_fine
        else:
            s_m = mp.shape[1]
            s = s_m + n_fine
        assert s_c <= LANE and n_fine <= LANE and s_m <= LANE, (
            "fused sampling needs bins, draws and merge partner <= 128")
        sample_cfg = (s_c, n_fine, s_m)
    else:
        r, s = points.shape
        sample_cfg = None
    import os as _os
    _tgt = int(_os.environ.get("KNT_GRAD_TILE" if with_grad else
                               "KNT_FWD_TILE", "1024" if with_grad
                               else "4096"))
    r_tile = _pick_r_tile(r, s, _tgt)
    grid = r // r_tile
    last_skip = (config.n_layers - 1) in set(config.skip_indices())
    if quantized:
        # `packed` is a kernels/quantize.py quantize_packed dict
        # (int8 weights + f32 scale vectors); no-grad path only.
        assert not with_grad, "quantized is a render-tier mode"
        from keras_nerf_tpu.kernels.quantize import flatten_quantized
        weight_args = flatten_quantized(packed)
    else:
        weight_args = _flatten_packed(packed)
    inv_n3 = 2.0 / (r * 3)

    base, slope, masks = ray_encoding_coeffs(origin, direction,
                                             pos_emb_xyz, pos_emb_dir)
    masks8 = jnp.asarray(np.pad(masks, ((0, 5), (0, 0))))  # sublane pad

    s_pad = _round_up(s, LANE)  # compact weights output, lane-padded
    ray_spec = pl.BlockSpec((r_tile, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [ray_spec, ray_spec]
    operands = [base, slope]
    if sample_cfg is not None:
        # Coarse depths padded with +_BIG (phantom merge ranks land past
        # every real slot), weights zero-padded, draws padded with 2.0
        # (> any u — phantom draws are masked in the prologue).
        cp128 = jnp.pad(cp.astype(jnp.float32),
                        ((0, 0), (0, LANE - s_c)), constant_values=_BIG)
        w128 = jnp.pad(wc.astype(jnp.float32),
                       ((0, 0), (0, LANE - wc.shape[1])))
        u128 = jnp.pad(u.astype(jnp.float32),
                       ((0, 0), (0, LANE - n_fine)), constant_values=2.0)
        in_specs += [ray_spec, _const_spec(masks8), ray_spec, ray_spec]
        operands += [cp128, masks8, w128, u128]
        if s_m > 0:
            mp128 = jnp.pad(mp.astype(jnp.float32),
                            ((0, 0), (0, LANE - s_m)),
                            constant_values=_BIG)
            in_specs.append(ray_spec)
            operands.append(mp128)
    else:
        in_specs += [
            pl.BlockSpec((r_tile, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(masks8),
        ]
        operands += [points.astype(jnp.float32), masks8]
    if with_grad:
        target128 = jnp.pad(target.astype(jnp.float32),
                            ((0, 0), (0, LANE - target.shape[1])))
        in_specs.append(
            pl.BlockSpec((r_tile, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM))
        operands.append(target128)
    in_specs += [_const_spec(a) for a in weight_args]
    operands += weight_args

    out_shapes = [jax.ShapeDtypeStruct((r, LANE), jnp.float32)]
    out_specs = [pl.BlockSpec((r_tile, LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if emit_weights:
        out_shapes.append(jax.ShapeDtypeStruct((r, s_pad), jnp.float32))
        out_specs.append(pl.BlockSpec((r_tile, s_pad), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    if with_grad:
        grad_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                       for a in weight_args]
        out_shapes += grad_shapes
        out_specs += [_const_spec(sh) for sh in grad_shapes]

    outs = pl.pallas_call(
        functools.partial(
            _train_chunk_kernel, config, last_skip, white_background,
            r_tile, s, inv_n3, with_grad, emit_weights, sigma_only,
            sample_cfg, quantized),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The v5e core has far more physical VMEM than the conservative
            # 16 MB default scoped limit; the fine pass (r_tile=8, S=192)
            # legitimately keeps ~24 MB of activations + accumulators live.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    image = outs[0][:, :3]
    depth = outs[0][:, 3]
    weights = outs[1][:, :s] if emit_weights else None
    if not with_grad:
        return image, depth, weights
    d_packed, _ = _unflatten_packed(
        config, last_skip, list(outs[2 if emit_weights else 1:]))
    return image, depth, weights, d_packed
