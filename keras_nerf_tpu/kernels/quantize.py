"""int8 quantization for the fused RENDER kernels (opt-in tier).

Post-training W8A8 quantization of the NeRF MLP for novel-view
rendering: int8 MXU matmuls run ~1.57x the bf16 chain on this part
(237.9 vs 151.6 TFLOPS with the full static-scale epilogue —
`scripts/profile_mxu_ceiling.py` class measurement), which is the only
lever past the exact-math render ceiling (docs/DESIGN.md "Render
roofline"). Training and eval math are untouched — this mirrors the
`--fast_render` contract: an opt-in flag with a measured PSNR delta
(`scripts/quantize_sim_ptq.py`).

Scheme (validated by the fake-quant simulation before the kernel was
built — point-level errors on the trained quality128 model: rgb 0.0034,
sigma 1.7% relative on-object):

* SmoothQuant-style per-feature balancing ``m_k = sqrt(act_amax_k /
  weight_amax_k)`` folded into the weights, then per-TENSOR activation
  scales and per-output-CHANNEL weight scales — all static, calibrated
  once per checkpoint on real scene points;
* int8 x int8 -> int32 MXU accumulation (exact);
* f32 epilogue per layer: dequant (one lane-vector multiply) + bias +
  relu + requantize (one lane-vector multiply + round + clip);
* the sigma/rgb head outputs stay f32; quadrature is untouched.

Layout mirrors :func:`keras_nerf_tpu.kernels.ray_march.pack_mlp_params`
(block-permuted encoding rows, split matmuls at skip concats, fused
sigma/features matmul) so the int8 forward core is a drop-in for the
bf16 one. Reference semantics: `keras_nerf/model/nerf/mlp.py:29-50`
(note `rgb_features` is LINEAR — no relu — before the rgb head).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from keras_nerf_tpu.models.mlp import MLPConfig

LANE = 128


def _amax(x, axis):
    return jnp.max(jnp.abs(x), axis=axis)


def collect_act_amax(packed: dict, enc128: jnp.ndarray, config: MLPConfig,
                     last_skip: bool) -> dict:
    """Per-feature activation amax over calibration points.

    Runs the f32/bf16 packed forward (`ray_march._forward_core`) on a
    ``[P, 128]`` block-encoded calibration batch and records the amax of
    every quantization site's input: the encoding, each trunk output,
    the features slice and the rgb_features output.
    """
    from keras_nerf_tpu.kernels.ray_march import _forward_core

    enc = enc128.astype(jnp.float32)
    # keep_acts returns (h_list, features, rf)
    _, _, acts = _forward_core(config, last_skip, enc.astype(jnp.bfloat16),
                               packed, keep_acts=True)
    h_list, features, rf = acts
    out = {"enc": _amax(enc, 0)}
    for i, h in enumerate(h_list):
        out[f"h{i}"] = _amax(h.astype(jnp.float32), 0)
    out["features"] = _amax(features.astype(jnp.float32), 0)
    out["rf"] = _amax(rf.astype(jnp.float32), 0)
    return out


def _quantize_matmul(w, s_in):
    """SmoothQuant-fold one matmul: ``(Wq int8 [fan, out], dequant u
    [1, out] f32, input requant r [1, fan] f32)`` with
    ``x @ W ~= (round(x * r) @ Wq) * u`` for ``|x| <~ s_in``."""
    w = w.astype(jnp.float32)
    w_amax = _amax(w, 1)                           # [fan]
    valid = w_amax > 0                             # padding rows stay dead
    m = jnp.sqrt(jnp.maximum(s_in, 1e-8) / jnp.maximum(w_amax, 1e-8))
    s_t = jnp.max(jnp.where(valid, s_in / m, 0.0))
    s_t = jnp.maximum(s_t, 1e-8)
    r = jnp.where(valid, 127.0 / (m * s_t), 0.0)
    w_eff = w * (m * (s_t / 127.0))[:, None]
    u = jnp.maximum(_amax(w_eff, 0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w_eff / u), -127, 127).astype(jnp.int8)
    return wq, u[None, :], r[None, :]


def quantize_packed(packed: dict, act_amax: dict, config: MLPConfig,
                    last_skip: bool) -> dict:
    """Quantize a :func:`pack_mlp_params` dict into the int8 render
    layout. jnp-traceable; biases pass through unchanged (f32)."""
    n = config.n_layers

    trunk_w, trunk_u = [], []
    trunk_r = [None] * n
    trunk_enc_w, trunk_enc_u, enc_r = [], [], []
    for i in range(n):
        s_in = act_amax["enc"] if i == 0 else act_amax[f"h{i - 1}"]
        wq, uu, r = _quantize_matmul(packed["trunk_w"][i], s_in)
        trunk_w.append(wq)
        trunk_u.append(uu)
        # r quantizes this matmul's INPUT: the encoding for layer 0
        # (stored as enc_r[0]), h_{i-1} otherwise (stored on the
        # PRODUCING layer index — the requant runs where h is made).
        if i == 0:
            enc_r.append(r)
        else:
            trunk_r[i - 1] = r
            enc_r.append(None)
        if packed["trunk_enc_w"][i] is not None:
            ewq, euu, er = _quantize_matmul(packed["trunk_enc_w"][i],
                                            act_amax["enc"])
            trunk_enc_w.append(ewq)
            trunk_enc_u.append(euu)
            enc_r[i] = er
        else:
            trunk_enc_w.append(None)
            trunk_enc_u.append(None)

    # sigma/features fused head: consumes h_{n-1}. Quantized as ONE fold
    # (one input requant for h_{n-1}), then split into separate
    # features/sigma tensors — int32 accumulation is exact, so two dots
    # over the split columns equal the fused dot bit-for-bit, and the
    # kernel never lane-slices a [1, N] scale vector (real Mosaic rejects
    # broadcasting lane-offset slices: "Invalid input layout"; interpret
    # mode masked it).
    u_units = config.dense_units
    w_sf_q, u_sf, r_last = _quantize_matmul(packed["w_sf"],
                                            act_amax[f"h{n - 1}"])
    trunk_r[n - 1] = r_last
    w_feat_q, w_sig_q = w_sf_q[:, :u_units], w_sf_q[:, u_units:]
    u_feat, u_sig = u_sf[:, :u_units], u_sf[:, u_units:]
    b_feat, b_sig = packed["b_sf"][:, :u_units], packed["b_sf"][:, u_units:]
    if last_skip and packed["w_sf_enc"] is not None:
        w_sf_enc_q, u_sf_enc, enc_r_sf = _quantize_matmul(
            packed["w_sf_enc"], act_amax["enc"])
        w_feat_enc_q = w_sf_enc_q[:, :u_units]
        w_sig_enc_q = w_sf_enc_q[:, u_units:]
        u_feat_enc, u_sig_enc = u_sf_enc[:, :u_units], u_sf_enc[:, u_units:]
    else:
        w_feat_enc_q = w_sig_enc_q = None
        u_feat_enc = u_sig_enc = enc_r_sf = None

    # rgb_features: split (features-top, enc-dir) matmuls.
    w_rf_top_q, u_rf_top, r_feat = _quantize_matmul(
        packed["w_rf_top"], act_amax["features"])
    w_rf_enc_q, u_rf_enc, enc_r_rf = _quantize_matmul(
        packed["w_rf_enc"], act_amax["enc"])

    # rgb head: consumes rf (LINEAR output — signed, no relu).
    w_rgb_q, u_rgb, r_rf = _quantize_matmul(packed["w_rgb"],
                                            act_amax["rf"])

    # trunk_r entries must be dense for flattening; layers whose output
    # is never requantized do not exist (h_{n-1} feeds w_sf).
    assert all(r is not None for r in trunk_r)

    return {
        "trunk_w": trunk_w, "trunk_u": trunk_u, "trunk_b": packed["trunk_b"],
        "trunk_r": trunk_r,
        "trunk_enc_w": trunk_enc_w, "trunk_enc_u": trunk_enc_u,
        "enc_r": enc_r,                      # per-layer enc requant or None
        "w_feat": w_feat_q, "u_feat": u_feat, "b_feat": b_feat,
        "w_sig": w_sig_q, "u_sig": u_sig, "b_sig": b_sig,
        "w_feat_enc": w_feat_enc_q, "u_feat_enc": u_feat_enc,
        "w_sig_enc": w_sig_enc_q, "u_sig_enc": u_sig_enc,
        "enc_r_sf": enc_r_sf,
        "r_feat": r_feat,
        "w_rf_top": w_rf_top_q, "u_rf_top": u_rf_top,
        "w_rf_enc": w_rf_enc_q, "u_rf_enc": u_rf_enc, "enc_r_rf": enc_r_rf,
        "b_rf": packed["b_rf"], "r_rf": r_rf,
        "w_rgb": w_rgb_q, "u_rgb": u_rgb, "b_rgb": packed["b_rgb"],
    }


def flatten_quantized(q: dict) -> list:
    """Deterministic operand order for pallas_call (skips Nones)."""
    out = list(q["trunk_w"]) + list(q["trunk_u"]) + list(q["trunk_b"]) \
        + list(q["trunk_r"])
    out += [w for w in q["trunk_enc_w"] if w is not None]
    out += [u for u in q["trunk_enc_u"] if u is not None]
    out += [r for r in q["enc_r"] if r is not None]
    out += [q["w_feat"], q["u_feat"], q["b_feat"],
            q["w_sig"], q["u_sig"], q["b_sig"]]
    if q["w_feat_enc"] is not None:
        out += [q["w_feat_enc"], q["u_feat_enc"],
                q["w_sig_enc"], q["u_sig_enc"], q["enc_r_sf"]]
    out += [q["r_feat"], q["w_rf_top"], q["u_rf_top"],
            q["w_rf_enc"], q["u_rf_enc"], q["enc_r_rf"],
            q["b_rf"], q["r_rf"], q["w_rgb"], q["u_rgb"], q["b_rgb"]]
    return out


def unflatten_quantized(config: MLPConfig, last_skip: bool, args):
    """Inverse of :func:`flatten_quantized` over a flat ref/array list."""
    from keras_nerf_tpu.kernels.ray_march import _layer_uses_enc

    n = config.n_layers
    skip = set(config.skip_indices())
    uses = [_layer_uses_enc(i, skip) for i in range(n)]
    it = iter(args)
    trunk_w = [next(it) for _ in range(n)]
    trunk_u = [next(it) for _ in range(n)]
    trunk_b = [next(it) for _ in range(n)]
    trunk_r = [next(it) for _ in range(n)]
    trunk_enc_w = [next(it) if (uses[i] and i > 0) else None
                   for i in range(n)]
    trunk_enc_u = [next(it) if (uses[i] and i > 0) else None
                   for i in range(n)]
    enc_r = [next(it) if uses[i] else None for i in range(n)]
    (w_feat, u_feat, b_feat, w_sig, u_sig, b_sig) = (
        next(it) for _ in range(6))
    if last_skip:
        (w_feat_enc, u_feat_enc, w_sig_enc, u_sig_enc, enc_r_sf) = (
            next(it) for _ in range(5))
    else:
        w_feat_enc = u_feat_enc = w_sig_enc = u_sig_enc = enc_r_sf = None
    (r_feat, w_rf_top, u_rf_top, w_rf_enc, u_rf_enc, enc_r_rf,
     b_rf, r_rf, w_rgb, u_rgb, b_rgb) = (next(it) for _ in range(11))
    rest = list(it)
    return {
        "trunk_w": trunk_w, "trunk_u": trunk_u, "trunk_b": trunk_b,
        "trunk_r": trunk_r,
        "trunk_enc_w": trunk_enc_w, "trunk_enc_u": trunk_enc_u,
        "enc_r": enc_r,
        "w_feat": w_feat, "u_feat": u_feat, "b_feat": b_feat,
        "w_sig": w_sig, "u_sig": u_sig, "b_sig": b_sig,
        "w_feat_enc": w_feat_enc, "u_feat_enc": u_feat_enc,
        "w_sig_enc": w_sig_enc, "u_sig_enc": u_sig_enc,
        "enc_r_sf": enc_r_sf,
        "r_feat": r_feat,
        "w_rf_top": w_rf_top, "u_rf_top": u_rf_top,
        "w_rf_enc": w_rf_enc, "u_rf_enc": u_rf_enc, "enc_r_rf": enc_r_rf,
        "b_rf": b_rf, "r_rf": r_rf,
        "w_rgb": w_rgb, "u_rgb": u_rgb, "b_rgb": b_rgb,
    }, rest


def _quant_act(x, r):
    """f32 activation -> int8 grid via the precomputed requant vector."""
    return jnp.clip(jnp.round(x * r), -127.0, 127.0).astype(jnp.int8)


def _doti8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def forward_core_int8(config: MLPConfig, last_skip: bool, enc, q,
                      sigma_only: bool = False):
    """int8 forward over one ``[T, 128]`` f32 block-encoded tile.

    Drop-in for `ray_march._forward_core` (no-grad path): returns
    ``(rgb_pre [T, 128] f32 | None, sigma_pre [T, 128] f32, None)``.
    Pure jnp — runs identically inside the Pallas kernel and as the
    XLA reference for tests.
    """
    n = config.n_layers

    hq = None
    for i in range(n):
        xq = _quant_act(enc, q["enc_r"][0][...]) if i == 0 else hq
        acc = _doti8(xq, q["trunk_w"][i][...]).astype(jnp.float32) \
            * q["trunk_u"][i][...]
        if i > 0 and q["trunk_enc_w"][i] is not None:
            eq = _quant_act(enc, q["enc_r"][i][...])
            acc = acc + _doti8(
                eq, q["trunk_enc_w"][i][...]).astype(jnp.float32) \
                * q["trunk_enc_u"][i][...]
        h = jnp.maximum(acc + q["trunk_b"][i][...], 0.0)
        hq = _quant_act(h, q["trunk_r"][i][...])

    # sigma and features heads are packed as SEPARATE tensors (split from
    # the one fused fold at pack time, bit-identical) so no ref here is
    # ever lane-sliced — real Mosaic rejects broadcasting lane-offset
    # [1, N] slices ("Invalid input layout").
    last_enc = (last_skip and q["w_sig_enc"] is not None)
    eq_last = _quant_act(enc, q["enc_r_sf"][...]) if last_enc else None

    sigma_pre = _doti8(hq, q["w_sig"][...]).astype(jnp.float32) \
        * q["u_sig"][...]
    if last_enc:
        sigma_pre = sigma_pre + _doti8(
            eq_last, q["w_sig_enc"][...]).astype(jnp.float32) \
            * q["u_sig_enc"][...]
    sigma_pre = sigma_pre + q["b_sig"][...]
    if sigma_only:
        return None, sigma_pre, None

    features = _doti8(hq, q["w_feat"][...]).astype(jnp.float32) \
        * q["u_feat"][...]
    if last_enc:
        features = features + _doti8(
            eq_last, q["w_feat_enc"][...]).astype(jnp.float32) \
            * q["u_feat_enc"][...]
    features = features + q["b_feat"][...]

    fq = _quant_act(features, q["r_feat"][...])
    eq = _quant_act(enc, q["enc_r_rf"][...])
    # rgb_features is LINEAR (`models/mlp.py:139`) — no relu before rgb.
    rf = (_doti8(fq, q["w_rf_top"][...]).astype(jnp.float32)
          * q["u_rf_top"][...]
          + _doti8(eq, q["w_rf_enc"][...]).astype(jnp.float32)
          * q["u_rf_enc"][...]
          + q["b_rf"][...])
    rfq = _quant_act(rf, q["r_rf"][...])
    rgb_pre = _doti8(rfq, q["w_rgb"][...]).astype(jnp.float32) \
        * q["u_rgb"][...] + q["b_rgb"][...]
    return rgb_pre, sigma_pre, None
