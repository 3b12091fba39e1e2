"""Post-training int8 quantization QUALITY GATE for the render tier.

Simulates — exactly, in f32 fake-quant arithmetic — the int8 MLP the
quantized render kernel would execute, and measures the test-set PSNR
delta on a trained checkpoint. Run BEFORE building the kernel: if the
PSNR drop is unacceptable, the kernel is not worth writing.

Quantization scheme (mirrors what the fused kernel can execute at
~238 TOPS with static scales — scripts/profile_mxu_ceiling.py class
measurement):

* activations: per-FEATURE static scales (calibrated amax over real
  scene points), folded into the weight matrix — in-kernel this is one
  lane-constant multiply before each requantize;
* weights: per-output-CHANNEL symmetric int8 (scale applied in the f32
  dequant epilogue);
* accumulation: int32 (exact — simulated in f32, exact below 2^24);
* epilogue per layer: dequant (f32) + bias + relu + requantize; the
  rgb/sigma heads dequantize to f32 and never requantize.

The fake-quant sim rounds to the SAME integer grids the kernel would,
so its outputs equal a real int8 kernel's bit-for-bit up to f32-vs-i32
accumulation order (both exact).

Usage:
  python scripts/quantize_sim_ptq.py --model model/quality128 \
      --data data/synthetic_128 --img_wh 128 [--percentile 99.9]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from keras_nerf_tpu.data.loader import DatasetLoader
from keras_nerf_tpu.models import engine
from keras_nerf_tpu.models.mlp import apply_mlp
from keras_nerf_tpu.ops.encoding import encode_position_and_directions
from keras_nerf_tpu.ops.metrics import psnr
from keras_nerf_tpu.ops.rendering import render_rays
from keras_nerf_tpu.ops.sampling import (
    merge_sorted, midpoints, sample_pdf_sorted)
from keras_nerf_tpu.utils import checkpoint


# ---------------------------------------------------------------------------
# Forward with activation capture (for calibration)
# ---------------------------------------------------------------------------

def forward_collect(params, enc_xyz, enc_dir, config):
    """f32 forward returning the input activation of every dense layer."""
    skip = set(config.skip_indices())
    acts = {}
    x = enc_xyz
    inputs = enc_xyz
    for i, layer in enumerate(params["trunk"]):
        acts[f"trunk{i}"] = x
        x = jax.nn.relu(jnp.dot(x, layer["kernel"]) + layer["bias"])
        if i in skip:
            x = jnp.concatenate([x, inputs], axis=-1)
    acts["sigma"] = x
    acts["features"] = x
    features = jnp.dot(x, params["features"]["kernel"]) \
        + params["features"]["bias"]
    features = jnp.concatenate([features, enc_dir], axis=-1)
    acts["rgb_features"] = features
    # NOTE: rgb_features is LINEAR (no relu) — `models/mlp.py:139`.
    rf = jnp.dot(features, params["rgb_features"]["kernel"]) \
        + params["rgb_features"]["bias"]
    acts["rgb"] = rf
    return acts


def calibrate(params, enc_xyz, enc_dir, config, percentile):
    """Per-feature activation scale (amax or percentile) per dense layer."""
    acts = forward_collect(params, enc_xyz, enc_dir, config)
    scales = {}
    for name, a in acts.items():
        a = jnp.abs(a)
        if percentile >= 100.0:
            s = jnp.max(a, axis=0)
        else:
            s = jnp.percentile(a, percentile, axis=0)
        scales[name] = jnp.maximum(s, 1e-8)
    return scales


# ---------------------------------------------------------------------------
# Fake-quant int8 forward (exact simulation of the kernel's math)
# ---------------------------------------------------------------------------

def _qdense(x, p, s_in, relu, mode="smooth"):
    """One int8 dense: int32 accum, f32 dequant epilogue.

    mode:
      'feature': per-feature act scales folded into W, per-channel W
        quant AFTER folding (naive — act outliers poison the weight
        grids; kept as the measured failure mode);
      'tensor' : ONE act scale (max of s_in), per-channel W quant;
      'smooth' : SmoothQuant alpha=0.5 — fold sqrt(act_amax/w_amax)
        per-feature balancing into W, then per-tensor act + per-channel
        W quant. All epilogues are lane-constant multiplies in-kernel.
    """
    w = p["kernel"]
    if mode == "feature":
        xq = jnp.clip(jnp.round(x / s_in * 127.0), -127, 127)
        w_eff = w * (s_in[:, None] / 127.0)
    else:
        if mode == "smooth":
            w_amax = jnp.maximum(jnp.max(jnp.abs(w), axis=1), 1e-8)
            m = jnp.sqrt(s_in / w_amax)
            m = jnp.maximum(m, 1e-8)
        else:
            m = jnp.ones_like(s_in)
        x_s = x / m
        s_t = jnp.max(s_in / m)          # per-tensor act scale
        xq = jnp.clip(jnp.round(x_s / s_t * 127.0), -127, 127)
        w_eff = (w * m[:, None]) * (s_t / 127.0)
    u = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w_eff / u), -127, 127)
    acc = jnp.dot(xq, wq)            # exact: |acc| < 256*127^2 << 2^24
    out = acc * u + p["bias"]
    return jax.nn.relu(out) if relu else out


def sim_apply_mlp(params, scales, enc_xyz, enc_dir, config, mode="smooth"):
    """int8-simulated apply_mlp (`models/mlp.py:112`), f32 heads out."""
    skip = set(config.skip_indices())
    x = enc_xyz
    inputs = enc_xyz
    for i, layer in enumerate(params["trunk"]):
        x = _qdense(x, layer, scales[f"trunk{i}"], relu=True, mode=mode)
        if i in skip:
            x = jnp.concatenate([x, inputs], axis=-1)
    sigma = jax.nn.relu(_qdense(x, params["sigma"], scales["sigma"],
                                relu=False, mode=mode))
    features = _qdense(x, params["features"], scales["features"],
                       relu=False, mode=mode)
    features = jnp.concatenate([features, enc_dir], axis=-1)
    # rgb_features is LINEAR (no relu) — `models/mlp.py:139`.
    rf = _qdense(features, params["rgb_features"],
                 scales["rgb_features"], relu=False, mode=mode)
    rgb = jax.nn.sigmoid(_qdense(rf, params["rgb"], scales["rgb"],
                                 relu=False, mode=mode))
    return rgb, sigma


# ---------------------------------------------------------------------------
# Render one chunk, coarse+fine, with a pluggable MLP apply
# ---------------------------------------------------------------------------

def render_pair(apply_c, apply_f, o, d, t, key, config):
    def run(apply_fn, points):
        ex, ed = encode_position_and_directions(
            o, d, points, config.pos_emb_xyz, config.pos_emb_dir)
        sh = points.shape
        rgb, sigma = apply_fn(ex.reshape(-1, ex.shape[-1]),
                              ed.reshape(-1, ed.shape[-1]))
        rgb = rgb.reshape(*sh, 3)
        sigma = sigma.reshape(*sh, 1)
        return render_rays(rgb, sigma, points,
                           white_background=config.white_background)

    out_c = run(apply_c, t)
    fine_t = sample_pdf_sorted(key, midpoints(t), out_c.weights,
                               config.n_fine)
    points = merge_sorted(t, fine_t)
    out_f = run(apply_f, points)
    return out_c, out_f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="model/quality128")
    ap.add_argument("--data", default="data/synthetic_128")
    ap.add_argument("--img_wh", type=int, default=128)
    ap.add_argument("--percentile", type=float, default=100.0)
    ap.add_argument("--ray_chunks", type=int, default=16384)
    ap.add_argument("--calib_points", type=int, default=65536)
    ap.add_argument("--mode", default="smooth",
                    choices=["feature", "tensor", "smooth"])
    args = ap.parse_args()

    config = checkpoint.load_model_config(args.model,
                                          white_background=True)
    params_c, params_f = engine.init_params(jax.random.PRNGKey(0), config)
    params_c, params_f = checkpoint.load_weights(args.model, params_c,
                                                 params_f)

    loader = DatasetLoader(args.data, white_background=True)
    _, _, test = loader.load_dataset(
        batch_size=1, image_width=args.img_wh, image_height=args.img_wh,
        near=2.0, far=6.0, n_sample=config.n_coarse)

    # ---- calibration: real scene points through the f32 pipeline ------
    images0, (o0, d0, t0) = next(iter(test))
    o0, d0, t0 = (x.reshape(-1, x.shape[-1]) for x in (o0, d0, t0))
    key = jax.random.PRNGKey(17)
    nc = args.calib_points // config.n_coarse
    # Calibration rays STRIDED over the whole image — contiguous leading
    # rays are the top image rows, i.e. pure background: scales
    # calibrated there never see on-object activations and clip them
    # (measured: -14 dB from exactly this).
    stride = max(1, -(-o0.shape[0] // nc))
    o0, d0, t0 = o0[::stride][:nc], d0[::stride][:nc], t0[::stride][:nc]
    ex, ed = encode_position_and_directions(
        o0, d0, t0, config.pos_emb_xyz, config.pos_emb_dir)
    ex = ex.reshape(-1, ex.shape[-1])
    ed = ed.reshape(-1, ed.shape[-1])
    scales_c = calibrate(params_c, ex, ed, config.mlp, args.percentile)
    # fine calibration points: importance-sampled off the f32 coarse pass
    out_c = render_pair(
        lambda a, b: apply_mlp(params_c, a, b, config.mlp),
        lambda a, b: apply_mlp(params_f, a, b, config.mlp),
        o0, d0, t0, key, config)[0]
    ft = merge_sorted(t0, sample_pdf_sorted(
        key, midpoints(t0), out_c.weights, config.n_fine))
    exf, edf = encode_position_and_directions(
        o0, d0, ft, config.pos_emb_xyz, config.pos_emb_dir)
    scales_f = calibrate(params_f, exf.reshape(-1, exf.shape[-1]),
                         edf.reshape(-1, edf.shape[-1]), config.mlp,
                         args.percentile)

    # ---- render the whole test split both ways ------------------------
    f32_c = jax.jit(lambda a, b: apply_mlp(params_c, a, b, config.mlp))
    f32_f = jax.jit(lambda a, b: apply_mlp(params_f, a, b, config.mlp))
    mode = args.mode
    q_c = jax.jit(lambda a, b: sim_apply_mlp(params_c, scales_c, a, b,
                                             config.mlp, mode))
    q_f = jax.jit(lambda a, b: sim_apply_mlp(params_f, scales_f, a, b,
                                             config.mlp, mode))

    def render_split(apply_c, apply_f, tag):
        psnrs = []
        for i, (images, (o, d, t)) in enumerate(iter(test)):
            h, w = images.shape[1:3]
            o, d, t = (x.reshape(-1, x.shape[-1]) for x in (o, d, t))
            outs = []
            ck = args.ray_chunks
            for s in range(0, o.shape[0], ck):
                _, out_f = render_pair(apply_c, apply_f, o[s:s + ck],
                                       d[s:s + ck], t[s:s + ck],
                                       jax.random.fold_in(key, s), config)
                outs.append(out_f.image)
            img = jnp.concatenate(outs, 0).reshape(1, h, w, 3)
            p = float(psnr(img, images[..., :3])[0])
            psnrs.append(p)
        print(f"{tag}: per-image PSNR "
              + " ".join(f"{p:.2f}" for p in psnrs)
              + f" | mean {np.mean(psnrs):.3f} dB")
        return float(np.mean(psnrs))

    p_f32 = render_split(f32_c, f32_f, "f32      ")
    # int8 everywhere (coarse guides sampling too, like the real tier)
    p_q = render_split(q_c, q_f, "int8 c+f ")
    # int8 fine only (coarse stays f32 — cheaper quality fallback)
    p_qf = render_split(f32_c, q_f, "int8 fine")
    print(f"delta (c+f quantized): {p_q - p_f32:+.3f} dB")
    print(f"delta (fine only)    : {p_qf - p_f32:+.3f} dB")


if __name__ == "__main__":
    main()
