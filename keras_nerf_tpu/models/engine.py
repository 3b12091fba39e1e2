"""The coarse+fine NeRF forward/training engine as pure jit-able functions.

Functional replacement for the reference's Keras training core
(`keras_nerf/model/nerf/nerf.py:175-497`): chunked coarse+fine rendering,
per-chunk gradient accumulation, two independent Adam optimizers, MSE/PSNR/
SSIM metrics. Everything here is a pure function of (params, batch, key) —
the TPU-first shape that one `jax.jit` (optionally with shardings) compiles
into a single device program.

Key semantic matches to the reference:

* the fine model samples from the COARSE render's weights with a hard
  stop-gradient boundary — fine loss never backprops into coarse params
  (structural: separate trees; plus explicit ``stop_gradient`` matching the
  untaped coarse weights of `nerf.py:390-417`);
* fine depths = ``sort(concat(coarse_t, sampled_t))`` (`nerf.py:190-191`);
* per-chunk MSE, gradients averaged over ``num_chunks`` (`nerf.py:376-388`)
  — identical to the global gradient of the mean loss for equal chunks;
* one optimizer step per *batch* (not per chunk), two optimizers
  (`nerf.py:453-458`, `nerf.py:163-165`).

TPU design notes:

* ``--ray_chunks`` is realized as a `lax.scan` over a ``[num_chunks, chunk,
  ...]`` reshape — the reference's Python loop of GradientTapes
  (`nerf.py:351`) becomes one compiled loop whose backward memory is a single
  chunk's activations (grad is taken per chunk inside the scan, exactly like
  the per-chunk tapes);
* when the whole batch fits in HBM, pass ``ray_chunks == num_rays`` for a
  single fused pass (the reference's clamp fast path, `nerf.py:95-98`);
* matmuls run in ``compute_dtype`` (bfloat16 on TPU) with float32 master
  params, encodings and quadrature in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from keras_nerf_tpu.models.mlp import MLPConfig, apply_mlp, init_mlp
from keras_nerf_tpu.ops.encoding import encode_position_and_directions, encoded_dim
from keras_nerf_tpu.ops.metrics import psnr as psnr_fn
from keras_nerf_tpu.ops.metrics import ssim as ssim_fn
from keras_nerf_tpu.ops.rendering import RenderOutput, render_rays
from keras_nerf_tpu.ops.sampling import (
    merge_sorted,
    midpoints,
    sample_pdf_sorted,
    sorted_uniforms,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static model + rendering hyperparameters.

    Field names/defaults mirror the reference ctor (`nerf.py:11-22`) and its
    ``model_config.json`` contract (`nerf.py:47-55`).
    """

    n_coarse: int = 64
    n_fine: int = 128
    pos_emb_xyz: int = 10
    pos_emb_dir: int = 4
    n_layers: int = 8
    dense_units: int = 256
    skip_layer: int = 4
    white_background: bool = False
    compute_dtype: str = "float32"
    # Fused Pallas kernels (kernels/ray_march.py). None = auto: ON for TPU
    # backends (where they are the measured-fastest path), OFF elsewhere
    # (CPU tests run the kernels only in explicit interpret mode). True
    # forces them (raises if the architecture is outside the kernel shape
    # envelope); False forces the pure-XLA path. NOTE: the kernels'
    # precision policy is fixed by design — bfloat16 matmul OPERANDS with
    # float32 accumulation, encodings and quadrature in float32 — and does
    # not follow compute_dtype (which governs the XLA path's matmuls);
    # pass use_pallas=False for end-to-end float32 matmul math.
    use_pallas: bool | None = None
    # Opt-in fast NOVEL-VIEW rendering (inference only; training/eval math
    # is untouched): the fine pass evaluates `fast_render` importance
    # (inverse-CDF) samples INSTEAD of the reference's
    # sort(concat(coarse, fine)) — the n_coarse uniform samples already
    # evaluated by the coarse pass are not re-evaluated by the fine MLP.
    # Point count per ray drops from n_coarse + (n_coarse + n_fine) to
    # n_coarse + fast_render. 0 = off (exact reference math). Measured
    # quality cost on a trained model: docs/QUALITY.md.
    fast_render: int = 0

    @property
    def mlp(self) -> MLPConfig:
        return MLPConfig(
            n_layers=self.n_layers,
            dense_units=self.dense_units,
            skip_layer=self.skip_layer,
        )

    @property
    def in_xyz(self) -> int:
        return encoded_dim(3, self.pos_emb_xyz)

    @property
    def in_dir(self) -> int:
        return encoded_dim(3, self.pos_emb_dir)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    def to_model_config(self) -> dict:
        """The 7-key ``model_config.json`` payload (`nerf.py:47-55`)."""
        return {
            "n_coarse": self.n_coarse,
            "n_fine": self.n_fine,
            "pos_emb_xyz": self.pos_emb_xyz,
            "pos_emb_dir": self.pos_emb_dir,
            "n_layers": self.n_layers,
            "dense_units": self.dense_units,
            "skip_layer": self.skip_layer,
        }

    @classmethod
    def from_model_config(cls, config: dict, **overrides) -> "NeRFConfig":
        return cls(**{**config, **overrides})


class TrainState(NamedTuple):
    """Trainable state: two param trees + two optimizer states + step count."""

    coarse_params: Params
    fine_params: Params
    coarse_opt: optax.OptState
    fine_opt: optax.OptState
    step: jnp.ndarray


def init_params(key: jax.Array, config: NeRFConfig) -> tuple[Params, Params]:
    """Initialize independent coarse and fine MLP parameter trees."""
    kc, kf = jax.random.split(key)
    coarse = init_mlp(kc, config.mlp, config.in_xyz, config.in_dir)
    fine = init_mlp(kf, config.mlp, config.in_xyz, config.in_dir)
    return coarse, fine


def exponential_lr(learning_rate: float, lr_final: float,
                   decay_steps: int) -> optax.Schedule:
    """The original NeRF paper's lr recipe: exponential decay from
    ``learning_rate`` to ``lr_final`` over ``decay_steps`` optimizer steps
    (Mildenhall et al. 2020 §A; the reference trains at a constant Keras
    default instead, which plateaus ~3 dB short — docs/QUALITY.md)."""
    return optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=max(decay_steps, 1),
        decay_rate=lr_final / learning_rate,
        end_value=lr_final)


def make_optimizer(optimizer: str | optax.GradientTransformation,
                   learning_rate=1e-3) -> optax.GradientTransformation:
    """String -> optax optimizer (the `tf.keras.optimizers.get` equivalent,
    `nerf.py:163-165`; Keras Adam defaults => lr 1e-3). ``learning_rate``
    may be an optax schedule (see :func:`exponential_lr`)."""
    if not isinstance(optimizer, str):
        return optimizer
    name = optimizer.lower()
    factories = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
        "adagrad": optax.adagrad,
        "lamb": optax.lamb,
    }
    if name not in factories:
        raise ValueError(
            f"unknown optimizer '{optimizer}'; options: {sorted(factories)}")
    return factories[name](learning_rate)


def init_train_state(
    key: jax.Array,
    config: NeRFConfig,
    optimizer: optax.GradientTransformation,
) -> TrainState:
    coarse, fine = init_params(key, config)
    return TrainState(
        coarse_params=coarse,
        fine_params=fine,
        coarse_opt=optimizer.init(coarse),
        fine_opt=optimizer.init(fine),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def render_chunk(
    params: Params,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    coarse_points: jnp.ndarray,
    key: jax.Array,
    config: NeRFConfig,
    coarse_weights: jnp.ndarray | None = None,
) -> tuple[RenderOutput, jnp.ndarray]:
    """Render one chunk of rays through one MLP.

    With ``coarse_weights`` given this is the fine pass: inverse-CDF sample
    ``n_fine`` extra depths from the (stop-gradient) coarse weights, merge and
    sort with the coarse depths (`nerf.py:175-216`). Returns the render and
    the depths actually used.
    """
    if coarse_weights is not None:
        # Sorted-uniform draws + rank merge instead of the reference's
        # unsorted draws + full sort of the concatenation (`nerf.py:190-191`)
        # — identical sampling distribution, no 192-wide sort network on the
        # hot path (ops/sampling.py: sample_pdf_sorted / merge_sorted).
        mids = midpoints(coarse_points)
        if config.fast_render > 0:
            # Opt-in fast render: importance samples only, no coarse merge
            # (train/eval paths zero this field — see train_step/eval_step).
            points = sample_pdf_sorted(
                key, mids, jax.lax.stop_gradient(coarse_weights),
                config.fast_render)
        else:
            fine_points = sample_pdf_sorted(
                key, mids, jax.lax.stop_gradient(coarse_weights),
                config.n_fine)
            points = merge_sorted(coarse_points, fine_points)
    else:
        points = coarse_points

    if resolve_use_pallas(config):
        # Fused Pallas PE+MLP (forward and backward kernels; custom_vjp —
        # kernels/ray_march.py). Positions/directions are data here, matching
        # the kernel's zero input-cotangent contract.
        from keras_nerf_tpu.kernels import fused_point_forward

        positions = (origin[..., None, :]
                     + direction[..., None, :] * points[..., None])
        dirs = jnp.broadcast_to(direction[..., None, :], positions.shape)
        rgb, sigma = fused_point_forward(
            params, positions.reshape(-1, 3), dirs.reshape(-1, 3),
            config.mlp, config.pos_emb_xyz, config.pos_emb_dir)
        rgb = rgb.reshape(*points.shape, 3)
        sigma = sigma.reshape(*points.shape, 1)
    else:
        enc_xyz, enc_dir = encode_position_and_directions(
            origin, direction, points, config.pos_emb_xyz, config.pos_emb_dir)
        rgb, sigma = apply_mlp(
            params, enc_xyz, enc_dir, config.mlp, config.dtype)
    out = render_rays(rgb, sigma, points,
                      white_background=config.white_background)
    return out, points


def render_chunk_pair(
    coarse_params: Params,
    fine_params: Params,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    coarse_points: jnp.ndarray,
    key: jax.Array,
    config: NeRFConfig,
) -> tuple[RenderOutput, RenderOutput]:
    """Coarse pass then weight-guided fine pass (`nerf.py:218-227`)."""
    out_c, _ = render_chunk(
        coarse_params, origin, direction, coarse_points, key, config)
    out_f, _ = render_chunk(
        fine_params, origin, direction, coarse_points, key, config,
        coarse_weights=out_c.weights)
    return out_c, out_f


def _flatten_rays(rays, num_rays: int, n_coarse: int):
    origin, direction, points = rays
    return (origin.reshape(num_rays, 3),
            direction.reshape(num_rays, 3),
            points.reshape(num_rays, n_coarse))


def _chunked(x: jnp.ndarray, num_chunks: int):
    return x.reshape(num_chunks, x.shape[0] // num_chunks, *x.shape[1:])


def render_image_batch(
    coarse_params: Params,
    fine_params: Params,
    rays,
    key: jax.Array,
    config: NeRFConfig,
    ray_chunks: int,
    with_weights: bool = True,
    coarse_image: bool = True,
    packed_q=None,
) -> tuple[dict, dict]:
    """Full-image chunked inference (`predict_and_render_images`,
    `nerf.py:229-304`).

    Args:
      rays: ``(origin [B,H,W,3], direction [B,H,W,3], points [B,H,W,Nc])``.
      with_weights: include per-sample ``weights`` in the output dicts
        (API parity with the reference). ``False`` skips the fine pass's
        weights entirely on the fused path — the fast option for pure
        novel-view rendering (image + depth only).
      coarse_image: ``False`` declares the coarse image unused (the
        reference CLI discards it, `inference.py:63`): the coarse dict's
        ``image`` comes back all-zero and its color heads are skipped
        (sigma-only fused pass; dead-code-eliminated on the XLA path).
        The fine dict and the coarse depth are unchanged.
      packed_q: optional ``(coarse, fine)`` int8 dicts from
        :func:`quantize_render_params` — the opt-in quantized render
        tier (fused path only; ignored on the XLA path).

    Returns:
      ``(coarse, fine)`` dicts with ``image [B,H,W,3]``, ``depth [B,H,W]``
      and (when ``with_weights``) ``weights [B,H,W,S]``.
    """
    b, h, w = rays[0].shape[:3]
    num_rays = b * h * w
    ray_chunks = min(ray_chunks, num_rays)
    assert num_rays % ray_chunks == 0, (
        f"ray_chunks {ray_chunks} must divide num_rays {num_rays}")
    num_chunks = num_rays // ray_chunks

    o, d, t = _flatten_rays(rays, num_rays, config.n_coarse)
    xs = (_chunked(o, num_chunks), _chunked(d, num_chunks),
          _chunked(t, num_chunks), jax.random.split(key, num_chunks))

    if _use_fused_train(config, None):
        # Fused no-gradient path: MLP + quadrature in one kernel per model.
        from keras_nerf_tpu.kernels import pack_mlp_params

        quantized = packed_q is not None
        if quantized:
            packed_c, packed_f = packed_q
        else:
            packed_c = pack_mlp_params(coarse_params, config.mlp,
                                       config.pos_emb_xyz,
                                       config.pos_emb_dir)
            packed_f = pack_mlp_params(fine_params, config.mlp,
                                       config.pos_emb_xyz,
                                       config.pos_emb_dir)

        def body(_, x):
            oc, dc, tc, k = x
            (ic, dpc, wc), (iff, dpf, wf) = _fused_chunk_pair(
                packed_c, packed_f, oc, dc, tc, k, config,
                with_weights=with_weights, coarse_image=coarse_image,
                quantized=quantized)
            return None, (RenderOutput(image=ic, depth=dpc, weights=wc),
                          RenderOutput(image=iff, depth=dpf, weights=wf))
    else:
        def body(_, x):
            oc, dc, tc, k = x
            out_c, out_f = render_chunk_pair(
                coarse_params, fine_params, oc, dc, tc, k, config)
            if not coarse_image:
                # Match the fused path's contract (zeros) — and with the
                # returned image unused, XLA dead-code-eliminates the
                # coarse color-head computation.
                out_c = out_c._replace(
                    image=jnp.zeros_like(out_c.image))
            return None, (out_c, out_f)

    _, (out_c, out_f) = jax.lax.scan(body, None, xs)

    def unchunk(out: RenderOutput) -> dict:
        d = {
            "image": out.image.reshape(b, h, w, 3),
            "depth": out.depth.reshape(b, h, w),
        }
        if with_weights and out.weights is not None:
            s = out.weights.shape[-1]
            d["weights"] = out.weights.reshape(b, h, w, s)
        return d

    return unchunk(out_c), unchunk(out_f)


def quantize_render_params(
    coarse_params: Params,
    fine_params: Params,
    rays,
    key: jax.Array,
    config: NeRFConfig,
    n_calib_rays: int = 1024,
):
    """Calibrate + quantize both MLPs for the int8 render tier.

    Runs once per checkpoint (outside the per-frame render loop): a
    strided subset of ``rays`` — MUST span the image; contiguous leading
    rays are background-only and mis-calibrate (measured -14 dB,
    `scripts/quantize_sim_ptq.py`) — is pushed through the f32 XLA path
    to collect per-feature activation ranges at every quantization site
    (coarse acts on the stratified points, fine acts on the
    importance-merged points, exactly the distributions the render
    evaluates). Returns ``(coarse_q, fine_q)`` for
    :func:`render_image_batch`'s ``packed_q``.

    jnp-traceable (jit-able); quality contract measured in
    `scripts/quantize_sim_ptq.py` / docs/QUALITY.md.
    """
    from keras_nerf_tpu.kernels import pack_mlp_params
    from keras_nerf_tpu.kernels.quantize import (
        collect_act_amax, quantize_packed)
    from keras_nerf_tpu.kernels.ray_march import encode_block128

    b, h, w = rays[0].shape[:3]
    num_rays = b * h * w
    o, d, t = _flatten_rays(rays, num_rays, config.n_coarse)
    # CEIL stride: floor would degenerate to the forbidden contiguous
    # leading rays whenever num_rays < 2 * n_calib_rays, and drop the
    # image bottom otherwise.
    stride = max(1, -(-num_rays // n_calib_rays))
    o, d, t = (x[::stride][:n_calib_rays] for x in (o, d, t))

    cfg_x = dataclasses.replace(config, use_pallas=False, fast_render=0)
    out_c, _ = render_chunk(coarse_params, o, d, t, key, cfg_x)
    fine_t = sample_pdf_sorted(key, midpoints(t), out_c.weights,
                               config.n_fine)
    pts_f = merge_sorted(t, fine_t)

    def block_enc(points):
        pos = o[:, None, :] + d[:, None, :] * points[..., None]
        dirs = jnp.broadcast_to(d[:, None, :], pos.shape)
        return encode_block128(pos.reshape(-1, 3), dirs.reshape(-1, 3),
                               config.pos_emb_xyz, config.pos_emb_dir)

    last_skip = (config.n_layers - 1) in set(config.mlp.skip_indices())
    out = []
    for params, points in ((coarse_params, t), (fine_params, pts_f)):
        packed = pack_mlp_params(params, config.mlp, config.pos_emb_xyz,
                                 config.pos_emb_dir)
        amax = collect_act_amax(packed, block_enc(points), config.mlp,
                                last_skip)
        out.append(quantize_packed(packed, amax, config.mlp, last_skip))
    return tuple(out)


def mse_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Default training loss: scalar MSE, ``loss(y_true, y_pred)`` with the
    Keras argument order the reference's loss callable uses
    (`train.py:130-136` builds MSE(reduction=NONE) + reduce_mean)."""
    return jnp.mean(jnp.square(y_pred - y_true))


def resolve_use_pallas(config: NeRFConfig) -> bool:
    """Resolve the tri-state ``use_pallas`` flag.

    ``None`` (auto) turns the kernels on for TPU backends where they are
    the measured-fastest path and the architecture fits their shape
    envelope; explicit ``True`` insists (pack_mlp_params raises on
    unsupported shapes); ``False`` stays pure-XLA.
    """
    from keras_nerf_tpu.kernels.ray_march import kernel_supported

    if config.use_pallas is None:
        return (jax.devices()[0].platform in ("tpu", "axon")
                and kernel_supported(config.mlp, config.pos_emb_xyz,
                                     config.pos_emb_dir))
    return config.use_pallas


def _use_fused_train(config: NeRFConfig, loss_fn) -> bool:
    """The fully fused Pallas train path applies when the kernels are on,
    the architecture fits their shape envelope and the loss is the default
    MSE (the kernel derives the MSE cotangent in-register)."""
    from keras_nerf_tpu.kernels.ray_march import kernel_supported

    return (resolve_use_pallas(config)
            and loss_fn in (None, mse_loss)
            and kernel_supported(config.mlp, config.pos_emb_xyz,
                                 config.pos_emb_dir))


def _fused_sampling_ok(config: NeRFConfig) -> bool:
    """Whether the fine kernel's in-kernel sampling prologue applies:
    shapes inside its lane envelope, no profiling ablation active (the
    KNT_ABL ablations instrument the XLA-side sampling chain), and not
    explicitly disabled (KNT_NO_FUSED_SAMPLING=1 keeps the XLA-side
    sample_pdf_sorted/merge_sorted chain for A/B measurement)."""
    import os

    from keras_nerf_tpu.kernels.ray_march import _ABL

    return (not os.environ.get("KNT_NO_FUSED_SAMPLING")
            and _ABL == "none"
            and config.n_coarse <= 128 and config.n_fine <= 128)


def _fused_chunk_pair(packed_c, packed_f, origin, direction, coarse_points,
                      key, config: NeRFConfig, target=None,
                      with_weights=True, coarse_image=True,
                      quantized=False, fine_points=None,
                      fine_sample_inputs=None):
    """Coarse pass -> hierarchical sampling -> fine pass through the fully
    fused train kernel (`kernels/ray_march.py: fused_train_chunk`).

    With ``target`` set, also returns the per-chunk MSE gradients of both
    models (packed layout) — the same per-chunk loss the autodiff path
    differentiates (`nerf.py:366-388`); gradients never flow between the
    models (each kernel only sees its own packed weights — the structural
    stop-gradient of `nerf.py:390-417`).
    """
    from keras_nerf_tpu.kernels.ray_march import fused_train_chunk

    with_grad = target is not None
    assert not (quantized and with_grad)
    out_c = fused_train_chunk(
        packed_c, origin, direction, coarse_points, target, config.mlp,
        pos_emb_xyz=config.pos_emb_xyz, pos_emb_dir=config.pos_emb_dir,
        white_background=config.white_background, with_grad=with_grad,
        # Render-only callers that discard the coarse image (the reference
        # CLI does, `inference.py:63`) skip its color heads entirely.
        sigma_only=(not with_grad) and (not coarse_image),
        quantized=quantized)
    weights_c = out_c[2]

    # The fine pass's weights are only needed when the caller wants them in
    # the render dict (the train pass and metric-only eval never consume
    # them) — skipping them saves a large [R*S, 128] HBM write per chunk.
    fine_kwargs = dict(
        pos_emb_xyz=config.pos_emb_xyz, pos_emb_dir=config.pos_emb_dir,
        white_background=config.white_background, with_grad=with_grad,
        emit_weights=(not with_grad) and with_weights, quantized=quantized)
    if fine_sample_inputs is not None:
        # Caller-supplied sampling inputs (the occupancy-train tier with
        # fused sampling): the inverse-CDF over the probe bins — plus the
        # optional rank merge with the stratified depths — runs in the
        # fine kernel's prologue; only the probe gather and the sorted
        # uniform draws come from XLA.
        out_f = fused_train_chunk(
            packed_f, origin, direction, None, target, config.mlp,
            sample_inputs=fine_sample_inputs, **fine_kwargs)
    elif fine_points is not None:
        # Caller-supplied fine depths (the occupancy-train tier): the fine
        # pass neither reads the coarse weights nor resamples — explicit
        # points straight into the kernel.
        out_f = fused_train_chunk(
            packed_f, origin, direction, fine_points, target, config.mlp,
            **fine_kwargs)
    elif not with_grad and config.fast_render > 0:
        # Opt-in fast render: importance samples only (no coarse merge).
        points = sample_pdf_sorted(
            key, midpoints(coarse_points), weights_c, config.fast_render)
        out_f = fused_train_chunk(
            packed_f, origin, direction, points, target, config.mlp,
            **fine_kwargs)
    elif _fused_sampling_ok(config):
        # Hierarchical sampling (inverse-CDF + rank merge) runs in the
        # fine kernel's PROLOGUE off the coarse pass's compact weights;
        # only the sorted uniform draws come from XLA — same RNG stream
        # and same sampling math as the sample_pdf_sorted/merge_sorted
        # chain (kernels/ray_march.py: _sample_merge_prologue).
        u = sorted_uniforms(key, (origin.shape[0],), config.n_fine)
        out_f = fused_train_chunk(
            packed_f, origin, direction, None, target, config.mlp,
            sample_inputs=(coarse_points, weights_c, u), **fine_kwargs)
    else:
        fine_points = sample_pdf_sorted(
            key, midpoints(coarse_points), weights_c, config.n_fine)
        points = merge_sorted(coarse_points, fine_points)
        out_f = fused_train_chunk(
            packed_f, origin, direction, points, target, config.mlp,
            **fine_kwargs)
    return out_c, out_f


def _batch_metrics(images_c, images_f, target, loss_c, loss_f) -> dict:
    """The six tracked metrics (`nerf.py:306-330`): coarse/fine x
    loss/psnr/ssim; PSNR/SSIM averaged over batch images."""
    return {
        "coarse_loss": loss_c,
        "coarse_psnr": jnp.mean(psnr_fn(images_c, target)),
        "coarse_ssim": jnp.mean(ssim_fn(images_c, target)),
        "fine_loss": loss_f,
        "fine_psnr": jnp.mean(psnr_fn(images_f, target)),
        "fine_ssim": jnp.mean(ssim_fn(images_f, target)),
    }


def train_step(
    state: TrainState,
    batch,
    key: jax.Array,
    occ_grid: jnp.ndarray | None = None,
    optimizer: optax.GradientTransformation = None,
    config: NeRFConfig = None,
    ray_chunks: int = 0,
    axis_name: str | None = None,
    loss_fn=None,
    occupancy: tuple | None = None,
    debug_grads: bool = False,
    occ_rows: jnp.ndarray | None = None,
) -> tuple[TrainState, dict]:
    """One optimizer step over one batch of whole-image rays.

    ``debug_grads`` (STATIC) additionally returns one gradient norm per
    parameter tensor (``grad_norm/{coarse,fine}/<path>`` metric keys) so a
    dead or exploding layer can be localized — parity with the reference's
    eager per-variable zero-grad counters
    (`keras_nerf/model/nerf/nerf.py:429-451`), off by default because the
    extra metric fetches serialize the train loop on a tunneled TPU.

    ``loss_fn(y_true, y_pred) -> scalar`` defaults to :func:`mse_loss`; a
    custom callable is applied per chunk exactly where the reference applies
    its compiled loss (`nerf.py:366-373`, callable from `train.py:130-136`).

    ``occupancy`` (STATIC) + ``occ_grid`` (traced ``[G, G, G]``) enable the
    opt-in occupancy-accelerated training tier (NerfAcc-style empty-space
    skipping at TRAIN time, PAPERS.md): the fine pass trains on
    ``n_samples`` depths drawn inside the baked occupancy grid instead of
    the reference's sorted 64+128 coarse/importance merge — the fine
    chunk shrinks from 192 to ``n_samples`` (+64 if merged) points. The
    coarse model still trains exactly as the reference does (its
    stratified pass is untouched), so exact-math rendering keeps working.
    ``occupancy = (n_samples, n_probe, near, far, aabb, merge_stratified)``;
    ``merge_stratified=True`` rank-merges the stratified coarse depths into
    the fine pass so free space stays supervised (recommended for
    exact-math eval of the trained model). The grid is re-baked OUTSIDE
    the step (a few-ms sweep per epoch — `NeRF.fit`).

    ``occ_rows`` (traced ``[num_rays, n_probe]``, the opt-in
    ``--occupancy_train_cache`` tier) replaces the per-step grid probe
    with precomputed probe rows for THIS batch's rays: origins/directions
    are pose-deterministic and the grid is constant between re-bakes, so
    the rows are a cacheable constant per image
    (`ops/occupancy.probe_rows_for_poses`). Bit-identical to the probed
    path (same bins, same RNG stream); ``occ_grid`` is then unused.

    Mirrors `NeRF.train_step` (`nerf.py:332-473`): per-chunk forward+grad for
    coarse and fine (fine's sampling reads stop-gradient coarse weights),
    gradients averaged across chunks, one apply per model, metrics computed
    on the re-assembled full images.

    With ``axis_name`` set (inside shard_map over a device mesh), this is the
    per-device body of synchronous data parallelism: gradients and metrics
    are ``pmean``-ed across the axis BEFORE the optimizer applies them, so
    every device steps identically on replicated params — the shard_map/psum
    equivalent of MirroredStrategy's implicit all-reduce (`train.py:75`,
    SURVEY.md §2 "parallelism strategies"). The RNG key is decorrelated per
    device by folding in the axis index.
    """
    if loss_fn is None:
        loss_fn = mse_loss
    # Training math is always exact — the opt-in fast-render approximation
    # applies to novel-view rendering only.
    config = dataclasses.replace(config, fast_render=0)
    if axis_name is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    images, rays = batch
    b, h, w = images.shape[:3]
    num_rays = b * h * w
    assert num_rays % ray_chunks == 0 and num_rays >= ray_chunks, (
        f"ray_chunks {ray_chunks} must divide the rays this step sees "
        f"({num_rays} — per-DEVICE under shard_map)")
    num_chunks = num_rays // ray_chunks
    target = images[..., :3].reshape(num_rays, 3)

    o, d, t = _flatten_rays(rays, num_rays, config.n_coarse)
    xs = (
        _chunked(o, num_chunks), _chunked(d, num_chunks),
        _chunked(t, num_chunks), _chunked(target, num_chunks),
        jax.random.split(key, num_chunks),
    )

    if occupancy is not None:
        assert occ_grid is not None or occ_rows is not None, (
            "occupancy training requires occ_grid or cached occ_rows")
        from keras_nerf_tpu.ops import occupancy as occ_mod
        occ_n, occ_probe, occ_near, occ_far, occ_aabb, occ_merge = occupancy
        # With the fused kernels, the inverse-CDF over the probe bins (and
        # the optional stratified merge) runs in the fine kernel's
        # prologue; only the grid probe — independent of the coarse pass,
        # so XLA overlaps it — and the draws stay outside.
        occ_fuse = (_fused_sampling_ok(config) and occ_probe <= 128
                    and occ_n <= 128
                    and (not occ_merge or config.n_coarse <= 128))
        if occ_rows is not None:
            xs = xs + (_chunked(occ_rows.astype(jnp.float32), num_chunks),)

        def occ_probe_bins(oc, dc, rows):
            """Probe bins: cached rows when supplied, else the live grid
            gather — same mids, so the two paths are bit-identical."""
            if rows is not None:
                mids = occ_mod.probe_bin_mids(occ_near, occ_far, occ_probe)
                return jnp.broadcast_to(mids, rows.shape), rows
            return occ_mod.occupancy_along_rays(
                oc, dc, occ_grid, occ_near, occ_far, occ_probe, occ_aabb)

        def occ_sample_inputs(oc, dc, tc, k, rows):
            """Fused-prologue sampling inputs: probe bins as the CDF
            source, same RNG stream as `occ_mod.sample_occupied`."""
            mids, occ = occ_probe_bins(oc, dc, rows)
            u = sorted_uniforms(jax.random.fold_in(k, 7), (oc.shape[0],),
                                occ_n)
            return (mids, occ, u, tc if occ_merge else None)

        def occ_fine_points(oc, dc, tc, k, rows):
            """Fine-pass depths inside the baked grid (optionally
            rank-merged with the stratified coarse depths)."""
            mids, occ = occ_probe_bins(oc, dc, rows)
            pts = occ_mod.sample_occupied(
                jax.random.fold_in(k, 7), mids, occ, occ_n)
            return merge_sorted(tc, pts) if occ_merge else pts

    if _use_fused_train(config, loss_fn):
        # Fully fused Pallas path: per-chunk forward + quadrature + MSE
        # cotangent + backward run in one kernel per model; packing is
        # hoisted out of the chunk scan (params are chunk-invariant) and
        # gradients accumulate in the packed layout, unpacked once.
        from keras_nerf_tpu.kernels import pack_mlp_params, unpack_grads

        packed_c = pack_mlp_params(
            state.coarse_params, config.mlp, config.pos_emb_xyz,
            config.pos_emb_dir)
        packed_f = pack_mlp_params(
            state.fine_params, config.mlp, config.pos_emb_xyz,
            config.pos_emb_dir)

        def body(acc, x):
            if occupancy is not None and occ_rows is not None:
                oc, dc, tc, tgt, k, rows = x
            else:
                (oc, dc, tc, tgt, k), rows = x, None
            fp = si = None
            if occupancy is not None:
                if occ_fuse:
                    si = occ_sample_inputs(oc, dc, tc, k, rows)
                else:
                    fp = occ_fine_points(oc, dc, tc, k, rows)
            out_c, out_f = _fused_chunk_pair(
                packed_c, packed_f, oc, dc, tc, k, config, target=tgt,
                fine_points=fp, fine_sample_inputs=si)
            img_c, g_c = out_c[0], out_c[3]
            img_f, g_f = out_f[0], out_f[3]
            loss_c = jnp.mean(jnp.square(img_c - tgt))
            loss_f = jnp.mean(jnp.square(img_f - tgt))
            acc = jax.tree.map(jnp.add, acc, (g_c, g_f))
            return acc, (loss_c, loss_f, img_c, img_f)

        zero_grads = jax.tree.map(
            lambda a: jnp.zeros(a.shape, jnp.float32), (packed_c, packed_f))
        (gp_c, gp_f), aux = jax.lax.scan(body, zero_grads, xs)
        grads_c = unpack_grads(gp_c, config.mlp, config.pos_emb_xyz,
                               config.pos_emb_dir)
        grads_f = unpack_grads(gp_f, config.mlp, config.pos_emb_xyz,
                               config.pos_emb_dir)
    else:
        def chunk_loss(both_params, oc, dc, tc, tgt, k, fp):
            coarse_params, fine_params = both_params
            if occupancy is None:
                out_c, out_f = render_chunk_pair(
                    coarse_params, fine_params, oc, dc, tc, k, config)
            else:
                # Occupancy tier: coarse trains exactly as the reference;
                # the fine pass renders the grid-placed depths (no coarse
                # weights read — structural stop-gradient holds trivially).
                out_c, _ = render_chunk(coarse_params, oc, dc, tc, k,
                                        config)
                out_f, _ = render_chunk(fine_params, oc, dc, fp,
                                        jax.random.fold_in(k, 11), config)
            loss_c = loss_fn(tgt, out_c.image)
            loss_f = loss_fn(tgt, out_f.image)
            return loss_c + loss_f, (loss_c, loss_f, out_c.image, out_f.image)

        grad_fn = jax.value_and_grad(chunk_loss, has_aux=True)
        params = (state.coarse_params, state.fine_params)
        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def body(acc, x):
            if occupancy is not None and occ_rows is not None:
                oc, dc, tc, tgt, k, rows = x
            else:
                (oc, dc, tc, tgt, k), rows = x, None
            fp = (occ_fine_points(oc, dc, tc, k, rows)
                  if occupancy is not None else None)
            (_, aux), grads = grad_fn(params, oc, dc, tc, tgt, k, fp)
            acc = jax.tree.map(jnp.add, acc, grads)
            return acc, aux

        (grads_c, grads_f), aux = jax.lax.scan(body, zero_grads, xs)
    inv = 1.0 / num_chunks
    grads_c = jax.tree.map(lambda g: g * inv, grads_c)
    grads_f = jax.tree.map(lambda g: g * inv, grads_f)

    loss_c_chunks, loss_f_chunks, img_c_chunks, img_f_chunks = aux
    loss_c = jnp.mean(loss_c_chunks)
    loss_f = jnp.mean(loss_f_chunks)

    if axis_name is not None:
        grads_c = jax.lax.pmean(grads_c, axis_name)
        grads_f = jax.lax.pmean(grads_f, axis_name)

    updates_c, opt_c = optimizer.update(
        grads_c, state.coarse_opt, state.coarse_params)
    updates_f, opt_f = optimizer.update(
        grads_f, state.fine_opt, state.fine_params)

    new_state = TrainState(
        coarse_params=optax.apply_updates(state.coarse_params, updates_c),
        fine_params=optax.apply_updates(state.fine_params, updates_f),
        coarse_opt=opt_c,
        fine_opt=opt_f,
        step=state.step + 1,
    )

    metrics = _batch_metrics(
        img_c_chunks.reshape(b, h, w, 3),
        img_f_chunks.reshape(b, h, w, 3),
        images[..., :3], loss_c, loss_f)
    # Gradient-health diagnostics: the reference asserts per-chunk gradient
    # finiteness and counts all-zero gradients in eager mode
    # (`nerf.py:380-382,429-451`); a global grad norm covers both (0 => all
    # zero, nan/inf => non-finite) without a debug-only code path.
    metrics["coarse_grad_norm"] = optax.global_norm(grads_c)
    metrics["fine_grad_norm"] = optax.global_norm(grads_f)
    if debug_grads:
        # Per-variable localization (reference `nerf.py:429-451`): the
        # consumer (NeRF._warn_grad_health) names the dead layer.
        for model_name, g in (("coarse", grads_c), ("fine", grads_f)):
            for path, leaf in jax.tree_util.tree_leaves_with_path(g):
                name = jax.tree_util.keystr(path).replace("'", "")
                metrics[f"grad_norm/{model_name}{name}"] = jnp.sqrt(
                    jnp.sum(jnp.square(leaf)))
    if axis_name is not None:
        metrics = jax.lax.pmean(metrics, axis_name)
    return new_state, metrics


def eval_step(
    state: TrainState,
    batch,
    key: jax.Array,
    config: NeRFConfig,
    ray_chunks: int,
    axis_name: str | None = None,
    loss_fn=None,
    gather_images: bool = False,
) -> dict:
    """Chunked full inference + metrics (`NeRF.test_step`, `nerf.py:475-497`).

    ``gather_images=True`` (ray-sharded DP): each device rendered only a
    height BAND of every image, but PSNR/SSIM are whole-image metrics — a
    pmean of per-band values is NOT the single-chip number (Jensen gap on
    PSNR, conv-clipped windows on SSIM). All-gather the bands back into
    full images first (tiny: one [B, H, W, 3] collective per model), so
    reported eval quality is exactly comparable to unsharded runs.
    """
    if loss_fn is None:
        loss_fn = mse_loss
    # Eval metrics always use the exact reference math (comparable PSNR).
    config = dataclasses.replace(config, fast_render=0)
    if axis_name is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    images, rays = batch
    target = images[..., :3]
    out_c, out_f = render_image_batch(
        state.coarse_params, state.fine_params, rays, key, config, ray_chunks,
        with_weights=False)
    img_c, img_f = out_c["image"], out_f["image"]
    if gather_images and axis_name is not None:
        img_c = jax.lax.all_gather(img_c, axis_name, axis=1, tiled=True)
        img_f = jax.lax.all_gather(img_f, axis_name, axis=1, tiled=True)
        target = jax.lax.all_gather(target, axis_name, axis=1, tiled=True)
    loss_c = loss_fn(target, img_c)
    loss_f = loss_fn(target, img_f)
    metrics = _batch_metrics(img_c, img_f, target, loss_c, loss_f)
    if axis_name is not None:
        # No-op when images were gathered (identical replicas); the real
        # cross-device mean for the batch-sharded layout.
        metrics = jax.lax.pmean(metrics, axis_name)
    return metrics
