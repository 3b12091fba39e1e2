"""The user-facing NeRF model: reference-compatible API over the pure engine.

Mirrors the reference ``NeRF(tf.keras.Model)`` surface
(`keras_nerf/model/nerf/nerf.py:11-508`): ctor from hyperparams or
``model_path``, ``compile()``, ``fit()``, ``train_step``/``test_step``,
``predict_and_render_images``, ``save_model``/``load_model`` — but the state
is an explicit :class:`~keras_nerf_tpu.models.engine.TrainState` pytree and
every step is one jitted pure function (donated state, so parameter memory is
updated in place on device).

Multi-device: pass ``mesh=`` to :meth:`compile` and every batch is sharded
over the mesh's ``data`` axis along the image-batch dimension while params
stay replicated — XLA inserts the gradient all-reduce (psum) automatically.
This replaces the reference's ``tf.distribute.MirroredStrategy``
(`train.py:75`).
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from keras_nerf_tpu.models import engine
from keras_nerf_tpu.models.engine import NeRFConfig, TrainState
from keras_nerf_tpu.utils import checkpoint


class MeanTracker:
    """Running mean over an epoch (`tf.keras.metrics.Mean` stand-in)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        self.total += float(value)
        self.count += 1

    def result(self) -> float:
        return self.total / max(self.count, 1)

    def reset(self):
        self.total, self.count = 0.0, 0


class NeRF:
    """Coarse+fine NeRF with chunked training (reference `nerf.py:11`)."""

    METRIC_NAMES = ("coarse_loss", "coarse_psnr", "coarse_ssim",
                    "fine_loss", "fine_psnr", "fine_ssim")

    def __init__(self, n_coarse: int = 64, n_fine: int = 128,
                 pos_emb_xyz: int = 10, pos_emb_dir: int = 4,
                 n_layers: int = 8, dense_units: int = 256,
                 skip_layer: int = 4, model_path: str | None = None,
                 compute_dtype: str = "float32", **_):
        self.model_path = model_path
        if model_path is None:
            self.config = NeRFConfig(
                n_coarse=n_coarse, n_fine=n_fine,
                pos_emb_xyz=pos_emb_xyz, pos_emb_dir=pos_emb_dir,
                n_layers=n_layers, dense_units=dense_units,
                skip_layer=skip_layer, compute_dtype=compute_dtype)
            logging.info("Creating NeRF model: %s", self.config)
        else:
            self.config = checkpoint.load_model_config(
                model_path, compute_dtype=compute_dtype)
            logging.info("Loaded NeRF config from %s: %s",
                         model_path, self.config)
        self.state: TrainState | None = None
        self._compiled = False

    # ------------------------------------------------------------------ setup

    def compile(self, optimizer="adam", loss="mse", batch_size: int = 1,
                image_height: int = 128, image_width: int = 128,
                ray_chunks: int = 1024, white_background: bool = False,
                is_training: bool = True, learning_rate: float = 1e-3,
                lr_final: float = 0.0, lr_decay_steps: int = 0,
                seed: int = 42, mesh=None, use_pallas: bool | None = None,
                fast_render: int = 0, quantized_render: bool = False,
                occupancy_train: int = 0,
                occupancy_train_samples: int = 64,
                occupancy_train_merge: bool = True,
                occupancy_train_warmup: int = 2,
                occupancy_train_update: int = 1,
                occupancy_train_threshold: float = 1.0,
                occupancy_train_probe: int = 64,
                occupancy_train_until: int = 0,
                occupancy_train_dilate: int = 1,
                occupancy_train_cache: bool = False,
                pixel_sampling: bool = False,
                debug_grads: bool = False,
                shard_rays: bool = False,
                near: float = 2.0, far: float = 6.0, **_):
        """Finalize shapes, build params/optimizers, jit the step functions.

        Mirrors `nerf.py:78-114`: clamps ``ray_chunks`` to ``num_rays``,
        asserts divisibility, builds utils, initializes accumulators (here:
        nothing to pre-allocate — grads are scan carries) and two optimizers.
        """
        if callable(loss):
            # A custom callable trains the model exactly where the reference
            # consumes its compiled loss (`train.py:130-136` -> `nerf.py:366`):
            # applied per chunk as loss(y_true, y_pred) -> scalar.
            loss_fn = loss
        elif loss in ("mse", None):
            loss_fn = engine.mse_loss
        else:
            raise ValueError(f"unsupported loss: {loss!r} (pass 'mse' or a "
                             "callable loss(y_true, y_pred) -> scalar)")
        self.config = NeRFConfig(
            **{**self.config.to_model_config(),
               "white_background": white_background,
               "compute_dtype": self.config.compute_dtype,
               "use_pallas": use_pallas,
               "fast_render": fast_render})
        self.batch_size = batch_size
        self.image_height = image_height
        self.image_width = image_width
        self.num_rays = batch_size * image_height * image_width

        # Under a mesh, the step executes on per-device shards and
        # --ray_chunks is per-device (`parallel/data_parallel.py`): validate
        # against the rays each device actually sees.
        n_devices = 1 if mesh is None else int(mesh.devices.size)
        self.shard_rays = bool(shard_rays) and mesh is not None
        if self.shard_rays and pixel_sampling:
            # Pixel-sampled batches are flat (image, pixel) draws with no
            # height axis to split; batch-axis DP already shards them.
            raise ValueError(
                "--shard_rays cannot compose with --pixel_sampling "
                "(pixel batches have no image-height axis; use plain DP)")
        if self.shard_rays and image_height % n_devices != 0:
            raise ValueError(
                f"image_height {image_height} must divide across "
                f"{n_devices} mesh devices under --shard_rays (the "
                f"image HEIGHT axis is sharded)")
        if (is_training and not self.shard_rays
                and batch_size % n_devices != 0):
            # The train/eval shard_map splits the image-batch (leading)
            # axis — a num_rays-only check would accept batch_size=4 on 8
            # devices and crash opaquely at the first step's dispatch.
            # (Render-only compiles shard image HEIGHT instead, so batch 1
            # is fine there; --shard_rays trains that way too.)
            raise ValueError(
                f"batch_size {batch_size} must divide across "
                f"{n_devices} mesh devices (the global image batch is "
                f"sharded along its leading axis; pass shard_rays=True "
                f"to split the image-height axis instead)")
        if self.num_rays % n_devices != 0:
            raise ValueError(
                f"global num_rays {self.num_rays} must divide across "
                f"{n_devices} mesh devices")
        per_device_rays = self.num_rays // n_devices

        self.ray_chunks = min(ray_chunks, per_device_rays)
        if self.ray_chunks != ray_chunks:
            logging.info(
                "ray_chunks > per-device rays; clamped to %d",
                per_device_rays)
        assert per_device_rays % self.ray_chunks == 0, (
            f"ray_chunks {self.ray_chunks} must be a divisor of the "
            f"per-device number of rays {per_device_rays}")
        self.sequential_chunks = per_device_rays // self.ray_chunks
        logging.info("num_rays=%d per_device_rays=%d sequential_chunks=%d",
                     self.num_rays, per_device_rays, self.sequential_chunks)

        self._train_config = None
        if is_training:
            # EVERY convergence-affecting knob goes in, so a resume
            # launched with different/default flags warns per key
            # (checkpoint.warn_train_config_mismatch). pos_emb_*/layer
            # keys would also fail the weight-tree load, but the warning
            # here names the flag instead of crashing with a tree error.
            self._train_config = {
                "optimizer": (optimizer if isinstance(optimizer, str)
                              else type(optimizer).__name__),
                "learning_rate": float(learning_rate),
                "lr_final": float(lr_final),
                "lr_decay_steps": int(lr_decay_steps),
                "white_background": bool(white_background),
                "pixel_sampling": bool(pixel_sampling),
                "num_coarse_samples": int(self.config.n_coarse),
                "num_fine_samples": int(self.config.n_fine),
                "pos_emb_xyz": int(self.config.pos_emb_xyz),
                "pos_emb_dir": int(self.config.pos_emb_dir),
                "occupancy_train": int(occupancy_train),
                "occupancy_train_samples": int(occupancy_train_samples),
                "occupancy_train_merge": bool(occupancy_train_merge),
                "occupancy_train_warmup": int(occupancy_train_warmup),
                "occupancy_train_update": int(occupancy_train_update),
                "occupancy_train_until": int(occupancy_train_until),
                "occupancy_train_dilate": int(occupancy_train_dilate),
                "occupancy_train_cache": bool(occupancy_train_cache),
            }
            if self.model_path is not None and self.state is None:
                checkpoint.warn_train_config_mismatch(
                    self.model_path, self._train_config)
        if lr_final > 0.0 and lr_decay_steps > 0:
            # NeRF-paper exponential decay; state counts live in the optax
            # optimizer state, so checkpoint resume continues the schedule.
            learning_rate = engine.exponential_lr(
                learning_rate, lr_final, lr_decay_steps)
        self.optimizer = engine.make_optimizer(optimizer, learning_rate)
        self.mesh = mesh
        self._eval_key = jax.random.PRNGKey(seed + 1)

        if self.state is None:
            state = engine.init_train_state(
                jax.random.PRNGKey(seed), self.config, self.optimizer)
            if self.model_path is not None:
                logging.info("Loading NeRF weights from %s", self.model_path)
                state = checkpoint.load_train_state(self.model_path, state)
            self.state = state

        donate = (0,) if is_training else ()
        self.debug_grads = bool(debug_grads)
        train_fn = partial(engine.train_step, optimizer=self.optimizer,
                           config=self.config, ray_chunks=self.ray_chunks,
                           loss_fn=loss_fn, debug_grads=self.debug_grads)

        # Opt-in occupancy-accelerated TRAINING (NerfAcc-style empty-space
        # skipping at train time — engine.train_step docstring, PAPERS.md).
        # Exact-math steps run during warmup / until the first bake.
        self.occupancy_train = int(occupancy_train) if is_training else 0
        self._occ_train_grid = None
        self._occ_probe_cache = None
        self.occupancy_train_cache = (bool(occupancy_train_cache)
                                      and self.occupancy_train > 0)
        if self.occupancy_train_cache:
            if mesh is not None:
                raise ValueError(
                    "--occupancy_train_cache is a single-device tier (the "
                    "cache indexes whole images; under a mesh use the "
                    "plain grid probe)")
            if pixel_sampling:
                raise ValueError(
                    "--occupancy_train_cache cannot compose with "
                    "--pixel_sampling (pixel batches scramble the "
                    "per-image rays the cache is keyed by)")
        train_occ_fn = None
        if self.occupancy_train > 0:
            from keras_nerf_tpu.ops import occupancy as occ_mod
            self._occ_train_cfg = dict(
                grid_size=self.occupancy_train,
                warmup=max(0, int(occupancy_train_warmup)),
                update=max(1, int(occupancy_train_update)),
                threshold=float(occupancy_train_threshold),
                until=max(0, int(occupancy_train_until)),
                dilate=max(0, int(occupancy_train_dilate)))
            # Probe count trades residual probe-gather cost (the tier's
            # only remaining non-kernel cost, ~2.7 ms per 4096-ray chunk
            # at 64 — scripts/profile_occtrain.py) against bin
            # resolution; the grid dilation absorbs the placement error.
            occ_spec = (int(occupancy_train_samples),
                        int(occupancy_train_probe), float(near),
                        float(far), occ_mod.DEFAULT_AABB,
                        bool(occupancy_train_merge))
            self._occ_spec = occ_spec
            train_occ_fn = partial(engine.train_step,
                                   optimizer=self.optimizer,
                                   config=self.config,
                                   ray_chunks=self.ray_chunks,
                                   loss_fn=loss_fn, occupancy=occ_spec,
                                   debug_grads=self.debug_grads)
        eval_fn = partial(engine.eval_step, config=self.config,
                          ray_chunks=self.ray_chunks, loss_fn=loss_fn)
        render_fn = partial(engine.render_image_batch, config=self.config,
                            ray_chunks=self.ray_chunks)

        if mesh is not None:
            from keras_nerf_tpu.parallel import shard_batch_fns
            if train_occ_fn is not None:
                from keras_nerf_tpu.parallel import sharded_train_step
                kw = train_occ_fn.keywords
                train_occ_fn = sharded_train_step(
                    mesh, kw["optimizer"], kw["config"], kw["ray_chunks"],
                    kw["loss_fn"], occupancy=kw["occupancy"],
                    debug_grads=kw.get("debug_grads", False),
                    shard_rays=self.shard_rays)
            train_fn, eval_fn, render_fn = shard_batch_fns(
                mesh, train_fn, eval_fn, render_fn,
                shard_rays=self.shard_rays)
            self._render = jax.jit(render_fn)
            # Tiered mesh renders (with_weights/coarse_image change the
            # shard_map out specs; quantized adds the packed_q operand, so
            # each combination is its own wrapped fn) — built lazily,
            # keyed by the flag triple; jit is lazy so unused tiers cost
            # nothing.
            self._mesh_render_cache = {(True, True, False): self._render}
        else:
            # with_weights=False is the fast novel-view path (image+depth
            # only); coarse_image=False additionally skips the coarse color
            # heads.
            self._render = jax.jit(
                render_fn, static_argnames=("with_weights", "coarse_image"))
        self._train_step = jax.jit(train_fn, donate_argnums=donate)
        self._train_step_occ = (jax.jit(train_occ_fn, donate_argnums=donate)
                                if train_occ_fn is not None else None)
        # Probe-row cache tier (--occupancy_train_cache): same step math
        # with the per-step grid probe replaced by cached rows gathered per
        # image (engine.train_step occ_rows; bit-identical sampling).
        self._train_step_occ_rows = None
        if self.occupancy_train_cache and self._train_step_occ is not None:
            rows_step = partial(engine.train_step,
                                optimizer=self.optimizer,
                                config=self.config,
                                ray_chunks=self.ray_chunks,
                                loss_fn=loss_fn, occupancy=self._occ_spec,
                                debug_grads=self.debug_grads)
            self._train_step_occ_rows = jax.jit(
                lambda state, batch, key, rows: rows_step(
                    state, batch, key, occ_rows=rows),
                donate_argnums=donate)
        self._eval_step = jax.jit(eval_fn)
        # Mesh fallback for batches the shard_map in_specs cannot split
        # (e.g. a 6-image split on an 8-device mesh): an unsharded eval step
        # on one device. jit is lazy, so this costs nothing unless used.
        self._eval_step_unsharded = (
            jax.jit(partial(engine.eval_step, config=self.config,
                            ray_chunks=min(self.ray_chunks,
                                           image_height * image_width),
                            loss_fn=loss_fn))
            if mesh is not None else self._eval_step)

        # Opt-in int8 render tier (novel-view only; train/eval untouched).
        # Calibrated lazily on the first predict call's rays (once, on one
        # device — calibration is per-checkpoint, not per-frame); under a
        # mesh the baked int8 weights are replicated and each device runs
        # the W8A8 kernels on its band. XLA-path renders ignore it (fused
        # path only).
        self.quantized_render = bool(quantized_render)
        self._packed_q = None
        self._packed_q_state = None
        if self.quantized_render:
            if not engine._use_fused_train(self.config, None):
                logging.warning(
                    "quantized_render requires the fused render path; "
                    "flag ignored")
                self.quantized_render = False
            else:
                self._quantize_fn = jax.jit(partial(
                    engine.quantize_render_params, config=self.config))

        self.metrics = {n: MeanTracker() for n in self.METRIC_NAMES}
        self.val_metrics = {n: MeanTracker() for n in self.METRIC_NAMES}
        self._compiled = True
        self._step_counter = 0
        self._root_key = jax.random.PRNGKey(seed + 2)

    def _require_compiled(self):
        if not self._compiled:
            raise RuntimeError("call compile() first")

    def _next_key(self) -> jax.Array:
        self._step_counter += 1
        return jax.random.fold_in(self._root_key, self._step_counter)

    # ------------------------------------------------------------------ steps

    def _run_train_step(self, batch, key, indices=None):
        """Dispatch to the occupancy-train step once a grid is baked
        (warmup and pre-bake epochs run the exact reference math). With
        the probe-row cache built and the batch's image ``indices`` known,
        the cached-rows step replaces the per-step grid probe
        (bit-identical sampling — `engine.train_step occ_rows`)."""
        if self._train_step_occ is not None and self._occ_train_grid \
                is not None:
            if (self._occ_probe_cache is not None and indices is not None
                    and self._train_step_occ_rows is not None):
                rows = jnp.take(self._occ_probe_cache,
                                jnp.asarray(indices), axis=0)
                rows = rows.reshape(-1, rows.shape[-1])
                return self._train_step_occ_rows(self.state, batch, key,
                                                 rows)
            return self._train_step_occ(self.state, batch, key,
                                        self._occ_train_grid)
        return self._train_step(self.state, batch, key)

    def _maybe_update_occupancy_train(self, epoch: int, train_dataset=None):
        """(Re-)bake the training occupancy grid from the CURRENT fine
        model — called at each epoch start by :meth:`fit`. No-op before
        the warmup epoch; re-bakes every ``occupancy_train_update``
        epochs (the model sharpens, the grid must follow — NerfAcc's
        periodic update). With ``occupancy_train_cache`` the per-image
        probe rows are rebuilt against each fresh grid."""
        if self.occupancy_train <= 0:
            return
        cfg = self._occ_train_cfg
        if cfg["until"] > 0 and epoch >= cfg["until"]:
            # Hybrid schedule (--occupancy_train_until E): grid-placed
            # fine samples while the lr is high, exact reference math for
            # the decay tail — the tail is where the last fraction of a
            # dB lives (docs/QUALITY.md occupancy-train A/B analysis).
            if self._occ_train_grid is not None:
                logging.info(
                    "occupancy-train: epoch %d >= --occupancy_train_until "
                    "%d; switching to exact reference math for the "
                    "remaining epochs", epoch, cfg["until"])
                self._occ_train_grid = None
                self._occ_probe_cache = None
            return
        if epoch < cfg["warmup"]:
            return
        if (self._occ_train_grid is not None
                and (epoch - cfg["warmup"]) % cfg["update"] != 0):
            return
        from keras_nerf_tpu.ops import occupancy as occ_mod
        density = occ_mod.model_density_fn(self.state.fine_params,
                                           self.config)
        grid = occ_mod.bake_occupancy_grid(
            density, cfg["grid_size"], occ_mod.DEFAULT_AABB,
            cfg["threshold"], dilate=cfg["dilate"])
        if self.mesh is not None:
            from keras_nerf_tpu.parallel import replicate
            grid = replicate(grid, self.mesh)
        if self._occ_train_grid is None:
            logging.info(
                "occupancy-train: first grid baked at epoch %d "
                "(%d^3, %.1f%% occupied)", epoch, cfg["grid_size"],
                100.0 * float(jnp.mean(grid)))
        self._occ_train_grid = grid
        if self.occupancy_train_cache:
            self._occ_probe_cache = self._build_probe_cache(
                grid, train_dataset)

    def _build_probe_cache(self, grid, train_dataset):
        """Probe the fresh grid once per train image ([N, H*W, P] uint8 on
        device) so steady-state steps gather rows instead of re-probing —
        the tier's only residual non-kernel cost
        (`ops/occupancy.probe_rows_for_poses`). Needs the dataset's poses;
        datasets without them (custom iterables) fall back to the live
        grid probe."""
        if train_dataset is None or not hasattr(train_dataset, "poses"):
            logging.warning(
                "occupancy_train_cache: train dataset does not expose "
                "poses/focal; falling back to per-step grid probing")
            return None
        from keras_nerf_tpu.ops import occupancy as occ_mod
        _, probe, o_near, o_far, aabb, _ = self._occ_spec
        return occ_mod.probe_rows_for_poses(
            train_dataset.poses, train_dataset.focal, grid,
            image_height=self.image_height, image_width=self.image_width,
            near=o_near, far=o_far, n_probe=probe, aabb=aabb)

    def _warn_grad_health(self, metrics, where: str):
        """Zero/non-finite gradient diagnostics (the reference's eager-mode
        zero-grad counters and assert_all_finite,
        `nerf.py:380-382,429-451`). With ``debug_grads`` compiled in, the
        per-variable ``grad_norm/...`` keys localize which layer died."""
        for name in ("coarse_grad_norm", "fine_grad_norm"):
            g = metrics.get(name)
            if g is not None and (g == 0.0 or not np.isfinite(g)):
                logging.warning("%s = %s %s", name, g, where)
        for k, v in metrics.items():
            if k.startswith("grad_norm/") and (
                    v == 0.0 or not np.isfinite(v)):
                logging.warning(
                    "dead/non-finite gradient in %s (norm = %s) %s",
                    k[len("grad_norm/"):], v, where)

    def train_step(self, batch, key=None) -> dict[str, float]:
        """One gradient step; returns the six metrics (`nerf.py:332-473`)."""
        self._require_compiled()
        self.state, metrics = self._run_train_step(
            batch, key if key is not None else self._next_key())
        out = {k: float(v) for k, v in metrics.items()}
        for k, v in out.items():
            if k in self.metrics:
                self.metrics[k].update(v)
        self._warn_grad_health(out, f"at step {self._step_counter}")
        return out

    def _eval_fn_for(self, batch):
        """Mesh-divisibility routing: batches whose sharded dim (leading,
        or height under --shard_rays) does not split over the mesh run
        through the unsharded fallback."""
        if self.mesh is not None:
            dim = 1 if self.shard_rays else 0
            if batch[0].shape[dim] % int(self.mesh.devices.size) != 0:
                return self._eval_step_unsharded
        return self._eval_step

    def test_step(self, batch, key=None) -> dict[str, float]:
        """Full chunked inference + metrics (`nerf.py:475-497`)."""
        self._require_compiled()
        metrics = self._eval_fn_for(batch)(
            self.state, batch, key if key is not None else self._eval_key)
        out = {k: float(v) for k, v in metrics.items()}
        for k, v in out.items():
            self.val_metrics[k].update(v)
        return out

    def predict_and_render_images(self, rays, key=None,
                                  with_weights: bool = True,
                                  coarse_image: bool = True
                                  ) -> tuple[dict, dict]:
        """Render full images: ``(coarse, fine)`` dicts of image/depth(/
        weights) (`nerf.py:229-304`). ``with_weights=False`` is the fast
        image+depth-only path for novel-view rendering (the output dicts
        then carry no ``weights`` entry — on a mesh too, where each flag
        pair is its own lazily-built band-sharded render);
        ``coarse_image=False`` additionally skips the coarse color heads
        (coarse ``image`` returns all-zero — use when only the fine render
        is consumed, as the reference CLI does)."""
        self._require_compiled()
        key = key if key is not None else self._eval_key
        args = (self.state.coarse_params, self.state.fine_params, rays, key)
        if self.quantized_render:
            self._ensure_packed_q(rays, key)
        if self.mesh is not None:
            tier = (bool(with_weights), bool(coarse_image),
                    self.quantized_render)
            render = self._mesh_render_cache.get(tier)
            if render is None:
                from keras_nerf_tpu.parallel import sharded_render
                render = jax.jit(sharded_render(
                    self.mesh, self.config, self.ray_chunks,
                    with_weights=tier[0], coarse_image=tier[1],
                    quantized=tier[2]))
                self._mesh_render_cache[tier] = render
            if self.quantized_render:
                return render(*args, self._packed_q)
            return render(*args)
        extra = {}
        if self.quantized_render:
            extra["packed_q"] = self._packed_q
        return self._render(*args, with_weights=with_weights,
                            coarse_image=coarse_image, **extra)

    def _ensure_packed_q(self, rays, key):
        """Calibrate + bake the int8 render weights once per checkpoint.

        Calibrates on this call's rays (strided over the image —
        engine.quantize_render_params). Keyed to the state OBJECT: any
        weight change (a train step, a checkpoint load) replaces
        self.state and invalidates the baked int8 weights+scales. Under a
        mesh the baked pytree is replicated across devices (the hot-path
        band renders read it without collectives)."""
        if self._packed_q is not None and self._packed_q_state is self.state:
            return
        packed_q = self._quantize_fn(
            self.state.coarse_params, self.state.fine_params, rays, key)
        if self.mesh is not None:
            from keras_nerf_tpu.parallel import replicate
            packed_q = replicate(packed_q, self.mesh)
        self._packed_q = packed_q
        self._packed_q_state = self.state
        logging.info("quantized_render: int8 weights calibrated")

    # --------------------------------------------- occupancy-grid rendering

    def bake_occupancy(self, grid_size: int = 64, sigma_threshold: float = 1.0,
                       dilate: int = 1, aabb=None) -> "jax.Array":
        """Bake a binary occupancy grid from the trained FINE model's
        density (opt-in novel-view acceleration; `ops/occupancy.py`)."""
        self._require_compiled()
        from keras_nerf_tpu.ops import occupancy as occ_mod
        if aabb is None:
            aabb = occ_mod.DEFAULT_AABB
        # Normalize to a hashable tuple-of-tuples: render_occupancy passes
        # the aabb as a jit STATIC argument (lists/arrays would crash there).
        aabb = tuple(tuple(float(v) for v in row) for row in aabb)
        density = occ_mod.model_density_fn(self.state.fine_params,
                                           self.config)
        self.occ_grid = occ_mod.bake_occupancy_grid(
            density, grid_size, aabb, sigma_threshold, dilate)
        self._occ_aabb = aabb
        self._mesh_occ_cache = {}
        if self.mesh is not None:
            # Replicate once at bake time so the per-frame band renders
            # read the grid without collectives or re-layout.
            from keras_nerf_tpu.parallel import replicate
            self.occ_grid = replicate(self.occ_grid, self.mesh)
        logging.info("Baked %d^3 occupancy grid: %.1f%% occupied",
                     grid_size, 100.0 * float(jnp.mean(self.occ_grid)))
        return self.occ_grid

    def render_occupancy(self, rays, key=None, near: float = 2.0,
                         far: float = 6.0, n_samples: int = 64,
                         n_probe: int = 64) -> dict:
        """Occupancy-accelerated novel-view render (fine model only,
        ``n_samples`` MLP evaluations per ray inside occupied space).
        Returns a fine-style dict ``{'image', 'depth'}``. Requires
        :meth:`bake_occupancy` first. Under a mesh the render is
        height-band sharded like :meth:`predict_and_render_images`
        (grid replicated, per-band key folds, no hot-path collectives).
        When compiled with ``quantized_render=True`` the fine MLP runs
        the int8 W8A8 kernels over the occupancy-placed samples (the two
        tiers compose; sampling/quadrature math untouched)."""
        self._require_compiled()
        if getattr(self, "occ_grid", None) is None:
            raise RuntimeError("call bake_occupancy() before "
                               "render_occupancy()")
        key = key if key is not None else self._eval_key
        quantized = self.quantized_render
        if quantized:
            # Calibrates on this call's rays (strided full-image coverage,
            # exactly as the standard quantized render path).
            self._ensure_packed_q(rays, key)
            fine_q = self._packed_q[1]
        if self.mesh is not None:
            tier = (float(near), float(far), int(n_samples), int(n_probe),
                    quantized)
            render = self._mesh_occ_cache.get(tier)
            if render is None:
                from keras_nerf_tpu.parallel import sharded_render_occ
                render = jax.jit(sharded_render_occ(
                    self.mesh, self.config, self.ray_chunks,
                    near=near, far=far, n_samples=n_samples,
                    n_probe=n_probe, aabb=self._occ_aabb,
                    quantized=quantized))
                self._mesh_occ_cache[tier] = render
            args = (self.state.fine_params, rays, self.occ_grid, key)
            return render(*args, fine_q) if quantized else render(*args)
        from keras_nerf_tpu.ops import occupancy as occ_mod
        return occ_mod.render_image_batch_occ(
            self.state.fine_params, rays, self.occ_grid, key, self.config,
            near=near, far=far, n_samples=n_samples, n_probe=n_probe,
            ray_chunks=self.ray_chunks, aabb=self._occ_aabb,
            packed_q=fine_q if quantized else None)

    def _prepare_eval_dataset(self, dataset):
        """Splits smaller than the (global) batch size yield zero batches
        under drop_remainder — rebatch down instead of silently returning
        all-zero means. Under a mesh, a rebatched size that no longer
        divides the device count cannot carry the batch sharding (the
        unsharded eval fallback handles the step itself)."""
        if (hasattr(dataset, "num_examples") and hasattr(dataset, "rebatch")
                and len(dataset) == 0 and dataset.num_examples > 0):
            logging.warning(
                "evaluate: dataset has %d images < batch size %d; rebatching",
                dataset.num_examples, dataset.batch_size)
            dataset = dataset.rebatch(dataset.num_examples)
            if (self.mesh is not None and not self.shard_rays
                    and dataset.batch_size
                    % int(self.mesh.devices.size) != 0):
                # (Under --shard_rays the height axis carries the sharding
                # and rebatching the leading axis leaves it valid.)
                dataset.sharding = None
        return dataset

    def evaluate(self, dataset, key=None) -> dict[str, float]:
        """Run test_step over a dataset; returns mean metrics (the Keras
        ``evaluate`` equivalent over the engine's `nerf.py:475-497` path)."""
        self._require_compiled()
        dataset = self._prepare_eval_dataset(dataset)
        for tracker in self.val_metrics.values():
            tracker.reset()
        n_batches = 0
        for batch in dataset:
            self.test_step(batch, key)
            n_batches += 1
        if n_batches == 0:
            raise ValueError("evaluate: dataset yielded no batches")
        return {k: t.result() for k, t in self.val_metrics.items()}

    # -------------------------------------------------------------------- fit

    def fit(self, train_dataset, validation_data=None, epochs: int = 1,
            initial_epoch: int = 0, callbacks=(), verbose: bool = True):
        """Keras-style epoch loop with per-epoch metric means and callbacks.

        Callbacks get ``cb.set_model(self)`` then
        ``cb.on_epoch_end(epoch, logs)`` with train + ``val_``-prefixed
        metrics — the contract `NeRFTrainMonitor` expects
        (`callback.py:113-222`).
        """
        self._require_compiled()
        for cb in callbacks:
            if hasattr(cb, "set_model"):
                cb.set_model(self)

        # Pixel-sampling batches are scrambled (image, pixel) draws: the
        # windowed train SSIM columns are over non-images and not
        # meaningful (loss/PSNR are exact; val metrics use whole images).
        if getattr(train_dataset, "PIXELWISE_METRICS_ONLY", False):
            logging.warning(
                "pixel-sampling mode: train coarse_ssim/fine_ssim are "
                "computed over scrambled pixel batches — ignore them "
                "(val_*_ssim remain whole-image and meaningful)")

        # Deferred metric fetching: each step's metrics are tiny device
        # scalars; fetching them per step would block the host on the device
        # (one round trip per step — dominant on a tunneled TPU) and kill
        # dispatch pipelining. Unless a verbose callback actually consumes
        # per-batch metrics (the monitor's debug renders), steps are enqueued
        # back-to-back and metrics come to host ONCE per epoch.
        eager_metrics = any(
            hasattr(cb, "on_train_batch_end") and getattr(cb, "verbose", True)
            for cb in callbacks)

        history = []
        for epoch in range(initial_epoch, epochs):
            self._maybe_update_occupancy_train(epoch, train_dataset)
            for tracker in (*self.metrics.values(),
                            *self.val_metrics.values()):
                tracker.reset()

            # Per-batch live progress (the reference gets this implicitly
            # from the Keras fit progress bar).
            batches = train_dataset
            bar = None
            total = (len(train_dataset)
                     if hasattr(train_dataset, "__len__") else None)
            if verbose:
                from tqdm import tqdm
                bar = tqdm(train_dataset, desc=f"Epoch {epoch + 1}/{epochs}",
                           unit="batch", leave=False, total=total)
                batches = bar
            # In lazy mode, refresh the live numbers a bounded number of
            # times per epoch (each refresh is one device sync).
            postfix_every = max(1, (total or 10) // 4)

            pending = []
            for batch_idx, batch in enumerate(batches):
                if eager_metrics:
                    step_metrics = self.train_step(batch)
                    for cb in callbacks:
                        if hasattr(cb, "on_train_batch_end"):
                            cb.on_train_batch_end(batch_idx, step_metrics)
                else:
                    self.state, metrics = self._run_train_step(
                        batch, self._next_key(),
                        indices=getattr(train_dataset, "last_indices",
                                        None))
                    pending.append(metrics)
                    if bar is None or (batch_idx + 1) % postfix_every:
                        continue
                    step_metrics = {k: float(v) for k, v in metrics.items()}
                if bar is not None:
                    bar.set_postfix(
                        {"fine_loss": f"{step_metrics['fine_loss']:.2e}",
                         "fine_psnr": f"{step_metrics['fine_psnr']:.2f}",
                         "rays/s": f"{self.num_rays * (batch_idx + 1) / max(bar.format_dict['elapsed'], 1e-9):,.0f}"})
            if bar is not None:
                bar.close()

            if pending:
                # One host fetch for the whole epoch's step metrics.
                fetched = jax.device_get(pending)
                for batch_idx, step_metrics in enumerate(fetched):
                    for k, v in step_metrics.items():
                        if k in self.metrics:
                            self.metrics[k].update(float(v))
                    self._warn_grad_health(
                        step_metrics, f"(epoch {epoch} batch {batch_idx})")
                    for cb in callbacks:
                        if hasattr(cb, "on_train_batch_end"):
                            cb.on_train_batch_end(
                                batch_idx,
                                {k: float(v)
                                 for k, v in step_metrics.items()})

            if validation_data is not None:
                if epoch == initial_epoch:
                    validation_data = self._prepare_eval_dataset(
                        validation_data)
                # Same deferred fetch for validation: enqueue every eval
                # step, sync once.
                val_pending = [
                    self._eval_fn_for(batch)(self.state, batch,
                                             self._eval_key)
                    for batch in validation_data]
                for step_metrics in jax.device_get(val_pending):
                    for k, v in step_metrics.items():
                        if k in self.val_metrics:
                            self.val_metrics[k].update(float(v))

            logs = {k: t.result() for k, t in self.metrics.items()}
            logs.update({f"val_{k}": t.result()
                         for k, t in self.val_metrics.items()})
            history.append(logs)
            if verbose:
                logging.info(
                    "epoch %d: %s", epoch,
                    " ".join(f"{k}={v:.4f}" for k, v in logs.items()))
            for cb in callbacks:
                if hasattr(cb, "on_epoch_end"):
                    cb.on_epoch_end(epoch, logs)
        return history

    # ----------------------------------------------------------- persistence

    def save_model(self, path: str, weights_only: bool = False):
        """Config JSON + per-model weights (+ optimizer) (`nerf.py:45-64`)."""
        if self.state is None:
            raise RuntimeError("no state to save; compile() first")
        checkpoint.save_model(path, self.state, self.config,
                              weights_only=weights_only,
                              train_config=getattr(
                                  self, "_train_config", None))

    def load_model(self, path: str):
        """Restore config + weights from a checkpoint directory
        (`nerf.py:66-76`).

        ``model_config.json`` carries the 7 architecture keys only;
        runtime options the checkpoint does not record (white_background,
        compute_dtype, use_pallas, fast_render) are preserved from the
        current config — compiled step/render closures therefore stay
        consistent with ``self.config`` whenever the loaded architecture
        matches (a mismatched architecture fails the weight-tree load).
        Weight-derived caches (occupancy grid, int8 scales) are
        invalidated."""
        old = self.config
        self.config = checkpoint.load_model_config(
            path, white_background=old.white_background,
            compute_dtype=old.compute_dtype, use_pallas=old.use_pallas,
            fast_render=old.fast_render)
        self.model_path = path
        if self.state is not None:
            self.state = checkpoint.load_train_state(path, self.state)
        # The baked occupancy grid belongs to the previous weights; the
        # int8 calibration invalidates itself via state-object identity.
        self.occ_grid = None
        self._mesh_occ_cache = {}
