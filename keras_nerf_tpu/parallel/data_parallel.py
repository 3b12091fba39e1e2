"""Synchronous data parallelism over a TPU device mesh.

Replaces the reference's ``tf.distribute.MirroredStrategy`` + tf.data
auto-sharding (`train.py:75-84`) with the idiomatic JAX construction
(SURVEY.md §2 "distributed communication backend"):

* a 1-D ``Mesh`` over the devices with a single ``"data"`` axis;
* ``jax.shard_map`` of the per-device train/eval step over that mesh — the
  global image batch is split along its leading axis, parameters and
  optimizer state are replicated;
* gradient/metric reduction is an explicit ``lax.pmean`` inside the step
  (see :func:`keras_nerf_tpu.models.engine.train_step`'s ``axis_name``),
  which XLA lowers to ICI all-reduce collectives on a pod — no NCCL/MPI
  equivalent is written or needed;
* per-device RNG decorrelation via ``fold_in(key, axis_index)``.

Semantics match the reference's multi-GPU contract: ``global_batch =
batch_size * n_devices`` (`train.py:84`), ``--ray_chunks`` is per-device
(`train.py:139-145` passes per-replica batch size into compile), and every
device applies identical pmean-ed updates (MirroredStrategy's implicit
all-reduce).

Full-image rendering is sharded along the image HEIGHT axis instead (each
device renders a horizontal band) so monitors/inference scale to any batch
size — including batch 1 — across the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from keras_nerf_tpu.models import engine
from keras_nerf_tpu.models.engine import NeRFConfig, TrainState

DATA_AXIS = "data"
REPLICA_AXIS = "replica"


def make_mesh(n_devices: int | None = None, devices=None,
              n_slices: int = 1) -> Mesh:
    """A mesh over the first ``n_devices`` devices.

    ``n_slices == 1`` (default): a 1-D ``("data",)`` mesh — DP over ICI.
    ``n_slices > 1`` (multi-slice pods): a 2-D ``("replica", "data")`` mesh
    with the slice dimension outermost, so the batch shards over BOTH axes
    and XLA routes the inner all-reduce hop over ICI and the outer over DCN
    (the standard multi-slice DP layout; this workload has no tensor/
    pipeline dimension to place differently — docs/DESIGN.md).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # Silent truncation would let callers validate (divisibility,
            # logging) against a device count the mesh doesn't have.
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available")
        devices = devices[:n_devices]
    devices = np.asarray(devices)
    if n_slices == 1:
        return Mesh(devices, (DATA_AXIS,))
    if devices.size % n_slices:
        raise ValueError(
            f"{devices.size} devices do not divide into {n_slices} slices")
    return Mesh(devices.reshape(n_slices, -1), (REPLICA_AXIS, DATA_AXIS))


def _batch_axes(mesh: Mesh) -> tuple[str, ...]:
    """The mesh axes the image batch shards over (all of them — pure DP)."""
    return tuple(mesh.axis_names)


def _batch_spec(mesh: Mesh, shard_rays: bool = False):
    """Batch pytree spec: (images [B,...], rays tuple), all sharded along
    the leading axis over EVERY mesh axis (pure DP on 1-D and 2-D meshes).

    ``shard_rays=True`` shards the image HEIGHT axis instead (axis 1 of
    every [B, H, W, ...] array) — ray-sharded DP. Each device trains on an
    equal horizontal band of every image in the batch, so the pmean'd
    gradient computes the global-batch gradient at ANY batch size,
    including the reference's default ``--batch_size 1`` (mean over all
    rays == mean of equal per-band ray means — the same identity the
    chunked-gradient tests pin for ``--ray_chunks``). The identity is
    exact for the RNG-free math; the fine pass's importance-sample draws
    are decorrelated per band (`engine.train_step` folds the device index
    into the key), so the trajectory tracks the single-chip one at the
    sampling-noise level rather than bit-for-bit — measured ≤2e-3
    relative param drift after 3 epochs and ≤2% per-epoch metric drift
    over 20 (`tests/parallel/test_data_parallel.py`,
    `test_multi_device_fit.py`). This scales the measured single-chip
    batch-1 *trajectory* across the mesh instead of changing the global
    batch."""
    axes = _batch_axes(mesh)
    spec = P(None, axes) if shard_rays else P(axes)
    return (spec, (spec, spec, spec))


def _band_specs(mesh: Mesh, with_weights: bool = True):
    """Render specs: rays/outputs sharded by image height over all axes."""
    axes = _batch_axes(mesh)
    ray_spec = (P(None, axes), P(None, axes), P(None, axes))
    out = {"image": P(None, axes), "depth": P(None, axes)}
    if with_weights:
        out["weights"] = P(None, axes)
    return ray_spec, (out, dict(out))


def batch_sharding(mesh: Mesh,
                   shard_rays: bool = False) -> jax.sharding.NamedSharding:
    """The sharding of an (images, rays) batch under pure DP: leading
    (image-batch) axis split over every mesh axis.

    Passed to ``DatasetLoader.load_dataset(sharding=...)`` so each host
    batch is COMMITTED per-device at creation — without it every global
    batch is staged on device 0 and re-laid-out by XLA at dispatch each
    step (a per-step host/HBM bottleneck on real multi-chip hardware,
    invisible on the fake CPU mesh).

    ``shard_rays=True``: the ray-sharded DP layout (see `_batch_spec`) —
    the image HEIGHT axis is split instead of the image-batch axis."""
    spec = (P(None, _batch_axes(mesh)) if shard_rays
            else P(_batch_axes(mesh)))
    return jax.sharding.NamedSharding(mesh, spec)


def sharded_train_step(mesh: Mesh, optimizer, config: NeRFConfig,
                       ray_chunks: int, loss_fn=None, occupancy=None,
                       debug_grads: bool = False, shard_rays: bool = False):
    """shard_map-wrapped train step: global batch in, replicated state out.

    ``occupancy`` (the static spec of `engine.train_step`'s
    occupancy-train tier) adds a FOURTH operand: the baked ``[G, G, G]``
    grid, replicated across the mesh.

    ``shard_rays=True``: split the image HEIGHT axis instead of the batch
    axis (`_batch_spec`) — global batch semantics (and therefore the
    optimization trajectory) are those of the UNSHARDED step at the same
    batch size; the mesh only divides the per-step ray work."""
    step = partial(engine.train_step, optimizer=optimizer, config=config,
                   ray_chunks=ray_chunks, loss_fn=loss_fn,
                   occupancy=occupancy, debug_grads=debug_grads,
                   axis_name=_batch_axes(mesh))
    in_specs = (P(), _batch_spec(mesh, shard_rays), P())
    if occupancy is not None:
        def step_with_grid(state, batch, key, occ_grid):
            return step(state, batch, key, occ_grid)
        fn, in_specs = step_with_grid, in_specs + (P(),)
    else:
        fn = step
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )


def sharded_eval_step(mesh: Mesh, config: NeRFConfig, ray_chunks: int,
                      loss_fn=None, shard_rays: bool = False):
    """shard_map-wrapped eval step over the image-batch axis (or, with
    ``shard_rays=True``, over the image-height axis — which additionally
    lifts the batch-divisibility restriction: any batch size shards).

    Under ``shard_rays`` the per-device height bands are all-gathered back
    into whole images before PSNR/SSIM (``engine.eval_step
    gather_images``), so sharded eval metrics are whole-image numbers,
    directly comparable to single-chip runs."""
    step = partial(engine.eval_step, config=config, ray_chunks=ray_chunks,
                   loss_fn=loss_fn, axis_name=_batch_axes(mesh),
                   gather_images=shard_rays)
    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), _batch_spec(mesh, shard_rays), P()),
        out_specs=P(),
        check_vma=False,
    )


def sharded_render(mesh: Mesh, config: NeRFConfig, ray_chunks: int,
                   with_weights: bool = True, coarse_image: bool = True,
                   quantized: bool = False):
    """shard_map-wrapped full-image render, sharded by image height bands.

    ``with_weights=False`` / ``coarse_image=False`` are the same novel-view
    fast-path knobs as :func:`engine.render_image_batch` (skip the fine
    weights output / the coarse color heads) — static here because they
    change the out specs. This is the multi-chip form of the render tiers
    behind the ≥20 fps @256² v5e-8 target (docs/QUALITY.md): each device
    renders a horizontal image band, no collectives on the hot path.

    ``quantized=True`` returns a render taking a FIFTH argument: the
    ``(coarse, fine)`` int8 ``packed_q`` pytree from
    :func:`engine.quantize_render_params`, replicated across the mesh
    (the int8 render tier; calibrate once per checkpoint, then every
    device runs the W8A8 kernels on its band).
    """
    axes = _batch_axes(mesh)
    ray_spec, out_spec = _band_specs(mesh, with_weights)

    def render(coarse_params, fine_params, rays, key, *packed_q):
        key = jax.random.fold_in(key, jax.lax.axis_index(axes))
        return engine.render_image_batch(
            coarse_params, fine_params, rays, key, config, ray_chunks,
            with_weights=with_weights, coarse_image=coarse_image,
            packed_q=packed_q[0] if quantized else None)

    in_specs = (P(), P(), ray_spec, P()) + ((P(),) if quantized else ())
    return jax.shard_map(
        render, mesh=mesh,
        in_specs=in_specs,
        out_specs=out_spec,
        check_vma=False,
    )


def sharded_render_occ(mesh: Mesh, config: NeRFConfig, ray_chunks: int,
                       near: float = 2.0, far: float = 6.0,
                       n_samples: int = 64, n_probe: int = 64,
                       aabb=None, quantized: bool = False):
    """shard_map-wrapped occupancy-accelerated render (fine model only,
    empty-space skipping — `ops/occupancy.py`), sharded by image height
    bands exactly like :func:`sharded_render`.

    The baked occupancy grid rides in replicated (it is a few MB of
    binary floats); the hot path has no collectives — each device probes
    the grid and runs ``n_samples`` fine-MLP evaluations per ray on its
    band. ``ray_chunks`` is per-device, as everywhere under a mesh.

    Returns ``render(fine_params, rays, occ_grid, key) -> {'image',
    'depth'}`` (fine-style dict; occupancy replaces the coarse pass).
    ``quantized=True`` adds a FIFTH argument: the fine model's int8
    weights dict (`engine.quantize_render_params()[1]`), replicated —
    the `--quantized_render` tier composed with the occupancy grid.
    """
    from keras_nerf_tpu.ops import occupancy as occ_mod
    if aabb is None:
        aabb = occ_mod.DEFAULT_AABB
    # The inner render jits with aabb as a static arg — must be hashable.
    aabb = tuple(tuple(float(v) for v in row) for row in aabb)
    axes = _batch_axes(mesh)
    ray_spec = (P(None, axes), P(None, axes), P(None, axes))
    out_spec = {"image": P(None, axes), "depth": P(None, axes)}

    def render(fine_params, rays, occ_grid, key, *packed_q):
        key = jax.random.fold_in(key, jax.lax.axis_index(axes))
        return occ_mod.render_image_batch_occ(
            fine_params, rays, occ_grid, key, config, near=near, far=far,
            n_samples=n_samples, n_probe=n_probe, ray_chunks=ray_chunks,
            aabb=aabb, packed_q=packed_q[0] if quantized else None)

    in_specs = (P(), ray_spec, P(), P()) + ((P(),) if quantized else ())
    return jax.shard_map(render, mesh=mesh,
                         in_specs=in_specs,
                         out_specs=out_spec, check_vma=False)


def shard_batch_fns(mesh: Mesh, train_fn, eval_fn, render_fn,
                    shard_rays: bool = False):
    """Build (train, eval, render) sharded equivalents of the partial-applied
    single-device engine functions (used by ``NeRF.compile(mesh=...)``).

    The partials carry (optimizer, config, ray_chunks) in their keywords —
    re-wrap them with the mesh axis threaded through. ``shard_rays``
    selects the height-axis (ray-sharded) DP layout for train/eval; the
    full-image render is always height-banded.
    """
    t_kw = train_fn.keywords
    e_kw = eval_fn.keywords
    r_kw = render_fn.keywords
    return (
        sharded_train_step(mesh, t_kw["optimizer"], t_kw["config"],
                           t_kw["ray_chunks"], t_kw.get("loss_fn"),
                           debug_grads=t_kw.get("debug_grads", False),
                           shard_rays=shard_rays),
        sharded_eval_step(mesh, e_kw["config"], e_kw["ray_chunks"],
                          e_kw.get("loss_fn"), shard_rays=shard_rays),
        sharded_render(mesh, r_kw["config"], r_kw["ray_chunks"]),
    )


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated across the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, shard_rays: bool = False):
    """Place a (images, rays) batch sharded along its leading axis (over all
    mesh axes); ``shard_rays=True`` shards the height axis instead."""
    sharding = batch_sharding(mesh, shard_rays)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
