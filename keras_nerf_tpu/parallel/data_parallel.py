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


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D ``("data",)`` mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


# Batch pytree: (images [B,H,W,4], (origin, direction, points) each [B,...]).
_BATCH_SPEC = (P(DATA_AXIS), (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)))
# Rays sharded by image height (band rendering): [B, H, W, ...].
_RAYS_BAND_SPEC = (P(None, DATA_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS))
_RENDER_OUT_SPEC = (
    {"image": P(None, DATA_AXIS), "depth": P(None, DATA_AXIS),
     "weights": P(None, DATA_AXIS)},
) * 2


def sharded_train_step(mesh: Mesh, optimizer, config: NeRFConfig,
                       ray_chunks: int):
    """shard_map-wrapped train step: global batch in, replicated state out."""
    step = partial(engine.train_step, optimizer=optimizer, config=config,
                   ray_chunks=ray_chunks, axis_name=DATA_AXIS)
    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), _BATCH_SPEC, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )


def sharded_eval_step(mesh: Mesh, config: NeRFConfig, ray_chunks: int):
    """shard_map-wrapped eval step over the image-batch axis."""
    step = partial(engine.eval_step, config=config, ray_chunks=ray_chunks,
                   axis_name=DATA_AXIS)
    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), _BATCH_SPEC, P()),
        out_specs=P(),
        check_vma=False,
    )


def sharded_render(mesh: Mesh, config: NeRFConfig, ray_chunks: int):
    """shard_map-wrapped full-image render, sharded by image height bands."""
    def render(coarse_params, fine_params, rays, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return engine.render_image_batch(
            coarse_params, fine_params, rays, key, config, ray_chunks)

    return jax.shard_map(
        render, mesh=mesh,
        in_specs=(P(), P(), _RAYS_BAND_SPEC, P()),
        out_specs=_RENDER_OUT_SPEC,
        check_vma=False,
    )


def shard_batch_fns(mesh: Mesh, train_fn, eval_fn, render_fn):
    """Build (train, eval, render) sharded equivalents of the partial-applied
    single-device engine functions (used by ``NeRF.compile(mesh=...)``).

    The partials carry (optimizer, config, ray_chunks) in their keywords —
    re-wrap them with the mesh axis threaded through.
    """
    t_kw = train_fn.keywords
    e_kw = eval_fn.keywords
    r_kw = render_fn.keywords
    return (
        sharded_train_step(mesh, t_kw["optimizer"], t_kw["config"],
                           t_kw["ray_chunks"]),
        sharded_eval_step(mesh, e_kw["config"], e_kw["ray_chunks"]),
        sharded_render(mesh, r_kw["config"], r_kw["ray_chunks"]),
    )


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated across the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Place a (images, rays) batch sharded along its leading axis."""
    sharding = jax.sharding.NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
