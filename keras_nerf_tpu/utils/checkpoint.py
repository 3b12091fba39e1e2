"""Model (de)serialization.

Same artifact contract as the reference (`nerf.py:45-76`): a directory with
``model_config.json`` (7 hyperparameter keys) plus one weights file per MLP —
here JAX-native msgpack (``coarse.msgpack`` / ``fine.msgpack`` via
flax.serialization) instead of HDF5.

Improvement over the reference (SURVEY.md §5 "checkpoint/resume"): optimizer
state is ALSO checkpointed (``optimizer.msgpack``) so resume restores Adam
moments exactly; the reference restarts them from zero (`nerf.py:66-76`
loads weights only).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from keras_nerf_tpu.models.engine import NeRFConfig, TrainState

COARSE_WEIGHTS = "coarse.msgpack"
FINE_WEIGHTS = "fine.msgpack"
OPTIMIZER_STATE = "optimizer.msgpack"
MODEL_CONFIG = "model_config.json"


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _serialize(tree: Any) -> bytes:
    """Pytree -> msgpack bytes via flax's state-dict form (tuples/NamedTuples
    like optax states are not directly msgpack-able)."""
    return serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(tree)))


def _deserialize(target: Any, data: bytes) -> Any:
    return serialization.from_state_dict(
        target, serialization.msgpack_restore(data))


def save_model(
    path: str,
    state: TrainState,
    config: NeRFConfig,
    weights_only: bool = False,
    include_optimizer: bool = True,
) -> None:
    """Write config + weights (+ optimizer state) to ``path``.

    ``weights_only`` skips re-writing ``model_config.json`` (the reference's
    periodic-save behavior, `callback.py:220-222`).
    """
    os.makedirs(path, exist_ok=True)
    if not weights_only:
        with open(os.path.join(path, MODEL_CONFIG), "w") as f:
            json.dump(config.to_model_config(), f)
    with open(os.path.join(path, COARSE_WEIGHTS), "wb") as f:
        f.write(_serialize(state.coarse_params))
    with open(os.path.join(path, FINE_WEIGHTS), "wb") as f:
        f.write(_serialize(state.fine_params))
    if include_optimizer:
        opt = {"coarse": state.coarse_opt, "fine": state.fine_opt,
               "step": state.step}
        with open(os.path.join(path, OPTIMIZER_STATE), "wb") as f:
            f.write(_serialize(opt))


def load_model_config(path: str, **overrides) -> NeRFConfig:
    """Read ``model_config.json`` -> :class:`NeRFConfig` (`nerf.py:66-76`)."""
    with open(os.path.join(path, MODEL_CONFIG)) as f:
        return NeRFConfig.from_model_config(json.load(f), **overrides)


def has_weights(path: str) -> bool:
    """Resume-detection: both weight files exist (the working variant of the
    reference's two inconsistent checks — `train_single.py:91-92`)."""
    return (os.path.exists(os.path.join(path, COARSE_WEIGHTS))
            and os.path.exists(os.path.join(path, FINE_WEIGHTS)))


def maybe_import_reference(path: str) -> bool:
    """If ``path`` holds a reference ``.h5`` artifact but no msgpack
    weights, convert it in place (`utils/import_h5.py`). Returns True if
    an import ran. Lets the CLIs point straight at a reference-trained
    model directory (`nerf.py:45-76` artifact contract)."""
    if has_weights(path):
        return False
    try:
        from keras_nerf_tpu.utils.import_h5 import (
            find_h5_pair, import_reference_model)
    except ImportError:  # h5py unavailable
        return False
    if find_h5_pair(path) is None:
        return False
    import logging
    logging.info("found reference .h5 checkpoint in %s; importing", path)
    import_reference_model(path)
    return True


def load_weights(path: str, target_coarse: Any, target_fine: Any):
    """Restore both param trees from ``path`` onto same-structure targets."""
    with open(os.path.join(path, COARSE_WEIGHTS), "rb") as f:
        coarse = _deserialize(target_coarse, f.read())
    with open(os.path.join(path, FINE_WEIGHTS), "rb") as f:
        fine = _deserialize(target_fine, f.read())
    return coarse, fine


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a full TrainState; optimizer state only if checkpointed."""
    coarse, fine = load_weights(
        path, template.coarse_params, template.fine_params)
    opt_path = os.path.join(path, OPTIMIZER_STATE)
    opt_c, opt_f, step = (template.coarse_opt, template.fine_opt,
                          template.step)
    if os.path.exists(opt_path):
        target = {"coarse": template.coarse_opt, "fine": template.fine_opt,
                  "step": template.step}
        try:
            with open(opt_path, "rb") as f:
                restored = _deserialize(target, f.read())
            opt_c, opt_f = restored["coarse"], restored["fine"]
            step = jnp.asarray(restored["step"])
        except (ValueError, KeyError) as e:
            # A different optimizer/schedule config changes the optax state
            # tree (e.g. a schedule adds a count) — degrade to the
            # reference's behavior (weights-only resume, fresh moments,
            # `nerf.py:66-76`) instead of crashing the resume.
            import logging
            logging.warning(
                "optimizer state in %s does not match the compiled "
                "optimizer (%s); resuming with fresh optimizer state",
                opt_path, e)
    return TrainState(coarse_params=coarse, fine_params=fine,
                      coarse_opt=opt_c, fine_opt=opt_f, step=step)
