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
TRAIN_CONFIG = "train_config.json"


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
    train_config: dict | None = None,
) -> None:
    """Write config + weights (+ optimizer state) to ``path``.

    ``weights_only`` skips re-writing ``model_config.json`` (the reference's
    periodic-save behavior, `callback.py:220-222`). ``train_config``, when
    given, is persisted as ``train_config.json`` so a resume can detect
    hyperparameter drift (lr schedule, optimizer) against the run that
    produced the checkpoint — the reference persists only the 7 model keys
    (`nerf.py:47-61`), which made silent lr-mismatch resumes possible.
    """
    os.makedirs(path, exist_ok=True)
    if not weights_only:
        with open(os.path.join(path, MODEL_CONFIG), "w") as f:
            json.dump(config.to_model_config(), f)
    if train_config is not None:
        with open(os.path.join(path, TRAIN_CONFIG), "w") as f:
            json.dump(train_config, f)
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


def load_train_config(path: str) -> dict | None:
    """Read ``train_config.json`` if the checkpoint has one (older
    checkpoints and reference imports don't)."""
    p = os.path.join(path, TRAIN_CONFIG)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def warn_train_config_mismatch(path: str, current: dict) -> list[str]:
    """Compare the resuming run's training hyperparameters against the
    checkpoint's persisted ones; WARN per differing key. Explicit flags
    still win (training continues with ``current``) — this exists so a
    resume launched with different/default flags is loud instead of
    silently diverging (e.g. a forgotten ``--lr_final`` resets the lr
    schedule AND invalidates the optimizer-state tree). Returns the list
    of mismatched keys."""
    import logging
    saved = load_train_config(path)
    if saved is None:
        return []
    mismatched = []
    for key, cur in current.items():
        if key in saved and saved[key] != cur:
            mismatched.append(key)
            logging.warning(
                "resume hyperparameter mismatch: %s was %r when the "
                "checkpoint in %s was written, but this run uses %r — "
                "continuing with %r (pass the original flag to match "
                "the checkpointed run)",
                key, saved[key], path, cur, cur)
    return mismatched


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
