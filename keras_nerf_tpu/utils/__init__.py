"""Utility tier: checkpointing, training monitor, logging."""

from keras_nerf_tpu.utils.checkpoint import (
    has_weights,
    load_model_config,
    load_train_state,
    load_weights,
    save_model,
)

__all__ = [
    "has_weights",
    "load_model_config",
    "load_train_state",
    "load_weights",
    "save_model",
]
