"""Model tier: MLP pytrees and the coarse+fine NeRF training engine."""

from keras_nerf_tpu.models.engine import (
    NeRFConfig,
    TrainState,
    eval_step,
    init_params,
    init_train_state,
    make_optimizer,
    render_chunk,
    render_chunk_pair,
    render_image_batch,
    train_step,
)
from keras_nerf_tpu.models.mlp import (
    MLPConfig,
    apply_mlp,
    init_mlp,
    param_count,
)
from keras_nerf_tpu.models.nerf import NeRF

__all__ = [
    "MLPConfig",
    "NeRF",
    "NeRFConfig",
    "TrainState",
    "apply_mlp",
    "eval_step",
    "init_mlp",
    "init_params",
    "init_train_state",
    "make_optimizer",
    "param_count",
    "render_chunk",
    "render_chunk_pair",
    "render_image_batch",
    "train_step",
]
