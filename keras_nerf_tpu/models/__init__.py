"""Model tier: MLP pytrees and the coarse+fine NeRF training engine."""

from keras_nerf_tpu.models.mlp import (
    MLPConfig,
    apply_mlp,
    init_mlp,
    param_count,
)

__all__ = [
    "MLPConfig",
    "apply_mlp",
    "init_mlp",
    "param_count",
]
