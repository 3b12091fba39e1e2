"""Pallas TPU kernels: the fused ray-march MLP."""

from keras_nerf_tpu.kernels.ray_march import (
    fused_apply_mlp,
    fused_mlp_backward,
    fused_point_forward,
    fused_render_chunk,
    pack_mlp_params,
    unpack_grads,
)

__all__ = [
    "fused_apply_mlp",
    "fused_mlp_backward",
    "fused_point_forward",
    "fused_render_chunk",
    "pack_mlp_params",
    "unpack_grads",
]
