"""Core NeRF math kernels: pure, jit-able JAX functions."""

from keras_nerf_tpu.ops.encoding import (
    encode_position_and_directions,
    encoded_dim,
    positional_encoding,
)
from keras_nerf_tpu.ops.metrics import mse, psnr, ssim
from keras_nerf_tpu.ops.rendering import RenderOutput, exclusive_cumprod, render_rays
from keras_nerf_tpu.ops.sampling import (
    batched_searchsorted_right,
    invert_cdf,
    merge_sorted,
    midpoints,
    sample_pdf,
    sample_pdf_sorted,
    sorted_uniforms,
    stratified_sample_points,
)

__all__ = [
    "RenderOutput",
    "batched_searchsorted_right",
    "encode_position_and_directions",
    "encoded_dim",
    "exclusive_cumprod",
    "invert_cdf",
    "merge_sorted",
    "midpoints",
    "mse",
    "positional_encoding",
    "psnr",
    "render_rays",
    "sample_pdf",
    "sample_pdf_sorted",
    "sorted_uniforms",
    "ssim",
    "stratified_sample_points",
]
