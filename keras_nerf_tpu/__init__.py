"""keras_nerf_tpu — a TPU-native JAX/Pallas NeRF framework.

A from-scratch rebuild of the capabilities of the TF2/Keras reference
``naufalso/keras_nerf`` (see SURVEY.md), designed TPU-first:

* pure functional core ops (``ops/``) that jit and fuse under XLA;
* parameter-pytree MLPs (``models/``) with bfloat16 MXU compute paths;
* a jit-compiled device-side data pipeline (``data/``);
* shard_map data parallelism over TPU meshes (``parallel/``);
* fused Pallas ray-march kernels (``kernels/``).
"""

__version__ = "0.1.0"
