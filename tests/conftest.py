"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU platform BEFORE the backend
initializes, so:

* tests are hermetic and fast (no TPU / tunnel required),
* the shard_map / mesh data-parallel paths are exercised on 8 fake devices
  (SURVEY.md §4's multi-device test strategy).

NOTE: the environment's sitecustomize registers a remote-TPU ("axon") PJRT
plugin and sets ``jax_platforms="axon,cpu"`` via jax.config at interpreter
start — plain ``JAX_PLATFORMS=cpu`` env vars are therefore ignored; the
config must be re-updated here, before any JAX computation runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: many tests compile the same tiny-config step
# functions (each NeRF.compile() makes fresh jit wrappers); serving those
# from the on-disk XLA cache instead of recompiling cuts suite wall time
# sharply on this 1-core box, both within a run and across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
