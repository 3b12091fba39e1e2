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
# sharply on this 1-core box (measured 14:10 cold -> 5:20 warm), both
# within a run and across runs. The dir is keyed by the host's CPU feature
# set: XLA:CPU AOT executables are machine-specific, and loading an entry
# compiled on a different VM generation logs "could lead to execution
# errors such as SIGILL" — a fresh cache per machine type avoids that.
import hashlib  # noqa: E402

_cpu_flags = ""
try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.startswith(("flags", "Features")):
                _cpu_flags = _line
                break
except OSError:
    pass
_tag = hashlib.sha1(_cpu_flags.encode()).hexdigest()[:8]
# Root the cache in the user's home (fall back to the system tempdir
# on boxes where home is not writable) rather than a literal /root.
import os  # noqa: E402
import tempfile  # noqa: E402
_cache_root = os.path.expanduser("~")
if not os.access(_cache_root, os.W_OK):
    _cache_root = tempfile.gettempdir()
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_cache_root, f".jax_cache_cpu_{_tag}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
