"""Test configuration: run JAX on a virtual 8-device CPU mesh so that
shard_map / psum / SyncBN paths are exercised without TPU hardware.

Note: this image registers a TPU PJRT plugin from sitecustomize at interpreter
start, so JAX is already imported and env vars like JAX_PLATFORMS/XLA_FLAGS
are captured before conftest runs.  jax.config.update still works because the
backend itself is initialized lazily (on first jax.devices()/dispatch).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the suite's cost is dominated by XLA CPU
# compiles of shard_map/GSPMD programs; repeat runs (CI, local iteration)
# skip them entirely.  Repo-local so it survives /tmp cleanup; gitignored.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_ccache")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass
