"""Test configuration: run JAX on a virtual 8-device CPU mesh so that
shard_map / psum / SyncBN paths are exercised without TPU hardware.

Note: this image registers a TPU PJRT plugin from sitecustomize at interpreter
start, so JAX is already imported and env vars like JAX_PLATFORMS/XLA_FLAGS
are captured before conftest runs.  jax.config.update still works because the
backend itself is initialized lazily (on first jax.devices()/dispatch).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
