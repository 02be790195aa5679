"""Test harness config: force an 8-device virtual CPU platform.

The container's sitecustomize imports jax at interpreter startup (to register
the axon TPU plugin), so setting JAX_PLATFORMS via os.environ here is too
late — jax.config already snapshotted the env. Instead we switch platform via
jax.config.update BEFORE any backend initializes. Multi-device sharding tests
then see jax.device_count() == 8 without real TPU hardware (SURVEY.md §4 test
strategy, item d) and, critically, tests never touch the remote-compile TPU
tunnel (every eager op there is a network round-trip).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: model-compile-heavy tests are ~8 minutes cold
# on this 1-core host, seconds warm.
from lyft3d_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} "
    f"({jax.devices()[0].platform})"
)
