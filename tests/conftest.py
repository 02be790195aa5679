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
# on this 1-core host, seconds warm. Keyed by host CPU flags — XLA:CPU AOT
# entries are microarch-specific and cross-machine reuse can SIGILL.
import hashlib

try:
    with open("/proc/cpuinfo") as _f:
        _flags = [l for l in _f if l.startswith("flags")][:1]
    _cpu_key = hashlib.sha1("".join(_flags).encode()).hexdigest()[:12]
except OSError:
    _cpu_key = "generic"
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{_cpu_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} "
    f"({jax.devices()[0].platform})"
)
