"""One shared persistent-compile-cache setup (bench / driver entry / tests).

XLA:CPU cache entries are AOT machine code — cross-microarch reuse can
SIGILL — so the cache dir is keyed by the host CPU's feature flags. TPU
entries are program-keyed and safe to share across runs on the same host.
"""

from __future__ import annotations

import hashlib

__all__ = ["enable_compile_cache"]


def enable_compile_cache() -> None:
    """Point jax at /tmp/jax_cache_<cpu-key> and persist even fast compiles.

    Never raises: the cache is an optimization, not a dependency — callers
    (bench watchdog path, driver dryrun, test harness) must not fail over it.
    """
    import jax

    try:
        try:
            with open("/proc/cpuinfo") as f:
                flags = [l for l in f if l.startswith("flags")][:1]
            key = hashlib.sha1("".join(flags).encode()).hexdigest()[:12]
        except OSError:
            key = "generic"
        jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{key}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
