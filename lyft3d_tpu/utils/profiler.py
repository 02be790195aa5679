"""Section timing + device profiling.

Capability of the reference's built-in profiler
(``voxelnet.py:191-228``: start_timer/end_timer pairs with cuda sync around
VFE/middle/RPN/loss, a ``profiler()`` contextmanager, per-display averaged
ms; ``second/utils/timer.py`` ``simple_timer``) — here timers call
``jax.block_until_ready`` on a sentinel and we additionally expose
``jax.profiler`` traces (the proper tool on TPU).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

__all__ = ["SectionTimers", "simple_timer", "trace"]


class SectionTimers:
    """Named running-average wall timers (enable like measure_time=True)."""

    def __init__(self, enabled: bool = True, sync: bool = True):
        self.enabled = enabled
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sentinel=None):
        """Time a block; pass the block's output array as ``sentinel`` via
        ``set_sentinel`` for accurate async-dispatch timing."""
        if not self.enabled:
            self._box = {}
            yield self
            return
        box = {}
        self._box = box
        t0 = time.perf_counter()
        yield self
        if self.sync and box.get("sentinel") is not None:
            jax.block_until_ready(box["sentinel"])
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def set_sentinel(self, value):
        self._box["sentinel"] = value
        return value

    def averages_ms(self) -> Dict[str, float]:
        return {
            k: 1000.0 * self.totals[k] / max(self.counts[k], 1) for k in self.totals
        }

    def clear(self) -> None:
        self.totals.clear()
        self.counts.clear()

    def report(self) -> str:
        return ", ".join(f"{k}={v:.2f}ms" for k, v in sorted(self.averages_ms().items()))


@contextlib.contextmanager
def simple_timer(name: str = ""):
    """Print-elapsed context manager (second/utils/timer.py)."""
    t0 = time.perf_counter()
    yield
    print(f"{name} elapsed: {time.perf_counter() - t0:.4f}s")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace wrapper (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
