"""Profiling + memory introspection.

Replaces the reference's ad-hoc timing (reference: api.py:301-438
time.time() prints with cuda sync) and GPU-memory snapshot utilities
(depth_anything_3/utils/memory.py:16, services/backend.py:1235
/gpu-memory) with jax.profiler traces, synchronized stage timers, and
HBM stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np

from recondet3d.utils.logger import get_logger

logger = get_logger("recondet3d.profiling")

__all__ = ["StageTimer", "trace", "device_memory_snapshot", "cleanup_device_memory"]


class StageTimer:
    """Synchronized per-stage wall-clock accumulation.

    >>> t = StageTimer()
    >>> with t.stage("forward"):
    ...     out = fwd(x); t.sync(out)
    >>> t.summary()
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    @staticmethod
    def sync(x):
        """Force completion (device_get; block_until_ready is unreliable on
        tunneled backends)."""
        import jax

        jax.tree_util.tree_map(lambda a: np.asarray(a) if hasattr(a, "shape") else a, x)

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in sorted(self.totals)
        }

    def log_summary(self):
        for k, v in self.summary().items():
            logger.info(f"{k}: {v * 1e3:.1f} ms avg over {self.counts[k]} calls")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_snapshot() -> dict:
    """HBM usage stats (the /gpu-memory endpoint's source)."""
    import jax

    out = {}
    for i, d in enumerate(jax.local_devices()):
        stats = d.memory_stats() or {}
        out[f"device_{i}"] = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    return out


def cleanup_device_memory():
    """Drop cached buffers (the reference calls empty_cache; in JAX live
    arrays hold memory — trigger a GC so dead buffers free)."""
    import gc

    gc.collect()
