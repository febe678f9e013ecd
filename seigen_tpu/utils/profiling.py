"""Per-stage timing + structured run reports (SURVEY.md §7.1, §7.5).

Rebuild of the reference's pybench region timers + PETSc -log_view: a tiny
wall-clock region timer (device-synchronizing), JSON run reports, and a
jax.profiler trace helper for deep dives.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

import jax


class RegionTimer:
    """Accumulating wall-clock regions; .report() -> dict of seconds."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def region(self, name: str, sync: jax.Array | None = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {"seconds": self.totals[name], "calls": self.counts[name]}
            for name in self.totals
        }


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace (TensorBoard-compatible)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def write_run_report(path: str, config: dict, timings: dict, extra: dict | None = None):
    """Structured per-run JSON: config + timings + results pointers."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {"config": config, "timings": timings}
    if extra:
        payload.update(extra)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)
