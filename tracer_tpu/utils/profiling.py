"""Profiling / tracing subsystem.

The reference has no profiling wired in (SURVEY.md section 5 — only perf
TODO comments); here tracing is first-class: JAX profiler traces for
xprof/tensorboard plus simple wall-clock phase timers with a
device-synchronizing context manager.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating wall-clock timer keyed by phase name.

    Synchronizes the device at phase end so times cover real execution,
    not async dispatch.
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        lines = [f"{name:30s} {total * 1000:10.2f} ms "
                 f"({self.counts[name]} calls, "
                 f"{total * 1000 / max(self.counts[name], 1):8.2f} ms/call)"
                 for name, total in rows]
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps({k: {"total_s": v, "calls": self.counts[k]}
                           for k, v in self.totals.items()})


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_stats(fn, *args, **kwargs):
    """Lower+compile fn and return XLA's cost analysis (flops, bytes
    accessed ...) without running it — per-kernel visibility analogous to
    `futhark bench`'s reporting."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        return compiled.cost_analysis()
    except Exception:
        return {}
