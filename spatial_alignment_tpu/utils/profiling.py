"""Profiling and debug toggles (SURVEY.md §5 auxiliary-subsystem parity).

The reference's only observability is ad-hoc ``time.time()`` around steps
(visium_wallclock_time.py:266-271) and a globally-enabled autograd anomaly
mode (vgpsa.py:9). Here:

  - ``StepTimer`` — steady-state steps/sec with warmup exclusion (the
    BASELINE.json metric),
  - ``trace`` — context manager around ``jax.profiler`` for device traces,
  - ``enable_debug`` — opt-in NaN debugging / runtime checks, OFF by default
    (unlike the reference's always-on anomaly mode).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["StepTimer", "trace", "enable_debug"]


class StepTimer:
    """Accumulates steady-state step timings, excluding the first
    ``warmup`` laps (compile + cache effects)."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.n = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if self.warmup > 0:
            self.warmup -= 1
        else:
            self.n += 1
            self.total += dt
        return False

    lap = __enter__  # alias: with timer.lap(): ... reads naturally

    @property
    def steps_per_sec(self) -> float:
        return self.n / self.total if self.total else float("nan")

    @property
    def seconds_per_step(self) -> float:
        return self.total / self.n if self.n else float("nan")


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace around a block: ``with trace('/tmp/trace'): step(...)``.
    View with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug(nans: bool = True, checks: bool = False):
    """Opt-in numerical debugging (off by default; the reference ships with
    anomaly detection always on, which taxes every step — SURVEY.md §2.4.1).

    nans: re-run jitted fns eagerly on NaN and raise at the producing op.
    checks: enable jax's internal invariant checking.
    """
    jax.config.update("jax_debug_nans", bool(nans))
    if checks:
        jax.config.update("jax_enable_checks", True)
