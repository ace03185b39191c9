"""Profiling helpers (SURVEY.md §5 tracing: the reference only had Stopwatch
prints, AbstractComputeCollection.cs:165-188; here: phase timers + JAX
profiler trace capture for XProf/Perfetto)."""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class PhaseTimer:
    """Accumulates wall-clock per named phase."""

    totals: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {v:.3f}s/{self.counts[k]}x" for k, v in self.totals.items()
        )


@contextlib.contextmanager
def jax_trace(log_dir: str | None):
    """Capture a JAX profiler trace (view with XProf/TensorBoard) if log_dir."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir, create_perfetto_link=False):
        yield
