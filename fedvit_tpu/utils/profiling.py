"""Profiling / tracing hooks (SURVEY.md §5 — absent in the reference, whose
only instrumentation is wall-clock per epoch + tqdm running loss).

* `trace(dir)`      — context manager around jax.profiler (XLA trace viewable
                      in TensorBoard / xprof)
* `StepTimer`       — per-step wall-clock stats with compile-step exclusion
* `annotate(name)`  — named TraceAnnotation for host-side phases
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Track per-step times; first `skip` steps (compile) excluded from stats."""

    def __init__(self, skip: int = 2):
        self.skip = skip
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def stats(self) -> Dict[str, float]:
        xs = self.times[self.skip:] or self.times
        if not xs:
            return {"mean_s": 0.0, "p50_s": 0.0, "max_s": 0.0, "steps": 0}
        xs_sorted = sorted(xs)
        return {
            "mean_s": sum(xs) / len(xs),
            "p50_s": xs_sorted[len(xs) // 2],
            "max_s": xs_sorted[-1],
            "steps": len(xs),
        }
