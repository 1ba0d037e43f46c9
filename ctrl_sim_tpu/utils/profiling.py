"""Profiling & observability.

The reference has no tracing (SURVEY.md §5 — only an SFML fps counter).
Here env-steps/s is a first-class metric: ``StepMeter`` tracks wall-time
per phase with forced materialization (through a tunneled device,
``block_until_ready`` alone may not await execution), and
``trace_annotation`` wraps ``jax.profiler`` traces for xplane/perfetto
capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


class StepMeter:
    """Accumulates per-phase wall time and derived rates."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, materialize=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if materialize is not None:
                # force a device->host transfer so the timing is honest
                np.asarray(jax.tree_util.tree_leaves(materialize)[0]).ravel()[:1]
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def rate(self, name: str, units_per_call: float) -> float:
        """units/second for a phase (e.g. env-steps per rollout call)."""
        if self.totals[name] == 0:
            return 0.0
        return self.counts[name] * units_per_call / self.totals[name]

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "calls": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler.TraceAnnotation wrapper (no-op safe)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def grad_global_norms(grads) -> dict:
    """Per-top-level-module gradient 2-norms (the reference logs per-layer
    grad norms via Lightning's grad_norm, models/ctrl_sim.py:231-238)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    agg: dict[str, float] = defaultdict(float)
    for path, leaf in flat:
        keys = [p.key for p in path if hasattr(p, "key")]
        top = "/".join(keys[:3]) if keys else "params"
        agg[top] += float(np.sum(np.square(np.asarray(leaf, dtype=np.float64))))
    return {k: float(np.sqrt(v)) for k, v in agg.items()}
