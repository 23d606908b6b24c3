"""Tracing / profiling hooks (aux subsystem).

The reference has only ad-hoc wall-clock prints (train.py:84,126-129).
Here: a jax-profiler trace context, a step timer with percentile summary,
and a simple metrics logger that writes JSONL (greppable, plottable).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fots_trace"):
    """Capture a jax profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Per-step wall-clock stats with percentile summary."""

    times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np

        a = np.asarray(self.times)
        return {
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "p99_s": float(np.percentile(a, 99)),
            "steps_per_s": float(1.0 / a.mean()),
        }


class MetricsLogger:
    """Append-only JSONL metrics log."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a")

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
