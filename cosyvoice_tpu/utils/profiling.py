"""Tracing / metrics (SURVEY §5.1, §5.5 — the reference has only ad-hoc RTF
logs; here both structured stage timing and real XLA profiler traces are
first-class).

- `StageTimer`: per-utterance stage accounting (lm/flow/vocoder wall time,
  first-chunk latency, RTF) with aggregate percentiles.
- `xla_trace(dir)`: context manager around jax.profiler.trace — produces a
  TensorBoard-viewable trace of every kernel on the TPU.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import numpy as np


class StageTimer:
    def __init__(self):
        self.records: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        self.records[name].append(seconds)

    def reset(self):
        """Drop accumulated records (e.g. to exclude warmup/compile-era
        entries from a serving benchmark's percentile window)."""
        self.records.clear()

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.records.items():
            arr = np.asarray(vals)
            out[name] = {
                "n": len(arr),
                "mean_ms": float(arr.mean() * 1000),
                "p50_ms": float(np.percentile(arr, 50) * 1000),
                "p95_ms": float(np.percentile(arr, 95) * 1000),
                "total_s": float(arr.sum()),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<16}{'n':>5}{'mean ms':>10}{'p50 ms':>10}{'p95 ms':>10}{'total s':>10}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<16}{s['n']:>5}{s['mean_ms']:>10.2f}{s['p50_ms']:>10.2f}{s['p95_ms']:>10.2f}{s['total_s']:>10.2f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """XLA profiler trace (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
