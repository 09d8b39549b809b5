"""Profiling / observability: aggregated stage timers + device traces.

The reference's entire profiling system is `TicToc` wall-clock prints
(`inc/tic_toc.h:11-42`) sprinkled through the pipeline and exported as CSVs
(`slam_data/time/*.csv`). This module is the structured replacement:

- :class:`StageTimer` — labeled wall-clock aggregation with mean/median/max
  (the reference's timing-CSV statistics, computed in-process), JSON/CSV
  export for the same downstream plots (`data_analysis/data_curve.py`);
- :func:`device_trace` — a ``jax.profiler`` trace context producing
  TensorBoard/Perfetto traces of the actual device kernels, which the
  reference has no equivalent of.

Timers synchronize on request (``block=True`` calls
``jax.block_until_ready``) so stage boundaries measure real device time,
not dispatch time.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional

import jax


class StageTimer:
    """Aggregating wall-clock timer: ``with timer("stage"): ...``."""

    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def __call__(self, label: str, block_on=None):
        """Time a stage; pass ``block_on=<pytree>`` to synchronize the device
        before stopping the clock (measures execution, not dispatch)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.samples[label].append(time.perf_counter() - t0)

    def add(self, label: str, seconds: float):
        self.samples[label].append(seconds)

    def stats(self) -> dict:
        out = {}
        for label, xs in self.samples.items():
            xs_sorted = sorted(xs)
            n = len(xs)
            out[label] = {
                "n": n,
                "mean_ms": 1e3 * sum(xs) / n,
                "median_ms": 1e3 * xs_sorted[n // 2],
                "max_ms": 1e3 * xs_sorted[-1],
                "total_s": sum(xs),
            }
        return out

    def report(self) -> str:
        rows = ["stage                          n    mean     median   max"]
        for label, s in sorted(self.stats().items()):
            rows.append(
                f"{label:<28} {s['n']:>4}  {s['mean_ms']:>7.2f}ms"
                f" {s['median_ms']:>7.2f}ms {s['max_ms']:>7.2f}ms"
            )
        return "\n".join(rows)

    def save_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.stats(), f, indent=2)

    def save_csv(self, path: str, label: str):
        """Per-sample CSV of one stage — the reference's timing-CSV format
        (`slam_data/time/times_scan_map.csv`)."""
        with open(path, "w") as f:
            f.write(f"{label}\n")
            for x in self.samples[label]:
                f.write(f"{x * 1e3:.3f}\n")


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """``jax.profiler`` trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
