"""Observability: structured per-kernel metrics, traces, and CSV profiles.

The reference's instrumentation is ad-hoc (rdtsc tick counters behind
``PERF_DEBUG``, ``PairWiseSW.h:135-146``; gettimeofday blocks behind
``#ifdef profile``, ``IntelDeflater.cc:213-226``; unasserted elapsed-ms
prints in tests).  Here it is a first-class subsystem:

* :class:`KernelMetrics` — process-wide counters (calls, cells, wall time)
  per kernel, queryable and printable as a table;
* :func:`trace` — context manager around ``jax.profiler`` so any region can
  be captured to a TensorBoard trace directory;
* :func:`profile_csv` — the DeflaterProfile.java:27-98 equivalent: per-level
  compression time/size CSV for a corpus.

Counters are updated by the public APIs when ``GKL_TPU_METRICS=1`` (off by
default: a counter update per call is noise for μs-scale kernels).
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import threading
import time


@dataclasses.dataclass
class _Counter:
    calls: int = 0
    items: int = 0  # pairs / blocks
    cells: int = 0  # DP cells (0 for codecs)
    bytes_in: int = 0
    seconds: float = 0.0


class KernelMetrics:
    """Thread-safe global metric registry, keyed by kernel name."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, _Counter] = {}

    def record(self, kernel: str, *, items: int = 0, cells: int = 0,
               bytes_in: int = 0, seconds: float = 0.0) -> None:
        with self._lock:
            c = self._counters.setdefault(kernel, _Counter())
            c.calls += 1
            c.items += items
            c.cells += cells
            c.bytes_in += bytes_in
            c.seconds += seconds

    @contextlib.contextmanager
    def timed(self, kernel: str, *, items: int = 0, cells: int = 0, bytes_in: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(kernel, items=items, cells=cells, bytes_in=bytes_in,
                        seconds=time.perf_counter() - t0)

    def snapshot(self) -> dict[str, dict]:
        with self._lock:
            return {
                k: {
                    "calls": c.calls,
                    "items": c.items,
                    "cells": c.cells,
                    "bytes_in": c.bytes_in,
                    "seconds": c.seconds,
                    "cells_per_sec": c.cells / c.seconds if c.seconds else 0.0,
                    "bytes_per_sec": c.bytes_in / c.seconds if c.seconds else 0.0,
                }
                for k, c in self._counters.items()
            }

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()

    def report(self) -> str:
        rows = [f"{'kernel':<20} {'calls':>8} {'items':>10} {'Gcells':>10} {'MB':>10} {'sec':>9} {'Gcells/s':>9}"]
        for k, v in sorted(self.snapshot().items()):
            rows.append(
                f"{k:<20} {v['calls']:>8} {v['items']:>10} {v['cells']/1e9:>10.3f} "
                f"{v['bytes_in']/1e6:>10.2f} {v['seconds']:>9.3f} {v['cells_per_sec']/1e9:>9.2f}"
            )
        return "\n".join(rows)


METRICS = KernelMetrics()


def metrics_enabled() -> bool:
    return os.environ.get("GKL_TPU_METRICS") == "1"


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace for the enclosed region.

    View with TensorBoard's profile plugin; this is the TPU-native
    replacement for the reference's rdtsc/IACA markers.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_csv(data: bytes, levels=range(0, 10), nowrap: bool = True) -> str:
    """Per-level DEFLATE time/size profile (DeflaterProfile.java:27-98).

    Returns CSV text: level, ms, compressed size, ratio.
    """
    from . import compression

    lines = ["level,ms,size,ratio"]
    for level in levels:
        t0 = time.perf_counter()
        out = compression.raw_deflate(data, level, nowrap)
        ms = (time.perf_counter() - t0) * 1e3
        lines.append(f"{level},{ms:.2f},{len(out)},{len(out)/max(1,len(data)):.4f}")
    return "\n".join(lines)
