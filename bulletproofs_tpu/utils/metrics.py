"""Lightweight tracing/metrics: the structured replacement for the
reference's ad-hoc `Instant::now()` + `println!` instrumentation
(SURVEY.md section 5; e.g. `gadgets/sparse_merkle_tree_4_ary.rs:151-174`).

Usage:
    with metrics.span("prove"):
        ...
    metrics.incr("msm_points", n)
    print(metrics.report())

Enabled by default (overhead is a dict update per event); `BP_TRACE=1`
additionally prints each span as it closes.  For device-side profiling use
jax.profiler traces — this module covers the host orchestration layer.
"""

import os
import time
from collections import defaultdict
from contextlib import contextmanager

_PRINT = os.environ.get("BP_TRACE", "0") == "1"


class Metrics:
    def __init__(self):
        self.counters = defaultdict(int)
        self.timings = defaultdict(float)
        self.calls = defaultdict(int)

    def incr(self, name, value=1):
        self.counters[name] += value

    @contextmanager
    def span(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.timings[name] += dt
            self.calls[name] += 1
            if _PRINT:
                print(f"[bp-trace] {name}: {dt * 1e3:.2f} ms")

    def reset(self):
        self.counters.clear()
        self.timings.clear()
        self.calls.clear()

    def report(self):
        lines = []
        for name in sorted(self.timings):
            lines.append(f"{name}: {self.timings[name] * 1e3:.2f} ms "
                         f"over {self.calls[name]} call(s)")
        for name in sorted(self.counters):
            lines.append(f"{name}: {self.counters[name]}")
        return "\n".join(lines)


metrics = Metrics()
