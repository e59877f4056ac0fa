"""Per-stage timing instrumentation (the reference's REGISTER_TIMES).

The reference compiles with REGISTER_TIMES enabled (reference include/Config.h:4)
and records per-stage means printed at shutdown (src/Tracking.cc:268
PrintTimeStats → ExecTimeMean.txt). Same taxonomy here so numbers are
comparable: per-frame stages (extraction, stereo match, pose prediction,
local-map track, new-KF decision) and mapping stages (KF insert, MP culling,
MP creation, fuse, LBA).
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class StageTimer:
    def __init__(self):
        self.samples = defaultdict(list)
        self.enabled = True

    @contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        self.samples[name].append(seconds)

    def stats(self) -> dict:
        out = {}
        for name, xs in self.samples.items():
            n = len(xs)
            mean = sum(xs) / n
            med = sorted(xs)[n // 2]
            out[name] = {"mean_ms": mean * 1e3, "n": n,
                         "median_ms": med * 1e3,
                         "total_s": sum(xs),
                         "max_ms": max(xs) * 1e3}
        return out

    def print_stats(self, file=None):
        """Reference PrintTimeStats format: stage mean/std table."""
        import sys
        f = file or sys.stdout
        print("Stage timing (mean ms over n calls):", file=f)
        for name, s in sorted(self.stats().items()):
            print(f"  {name:<28s} {s['mean_ms']:8.2f} ms  x{s['n']:<5d} "
                  f"(max {s['max_ms']:.2f})", file=f)

    def save(self, path: str):
        """ExecTimeMean.txt equivalent."""
        with open(path, "w") as f:
            self.print_stats(file=f)


GLOBAL_TIMER = StageTimer()
