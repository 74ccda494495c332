"""Per-actor memory watchdog (A8 parity).

The reference checks RSS after every request and shrinks the predictor's
arenas past ``cpu_mem`` MB (``cpp/src/task.cpp:252-316``; RSS read
``cpp/src/task_linux.cpp:27-64`` from /proc).  In Ray the object store
backpressures and spills on its own, so the watchdog's remaining job is the
actor's own Python heap: the OCR actors call :func:`maybe_trim` after each
batch, which forces a gc pass when RSS exceeds the configured budget —
same trigger condition and cadence as the reference, Ray-appropriate action.
"""

from __future__ import annotations

import gc

_PAGE_SIZE = 4096


def rss_mb() -> float:
    """Resident set size of this process in MB (reference reads VmRSS the
    same way, cpp/src/task_linux.cpp:27-64)."""
    try:
        with open("/proc/self/statm", encoding="ascii") as fh:
            fields = fh.read().split()
        return int(fields[1]) * _PAGE_SIZE / (1024 * 1024)
    except (OSError, IndexError, ValueError):
        return 0.0


class MemoryWatchdog:
    """Check-per-batch watchdog with the reference's cpu_mem semantics."""

    def __init__(self, limit_mb: int):
        self.limit_mb = limit_mb
        self.trims = 0
        self.peak_mb = 0.0

    def maybe_trim(self) -> bool:
        cur = rss_mb()
        self.peak_mb = max(self.peak_mb, cur)
        if self.limit_mb and cur >= self.limit_mb:
            gc.collect()
            self.trims += 1
            return True
        return False
