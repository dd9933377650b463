"""Resource monitoring thread (pa/statistics_collection.py analog).

The reference samples psutil (cpu freq/percent/temps, io, rss) on a
background thread (:57-121) into a timestamped frame; psutil is not in
this container, so we read /proc directly — same Sample-per-interval
model, same context-manager surface (reference tests:
tests/test_statistics_collection.py:6-35).
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass


@dataclass
class Sample:
    timestep: float
    cpu_percent: float
    rss_bytes: int


def _read_cpu_times() -> tuple[float, float]:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [float(x) for x in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0.0)
    return sum(vals), idle


def _read_rss() -> int:
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE")
    except (OSError, ValueError):
        return 0


class MonitoringThread:
    def __init__(self, interval_s: float = 0.5):
        self.interval_s = interval_s
        self.samples: list[Sample] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self):
        prev_total, prev_idle = _read_cpu_times()
        t0 = time.monotonic()
        while not self._stop.wait(self.interval_s):
            total, idle = _read_cpu_times()
            d_total, d_idle = total - prev_total, idle - prev_idle
            prev_total, prev_idle = total, idle
            busy = 100.0 * (1 - d_idle / d_total) if d_total > 0 else 0.0
            self.samples.append(Sample(time.monotonic() - t0, busy, _read_rss()))

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> "MonitoringThread":
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    def to_rows(self) -> list[dict]:
        return [s.__dict__ for s in self.samples]
