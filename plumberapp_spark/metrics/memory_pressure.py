"""Memory-pressure harness for honest cold-ish benchmarking — the
engine's analog of the reference's bloating memory manager
(pa/memory_management.py:14-97 ``BloatingMemoryManager`` /
``AsyncBloatingMemoryManager``): hold ballast so the OS has little room
to page-cache input files, making cache-advisor and disk-bound
benchmarks reflect what a busy production host would see.

Differences from the reference, on purpose:

* measurements come from /proc/meminfo (psutil is not in this
  container — the same substitution metrics/monitor.py makes for its
  statistics-collection analog),
* ballast is ``bytearray`` chunks (guaranteed-resident writable pages;
  the reference's ``' ' * n`` ASCII strings can be interned/shared),
* a hard safety floor — the manager refuses to push system-available
  memory below ``min_free_fraction`` no matter what target it was given
  (the reference will happily allocate to 99%),
* the background refresher is stoppable and releases its ballast
  (the reference's daemon thread runs forever and never frees on exit).

Driver-side by design: benchmarks run on one host; at cluster scale
memory pressure is an executor property Spark already manages
(``spark.memory.fraction``), so this stays a measurement tool.
"""

from __future__ import annotations

import threading
import time


def _meminfo() -> tuple[int, int]:
    """(total_bytes, available_bytes) from /proc/meminfo."""
    total = avail = 0
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemTotal:"):
                total = int(line.split()[1]) * 1024
            elif line.startswith("MemAvailable:"):
                avail = int(line.split()[1]) * 1024
            if total and avail:
                break
    return total, avail


class MemoryPressure:
    """Keep ~``target_used_fraction`` of system memory in use by holding
    ballast equal to the gap between current system usage and the
    target. ``refresh()`` re-measures and grows/shrinks the ballast;
    use as a context manager to guarantee release."""

    CHUNK = 1 << 20  # 1 MiB allocations, matching the recommended grain

    def __init__(self, target_used_fraction: float, min_free_fraction: float = 0.05):
        if not 0.0 <= target_used_fraction <= 0.95:
            raise ValueError("target_used_fraction must be in [0, 0.95]")
        self.target = target_used_fraction
        self.min_free = min_free_fraction
        self._chunks: list[bytearray] = []
        self.total = _meminfo()[0]

    # -- measurement -------------------------------------------------------

    def available_fraction(self) -> float:
        total, avail = _meminfo()
        return avail / max(total, 1)

    def ballast_bytes(self) -> int:
        return sum(len(c) for c in self._chunks)

    # -- control -----------------------------------------------------------

    def refresh(self) -> int:
        """Grow or shrink ballast toward the target; returns the signed
        byte delta applied this call."""
        used = 1.0 - self.available_fraction()
        if used < self.target:
            want = int(self.total * (self.target - used))
            # never allocate past the safety floor
            headroom = int(self.total * max(self.available_fraction() - self.min_free, 0.0))
            want = min(want, headroom)
            grown = 0
            while grown < want:
                size = min(self.CHUNK, want - grown)
                # bytearray(n) memsets its buffer, so the pages are
                # actually written and resident (not lazily mapped)
                self._chunks.append(bytearray(size))
                grown += size
            return grown
        shrunk = 0
        excess = int(self.total * (used - self.target))
        while self._chunks and shrunk < excess:
            shrunk += len(self._chunks.pop())
        return -shrunk

    def release(self) -> None:
        self._chunks.clear()

    def __enter__(self) -> "MemoryPressure":
        self.refresh()
        return self

    def __exit__(self, *exc) -> None:
        self.release()


class AsyncMemoryPressure:
    """Background refresher (AsyncBloatingMemoryManager analog) with a
    working ``stop()``: re-runs :meth:`MemoryPressure.refresh` every
    ``refresh_interval_s`` until stopped, then releases all ballast."""

    def __init__(
        self,
        target_used_fraction: float,
        refresh_interval_s: float = 1.0,
        delay_s: float = 0.0,
    ):
        self.manager = MemoryPressure(target_used_fraction)
        self.refresh_interval_s = refresh_interval_s
        self.delay_s = delay_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        if self.delay_s:
            if self._stop.wait(self.delay_s):
                return
        while not self._stop.is_set():
            self.manager.refresh()
            self._stop.wait(self.refresh_interval_s)

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=10)
        self.manager.release()

    def __enter__(self) -> "AsyncMemoryPressure":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
