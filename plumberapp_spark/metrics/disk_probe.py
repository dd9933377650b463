"""Disk-bandwidth measurement — the engine's analog of the reference's
fio-based filesystem benchmark (pa/resource_measurements.py:43-107
``benchmark_filesystem``: sequential 1 MB reads, ramp, steady-state stop;
wrapper sweep pa/pipeline_optimizer_wrapper.py:365-459).

fio is not installable in this container, so the probe is pure Python:
one sequential write pass (fsync included — the reference's direct=0
posixaio path also measures through the page cache on write) and one
sequential read pass over the same file. Before reading we issue
``posix_fadvise(POSIX_FADV_DONTNEED)`` to evict the probe file from the
page cache — best-effort cold-read (no root needed for one's own file;
the reference instead drops the whole OS cache, pa/gen_util.py:548-555,
which needs root). Results feed ``MachineInfo.files[].bandwidth_mbps``
so the Q4 disk advice (advisor.disk_parallelism_scale) runs on a
MEASURED number instead of the 100 MB/s fallback.
"""

from __future__ import annotations

import os
import tempfile
import time
from dataclasses import dataclass

from plumberapp_spark.metrics.machine_info import (
    DEFAULT_DISK_BANDWIDTH_MBPS,
    FileStoreInfo,
    MachineInfo,
)


def drop_page_caches() -> bool:
    """Drop the OS page cache (sync + ``echo 3 > /proc/sys/vm/drop_caches``)
    — the reference's cold-cache measurement protocol before each measured
    run (pa/gen_util.py:548-555). Needs root; returns False (no-op) when
    not permitted, so callers can record whether their 'cold' numbers are
    truly cold or warm-page-cache (bench.py's historical caveat)."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (OSError, PermissionError):
        return False


@dataclass(frozen=True)
class DiskProbeResult:
    path: str
    read_mbps: float
    write_mbps: float
    file_mb: int


def measure_sequential_bandwidth(
    path: str, file_mb: int = 128, block_kb: int = 1024
) -> DiskProbeResult:
    """Sequential write + read bandwidth (MB/s) of the filesystem holding
    ``path``, using a ``file_mb`` MiB probe file of ``block_kb`` KiB
    blocks (1 MiB default — the reference's fio ``bs=1M``)."""
    if not os.path.isdir(path):
        raise FileNotFoundError(f"probe directory does not exist: {path}")
    block = os.urandom(block_kb * 1024)
    n_blocks = max(1, (file_mb * 1024) // block_kb)
    total_bytes = n_blocks * len(block)

    fd, probe_file = tempfile.mkstemp(prefix="disk_probe_", dir=path)
    try:
        t0 = time.perf_counter()
        with os.fdopen(fd, "wb", buffering=0) as f:
            for _ in range(n_blocks):
                f.write(block)
            f.flush()
            os.fsync(f.fileno())
        write_s = time.perf_counter() - t0

        # Best-effort page-cache eviction so the read pass touches the
        # device, not memory. DONTNEED is advisory; on filesystems that
        # ignore it the read number is a warm-cache upper bound (same
        # caveat bench.py documents for its cold pass).
        rfd = os.open(probe_file, os.O_RDONLY)
        try:
            try:
                os.posix_fadvise(rfd, 0, 0, os.POSIX_FADV_DONTNEED)
            except (AttributeError, OSError):
                pass
            t0 = time.perf_counter()
            while True:
                chunk = os.read(rfd, len(block))
                if not chunk:
                    break
            read_s = time.perf_counter() - t0
        finally:
            os.close(rfd)
    finally:
        try:
            os.unlink(probe_file)
        except OSError:
            pass

    mb = total_bytes / 1e6
    return DiskProbeResult(
        path=path,
        read_mbps=round(mb / max(read_s, 1e-9), 1),
        write_mbps=round(mb / max(write_s, 1e-9), 1),
        file_mb=file_mb,
    )


def fill_machine_bandwidth(
    machine: MachineInfo,
    paths: list[str] | None = None,
    file_mb: int = 128,
) -> MachineInfo:
    """Measure each path's sequential read bandwidth and record it in
    ``machine.files`` (in place; also returned). Paths that cannot be
    probed keep/receive the reference's 100 MB/s fallback
    (pa/graph_rewrites.py:156-168) — advice still runs, just on the
    assumed constant, exactly as before the probe existed."""
    if paths is None:
        paths = [f.path for f in machine.files] or [tempfile.gettempdir()]
    by_path = {f.path: f for f in machine.files}
    for p in paths:
        try:
            res = measure_sequential_bandwidth(p, file_mb=file_mb)
            bw = res.read_mbps
        except Exception:
            # unprobeable KNOWN store: keep its existing (fallback) value;
            # unprobeable UNKNOWN path: not a store — don't invent one
            # with the fallback constant (it would outrank measured ones)
            continue
        if p in by_path:
            by_path[p].bandwidth_mbps = bw
        else:
            try:
                avail = os.statvfs(p).f_bavail * os.statvfs(p).f_frsize
            except OSError:
                avail = 0
            machine.files.append(FileStoreInfo(path=p, bandwidth_mbps=bw, available_space=avail))
    return machine
