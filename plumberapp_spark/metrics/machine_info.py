"""Machine + cost model (pa/machine_info.py re-expression).

MachineInfo mirrors {HOSTNAME, CORES, MEMORY, FILES:[{PATH, BANDWIDTH,
AVAILABLE_SPACE}]} (pa/machine_info.py:47-62); CostModel carries the same
published GCP N1 + Local SSD prices the reference embeds
(pa/machine_info.py:83-109) as inputs to the min-cost optimization (Q3).
"""

from __future__ import annotations

import os
import socket
from dataclasses import dataclass, field


@dataclass
class FileStoreInfo:
    path: str
    bandwidth_mbps: float  # measured or assumed sequential read MB/s
    available_space: int  # bytes


@dataclass
class MachineInfo:
    hostname: str = field(default_factory=socket.gethostname)
    num_cores: int = field(default_factory=lambda: os.cpu_count() or 1)
    memory_bytes: int = 0
    files: list[FileStoreInfo] = field(default_factory=list)

    def __post_init__(self):
        if not self.memory_bytes:
            try:
                self.memory_bytes = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            except (ValueError, OSError):
                self.memory_bytes = 8 << 30

    @classmethod
    def from_dicts(cls, rows: list[dict]) -> "MachineInfo":
        """Round-trip constructor (reference test surface:
        plumber_analysis/tests/test_machine_info.py:7-17)."""
        r = rows[0]
        return cls(
            hostname=r.get("HOSTNAME", "unknown"),
            num_cores=r.get("CORES", r.get("NUM_CORES", 1)),
            memory_bytes=r.get("MEMORY", 0),
            files=[
                FileStoreInfo(f["PATH"], f.get("BANDWIDTH", DEFAULT_DISK_BANDWIDTH_MBPS), f.get("AVAILABLE_SPACE", 0))
                for f in r.get("FILES", [])
            ],
        )

    def to_dicts(self) -> list[dict]:
        return [
            {
                "HOSTNAME": self.hostname,
                "CORES": self.num_cores,
                "MEMORY": self.memory_bytes,
                "FILES": [
                    {"PATH": f.path, "BANDWIDTH": f.bandwidth_mbps, "AVAILABLE_SPACE": f.available_space}
                    for f in self.files
                ],
            }
        ]


# Defaults mirroring the reference's assumptions:
# 100 MB/s when no disk benchmark ran (pa/graph_rewrites.py:156-168).
DEFAULT_DISK_BANDWIDTH_MBPS = 100.0

# Fraction of memory the cache advisor may plan into
# (FRACTION_CACHEABLE_MEMORY, pa/pipeline_optimizer.py:25).
FRACTION_CACHEABLE_MEMORY = 0.9


@dataclass(frozen=True)
class CostModel:
    """Published GCP prices used by the reference's cost MILP
    (pa/machine_info.py:83-109)."""

    vcpu_per_hour: float = 0.031611
    gb_ram_per_hour: float = 0.004237
    local_ssd_gb_per_month: float = 0.080
    # Read bandwidth per provisioned GB: one 375 GB Local SSD unit sustains
    # 660 MB/s, so 660/375 ≈ 1.76 MBps/GB (pa/machine_info.py:100-109,
    # GCPLocalSSD.MBps_per_GB). Round-3 verdict: the old 0.66 ("660/1000")
    # overestimated the GB needed for a target bandwidth by ~2.7x.
    ssd_read_mbps_per_gb: float = 660.0 / 375.0
    # Write bandwidth per unit: 350 MB/s per 375 GB Local SSD
    # (same GCP Local SSD performance table the reference cites).
    ssd_write_mbps_per_gb: float = 350.0 / 375.0

    def core_cost(self, cores: float) -> float:
        return cores * self.vcpu_per_hour

    def memory_cost(self, bytes_used: float) -> float:
        return bytes_used / (1 << 30) * self.gb_ram_per_hour

    def disk_cost_for_bandwidth(self, mbps: float) -> float:
        """$/hour of Local SSD capacity sized to sustain `mbps` reads.

        GB needed = mbps / MBps_per_GB; cost = GB * price_per_GB_hour.
        (The reference's price_per_MBps_hour multiplies by MBps_per_GB —
        pa/machine_info.py:107-109 — which inverts the ratio; we keep the
        dimensionally consistent division and the reference's prices.)
        """
        gb_needed = mbps / self.ssd_read_mbps_per_gb
        hours_per_month = 730.0
        return gb_needed * self.local_ssd_gb_per_month / hours_per_month
