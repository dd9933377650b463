"""Benchmark sink (pa/gen_util.py:253-506 ``benchmark_dataset`` analog).

Consumes a DataFrame with noop writes in a timed loop, with optional
AUTOTUNE-style convergence stop (A12: relative rate error < 1% after a
minimum time, pa/gen_util.py:86-105) and a lightweight resource-monitoring
thread (pa/statistics_collection.py analog reading /proc — psutil isn't in
this container).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from plumberapp_spark.metrics.monitor import MonitoringThread

CONVERGENCE_REL_ERR = 0.01  # pa/gen_util.py:87-90
MIN_BENCH_SECONDS = 12.0  # pa/gen_util.py:140,267-268
DEFAULT_BENCHMARK_TIME = 62  # pa/pipeline_optimizer.py:26


@dataclass
class BenchSummary:
    """Q12/A11: the summary the reference's benchmark returns — element
    rate over the timed window, per-run rates, convergence flag, CPU/mem
    stats (rate computation pa/gen_util.py:470-488, summary
    :484-506)."""

    total_elements: int
    num_runs: int
    duration_s: float
    element_rate: float
    run_rates: list[float] = field(default_factory=list)
    converged: bool = False
    mean_cpu_percent: float | None = None
    max_rss_bytes: int | None = None

    def as_dict(self) -> dict:
        return self.__dict__.copy()


def consume(df: DataFrame) -> int:
    """One full consumption pass; returns element count. Uses the noop
    writer (no driver collect) so the measured cost is the pipeline, not
    result transfer — the Spark analog of iterating the dataset."""
    n = df.count()
    df.write.format("noop").mode("overwrite").save()
    return n


def bench_dataframe(
    df: DataFrame,
    time_limit_s: float = float(DEFAULT_BENCHMARK_TIME),
    use_monitoring: bool = False,
    autotune_stop: bool = False,
    min_seconds: float = MIN_BENCH_SECONDS,
) -> BenchSummary:
    monitor = MonitoringThread(interval_s=0.25) if use_monitoring else None
    if monitor:
        monitor.start()
    t_start = time.perf_counter()
    total = 0
    runs = 0
    run_rates: list[float] = []
    converged = False
    try:
        while True:
            r0 = time.perf_counter()
            n = consume(df)
            r_dt = max(time.perf_counter() - r0, 1e-9)
            total += n
            runs += 1
            run_rates.append(n / r_dt)
            elapsed = time.perf_counter() - t_start
            if autotune_stop and elapsed >= min_seconds and len(run_rates) >= 2:
                prev, cur = run_rates[-2], run_rates[-1]
                if prev > 0 and abs(cur / prev - 1) < CONVERGENCE_REL_ERR:
                    converged = True
                    break
            if elapsed >= time_limit_s:
                break
    finally:
        if monitor:
            monitor.stop()
    duration = time.perf_counter() - t_start
    samples = monitor.samples if monitor else []
    return BenchSummary(
        total_elements=total,
        num_runs=runs,
        duration_s=duration,
        element_rate=total / duration if duration > 0 else 0.0,
        run_rates=run_rates,
        converged=converged,
        mean_cpu_percent=(sum(s.cpu_percent for s in samples) / len(samples)) if samples else None,
        max_rss_bytes=max((s.rss_bytes for s in samples), default=None) if samples else None,
    )
