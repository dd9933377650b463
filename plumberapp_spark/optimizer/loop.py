"""Incremental rewrite loop — entry point 2 (SURVEY §3.2).

``run_rewriter_loop`` mirrors run_rewriter_runner
(pa/graph_rewrites.py:808-988): profile → pick the bottleneck → apply ONE
local rewrite (parallelism +1 on the bottleneck,
pa/graphdef_util.py:950-955) → re-benchmark → log → repeat, guarded by the
plateau/cycle detector (Q14, pa/graph_rewrites.py:170-198).
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from plumberapp_spark.metrics.bench import bench_dataframe
from plumberapp_spark.metrics.profiler import PipelineProfiler
from plumberapp_spark.plans.nodes import PARALLELIZABLE_OPS, Pipeline
from plumberapp_spark.plans import rewrites

DEFAULT_NUM_STEPS = 55  # pa/graph_rewrites.py:64-73
DEFAULT_STEP_TIME_S = 42.0

CYCLE_WINDOW = 5  # pa/graph_rewrites.py:170-198
CYCLE_MAX_IMPROVEMENT = 0.10


@dataclass
class StepLog:
    step: int
    change: str | None
    rate: float
    ts: float = field(default_factory=time.time)


def detect_cycle(logs: list[StepLog]) -> bool:
    """Q14: same node changed in each of the last 5 steps AND max
    improvement over the window < 10%."""
    if len(logs) < CYCLE_WINDOW:
        return False
    window = logs[-CYCLE_WINDOW:]
    targets = {(log.change or "").split(".")[0] for log in window}
    if len(targets) != 1 or targets == {""}:
        return False
    rates = [log.rate for log in window]
    lo = min(rates)
    return lo > 0 and (max(rates) - lo) / lo < CYCLE_MAX_IMPROVEMENT


def pick_node(model, strategy: str, rng: random.Random) -> str:
    """Bottleneck-selection strategies
    (pa/graph_rewrites.py:560-611: None/random/random_valid...)."""
    parallel = [s for s in model.stats if s.is_parallel]
    if not parallel:
        return model.bottleneck_node().name
    if strategy == "random":
        return rng.choice([s.name for s in model.stats]).strip()
    if strategy == "random_valid":
        return rng.choice([s.name for s in parallel])
    ranked = sorted(parallel, key=lambda s: (s.expected_parallel_max_rate, s.name))
    return ranked[0].name


def run_rewriter_loop(
    spark: SparkSession,
    pipeline: Pipeline,
    num_steps: int = 8,
    step_time_s: float = 3.0,
    strategy: str = "bottleneck",
    sample_rows: int | None = 2000,
    seed: int = 42,
) -> tuple[Pipeline, list[StepLog]]:
    rng = random.Random(seed)
    logs: list[StepLog] = []
    current = pipeline
    profiler = PipelineProfiler(spark)
    for step in range(num_steps):
        model = profiler.profile(current, sample_rows=sample_rows)
        target = pick_node(model, strategy, rng)
        node = current.find(target)
        change = None
        if node.op in PARALLELIZABLE_OPS:
            new_par = (node.parallelism or 1) + 1
            current = rewrites.set_parallelism(current, target, new_par, spark)
            change = f"{target}.parallelism={new_par}"
        summary = bench_dataframe(current.to_df(spark), time_limit_s=step_time_s)
        logs.append(StepLog(step=step, change=change, rate=summary.element_rate))
        if detect_cycle(logs):
            break
    return current, logs


def logs_to_df(spark: SparkSession, logs: list[StepLog]):
    """Benchmark/step log as a DataFrame (node_stats.csv / benchmark_stats
    analog, pa/graph_rewrites.py:970-983) — parquet-writable."""
    return spark.createDataFrame(
        [(log.step, log.change, log.rate, log.ts) for log in logs],
        "step int, change string, global_minibatch_rate double, ts double",
    )
