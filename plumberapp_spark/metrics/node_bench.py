"""Per-node throughput-ceiling sweep — the engine's port of the
reference's brute-force node benchmark
(`plumber_analysis/benchmark_util.py:11-60`
``create_benchmark_node_dataset`` / ``benchmark_all_nodes_dataset``):
for each plan node in topological order, insert a take+cache sandwich
after the node's input (so upstream cost is paid once, outside the
timed window), truncate the plan AT the node (the node becomes the
sink), and benchmark it over a parallelism grid. The output is the
per-op ceiling table the LP (Q2) and the roofline chart consume.

Spark-first differences, on purpose:

* the "surgery" is a Pipeline-IR rewrite (clone + re-root), not
  protobuf GraphDef editing — ``plans/rewrites.py`` already owns
  truncation and parallelism overrides;
* "cache" is a real ``persist(MEMORY_AND_DISK)`` on the bounded
  ``take(N)`` prefix, warmed explicitly before the timed window — the
  reference's cache node plays the same role
  (pa/graphdef_util.py:618-643);
* parallelism is a partition-count override (``repartition`` at the
  node), the Spark meaning of a tf.data parallelism knob.

Driver-side by contract: every measured frame is bounded by
``take_amount`` rows, so nothing here scales with the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import SparkSession

from plumberapp_spark.metrics.bench import BenchSummary, bench_dataframe, consume
from plumberapp_spark.plans.nodes import PARALLELIZABLE_OPS, Pipeline, PlanNode
from plumberapp_spark.plans.rewrites import _clone

# ops with no work of their own to measure — the reference's
# IGNORE_LIST_OPS (benchmark_util.py:57-62)
IGNORE_OPS = {"cache", "prefetch", "literal"}


def node_benchmark_pipeline(
    p: Pipeline, name: str, take_amount: int = 500
) -> Pipeline:
    """``create_benchmark_node_dataset`` analog (benchmark_util.py:11-23):
    a plan that measures ONE node's throughput ceiling — its input is
    capped at ``take_amount`` rows and cached (upstream cost paid once,
    before the timed window), and the node itself is the sink.

    Source nodes (no inputs) get only the truncation plus a take cap ON
    the node, measuring the scan itself."""
    out = _clone(p)
    node = out.find(name)
    if not node.inputs:
        return Pipeline(node, out._counter).take(take_amount)
    prepared: list[PlanNode] = []
    counter = out._counter
    for inp in node.inputs:
        prefix = Pipeline(inp, counter).take(take_amount).cache()
        counter = prefix._counter
        prepared.append(prefix.root)
    node.inputs = prepared
    return Pipeline(node, counter)


def benchmark_node(
    spark: SparkSession,
    p: Pipeline,
    name: str,
    take_amount: int = 500,
    time_limit_s: float = 2.0,
) -> BenchSummary:
    """``benchmark_node_dataset`` analog (benchmark_util.py:25-39): warm
    the cached input prefix with one untimed pass, then measure the
    node's steady-state element rate."""
    bench_p = node_benchmark_pipeline(p, name, take_amount)
    df = bench_p.to_df(spark)
    consume(df)  # untimed: fills the input cache + absorbs codegen
    return bench_dataframe(df, time_limit_s=time_limit_s)


def benchmark_all_nodes(
    spark: SparkSession,
    p: Pipeline,
    parallelism_grid: Sequence[int] | None = None,
    take_amount: int = 500,
    time_limit_s: float = 2.0,
    include: Sequence[str] | None = None,
) -> list[dict]:
    """``benchmark_all_nodes_dataset`` analog (benchmark_util.py:41-60):
    sweep every measurable node in topological order; parallelizable
    nodes are additionally swept over ``parallelism_grid`` (default
    [2, 4, 8], the reference's ``2**i for i in range(1, 4)``).

    Returns one row per (node, parallelism) —
    ``{"name", "op", "parallelism", "element_rate", "num_runs",
    "duration_s"}`` — steady-state rates over the cached bounded input.
    ``include`` restricts to named nodes (the reference's
    'Parallel'-only filter generalized to a caller choice). Each cell's
    own take+cache prefix is unpersisted before the next cell so one
    node's persisted prefix never skews the next measurement — without
    evicting unrelated session caches."""
    if parallelism_grid is None:
        parallelism_grid = [2**i for i in range(1, 4)]
    rows: list[dict] = []
    for node in p.nodes():
        if node.op in IGNORE_OPS:
            continue
        if include is not None and node.name not in include:
            continue
        grid: list[int | None] = (
            list(parallelism_grid) if node.op in PARALLELIZABLE_OPS else [None]
        )
        for par in grid:
            bench_p = node_benchmark_pipeline(p, node.name, take_amount)
            if par is not None:
                bench_p.find(node.name).parallelism = int(par)
            own_caches: list = []
            df = bench_p.to_df(spark, persisted_out=own_caches)
            consume(df)  # untimed cache-fill + codegen pass
            summary = bench_dataframe(df, time_limit_s=time_limit_s)
            rows.append(
                {
                    "name": node.name,
                    "op": node.op,
                    "parallelism": par,
                    "element_rate": summary.element_rate,
                    "num_runs": summary.num_runs,
                    "duration_s": summary.duration_s,
                }
            )
            # unpersist ONLY this cell's take+cache prefix — a blanket
            # clearCache() would evict unrelated caller caches (e.g. a
            # persisted ANN index held by the same session)
            for cached_df in own_caches:
                try:
                    cached_df.unpersist()
                except Exception:  # noqa: BLE001 — hygiene only
                    pass
    return rows


def ceiling_table(rows: list[dict]) -> dict[str, float]:
    """Per-node throughput ceiling: max steady-state rate over the
    sweep — the number the LP uses as the node's max service rate and
    the roofline draws as its horizontal (``nodes_rates`` takes
    ``[(rate, name), ...]`` — ``sorted((r, n) for n, r in
    ceiling_table(rows).items())``)."""
    out: dict[str, float] = {}
    for r in rows:
        out[r["name"]] = max(out.get(r["name"], 0.0), r["element_rate"])
    return out


def per_core_rates(rows: list[dict]) -> dict[str, float]:
    """Sweep rows → per-op PER-CORE max service rate — the unit the Q2
    LP consumes (``expected_per_core_max_rate``): for each (node,
    parallelism) cell, rate/parallelism is that cell's per-core
    throughput; the per-op maximum over the grid is the calibrated
    ceiling. Cells with no parallelism override (non-parallelizable
    ops) count as 1 core — the node IS its single lane.

    This is the reference's calibrate-then-solve hand-off: measured
    ``benchmark_all_nodes`` rates feed the solver's thetas
    (pa/pipeline_optimizer_wrapper.py:365-459 calibration →
    pa/convex_solver.py rates)."""
    out: dict[str, float] = {}
    for r in rows:
        par = r["parallelism"] or 1
        per_core = r["element_rate"] / max(int(par), 1)
        out[r["name"]] = max(out.get(r["name"], 0.0), per_core)
    return out
