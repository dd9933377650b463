"""Pipeline profiler: runs each plan prefix under a timer and assembles
the per-operator :class:`MetricsModel`.

The reference gets per-op counters from the tf.data runtime's stats dump
(pa/gen_util.py:61-78 → stats.pb); Spark exposes no per-operator clock, so
we profile the way the reference's *benchmark* layer does — timed
consumption of each prefix (pa/gen_util.py:253-506), attributing
self-time as prefix minus slowest input prefix. O(nodes) actions; at real
scale run it on a sampled prefix (``sample_rows``), which is exactly the
reference's take(n)-sandwich benchmarking trick
(pa/pipeline_optimizer.py:151-192).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from plumberapp_spark.plans.nodes import PARALLELIZABLE_OPS, Pipeline, PlanNode
from plumberapp_spark.metrics.model import MetricsModel, NodeStats

# The per-node throughput-ceiling sweep (benchmark_all_nodes analog) lives
# in metrics/node_bench.py; re-exported here because it is profiling
# surface and earlier rounds imported it from this module.
from plumberapp_spark.metrics.node_bench import (  # noqa: F401
    IGNORE_OPS,
    benchmark_all_nodes,
    benchmark_node,
    ceiling_table,
    node_benchmark_pipeline,
)


def _plan_size_bytes(df) -> float:
    """Catalyst's own size estimate (optimizedPlan().stats) — the
    expected_dataset_size analog without materializing."""
    try:
        return float(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:  # noqa: BLE001 — py4j estimate is best-effort
        return 0.0


class PipelineProfiler:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def profile(self, pipeline: Pipeline, sample_rows: int | None = None) -> MetricsModel:
        nodes = pipeline.nodes()
        consumers: dict[str, str] = {}
        for child, parent in pipeline.edges():
            consumers[child] = parent

        tainted = pipeline.random_tainted()
        prefix_time: dict[str, float] = {}
        prefix_rows: dict[str, int] = {}
        stats: list[NodeStats] = []
        # every persist the prefix builders perform is collected and
        # unpersisted after the final prefix is timed — profiling must not
        # leave MEMORY_AND_DISK entries behind in the session (the same
        # hygiene node_bench.py applies per sweep cell)
        own_caches: list = []

        for topo_idx, node in enumerate(nodes):
            sub = Pipeline(node, pipeline._counter)
            df = sub.to_df(self.spark, persisted_out=own_caches)
            if sample_rows is not None:
                df = df.limit(sample_rows)
            size_bytes = _plan_size_bytes(df)
            t0 = time.perf_counter()
            n_rows = df.count()
            dt = max(time.perf_counter() - t0, 1e-6)
            prefix_time[node.name] = dt
            prefix_rows[node.name] = n_rows

            in_rows = sum(prefix_rows[i.name] for i in node.inputs)
            slowest_input = max((prefix_time[i.name] for i in node.inputs), default=0.0)
            self_time = max(dt - slowest_input, 1e-6)
            parallelism = node.parallelism or self.spark.sparkContext.defaultParallelism
            rate = n_rows / dt
            per_core = (n_rows / self_time) / parallelism if parallelism else 0.0
            stats.append(
                NodeStats(
                    name=node.name,
                    op=node.op,
                    parent_name=consumers.get(node.name, ""),
                    topo_idx=topo_idx,
                    parallelism=parallelism,
                    is_parallel=node.op in PARALLELIZABLE_OPS,
                    is_random_udf=not node.deterministic,
                    is_random_udf_downstream=node.name in tainted,
                    cached=node.cached,
                    observed_rate=rate,
                    processing_time=dt,
                    self_processing_time=self_time,
                    p_busy=0.0,  # filled below once total known
                    expected_per_core_max_rate=per_core,
                    expected_parallel_max_rate=per_core * parallelism,
                    aggregate_elements_produced=n_rows,
                    element_ratio=(n_rows / in_rows) if in_rows else 1.0,
                    expected_dataset_size=size_bytes,
                    average_bytes_per_element_produced=(size_bytes / n_rows) if n_rows else 0.0,
                    derived_cardinality=n_rows,
                    num_cores_used=0.0,
                )
            )

        for cached_df in own_caches:
            try:
                cached_df.unpersist()
            except Exception:  # noqa: BLE001 — hygiene only
                pass

        total_self = sum(s.self_processing_time for s in stats) or 1.0
        sink = stats[-1]
        for s in stats:
            s.p_busy = s.self_processing_time / total_self
            s.num_cores_used = s.p_busy * s.parallelism
        return MetricsModel(
            self.spark,
            stats,
            pipeline_rate=sink.observed_rate,
            duration_s=sink.processing_time,
        )
