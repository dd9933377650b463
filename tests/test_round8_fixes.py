"""Round-8 fixes (ADVICE r7): PipelineProfiler restored beside the node
sweep, sidecar-recorded mtime for IVF index staleness, roofline chart
edge cases, and the node sweep unpersisting only its own caches."""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def test_profiler_and_node_bench_coexist(spark):
    """VERDICT r7 item 1: metrics/profiler.py must export BOTH the §1.4
    metrics-model builder (PipelineProfiler) and the r7 ceiling sweep —
    the reference keeps benchmark_util.py ALONGSIDE its metrics model
    (pa/graph_rewrites.py:333-441 vs benchmark_util.py:41-60)."""
    from plumberapp_spark.metrics.profiler import (
        PipelineProfiler,
        benchmark_all_nodes,
        ceiling_table,
        node_benchmark_pipeline,
    )
    from plumberapp_spark.metrics.node_bench import (
        benchmark_all_nodes as nb_sweep,
    )

    assert benchmark_all_nodes is nb_sweep
    assert callable(ceiling_table) and callable(node_benchmark_pipeline)
    # and the optimizer surface is importable again
    from plumberapp_spark.optimizer.advisor import Optimizer  # noqa: F401
    from plumberapp_spark.optimizer.loop import run_rewriter_loop  # noqa: F401

    assert callable(PipelineProfiler(spark).profile)


def test_ivf_index_rebuilds_on_backdated_rewrite(spark, tmp_path):
    """ADVICE r7 item 2: staleness must compare the source mtime RECORDED
    AT BUILD TIME against the current one, not marker-mtime < source-mtime
    — a rewrite landing in the same (or an earlier) mtime granule as the
    marker must still trigger a rebuild."""
    from plumberapp_spark.llm.similarity import ensure_ivf_index
    from plumberapp_spark.session import clear_table_cache

    sf_dir = str(tmp_path / "sfY")
    os.makedirs(sf_dir)
    src = f"{SF_DIR}/embeddings.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, f"{sf_dir}/embeddings.parquet")
    else:
        shutil.copy(src, f"{sf_dir}/embeddings.parquet")
    path = ensure_ivf_index(spark, sf_dir, "embeddings", n_centroids=4)
    marker = os.path.join(path, "cells", "_SUCCESS")
    sidecar = os.path.join(path, "source_mtime.txt")
    assert os.path.exists(sidecar), "build must record the observed source mtime"
    built1 = os.stat(marker).st_mtime
    # rewrite whose mtime is OLDER than the marker: the old `<` check
    # would serve the stale index; recorded-vs-current catches it
    past = built1 - 120
    tbl = f"{sf_dir}/embeddings.parquet"
    targets = [e.path for e in os.scandir(tbl)] if os.path.isdir(tbl) else [tbl]
    for p in targets:
        os.utime(p, (past, past))
    clear_table_cache()
    ensure_ivf_index(spark, sf_dir, "embeddings", n_centroids=4)
    assert os.stat(marker).st_mtime > built1, "backdated rewrite served stale index"
    # unchanged source after the rebuild: no further rebuild
    built2 = os.stat(marker).st_mtime
    ensure_ivf_index(spark, sf_dir, "embeddings", n_centroids=4)
    assert os.stat(marker).st_mtime == built2


def test_roofline_chart_edge_cases(tmp_path):
    """ADVICE r7 items 3: a legitimate 0.0 disk bound must render (and
    match the CSV), and latency_r=0 must not divide by zero."""
    from plumberapp_spark.metrics.plot_stats import roofline_chart, write_roofline

    svg = roofline_chart(4.0, 0.5, 12.0, 8.0, x_disk_bound=0.0)
    assert "Disk Bound (0.0)" in svg, "0.0 bound silently dropped from SVG"
    svg_path, csv_path = write_roofline(
        str(tmp_path / "roof0"), 4.0, 0.5, 12.0, 8.0, x_disk_bound=0.0
    )
    with open(csv_path) as f:
        csv_text = f.read()
    with open(svg_path) as f:
        svg_text = f.read()
    assert "X_disk,0.0" in csv_text and "Disk Bound (0.0)" in svg_text

    svg = roofline_chart(4.0, 0.0, 12.0, 8.0)  # latency_r == 0: no raise
    assert svg.startswith("<svg")


def test_node_sweep_keeps_unrelated_caches(spark):
    """ADVICE r7 item 4: benchmark_all_nodes must unpersist only its own
    take+cache prefixes — an unrelated persisted frame (e.g. an ANN index
    cell cache held by the same session) must stay cached."""
    from plumberapp_spark.metrics.node_bench import benchmark_all_nodes
    from plumberapp_spark.pipelines import resnet_pipeline

    unrelated = spark.range(100).persist()
    unrelated.count()
    assert unrelated.storageLevel.useMemory

    p = resnet_pipeline(spark, n=200, batch=32)
    node = next(n for n in p.nodes() if n.op == "map")
    rows = benchmark_all_nodes(
        spark, p, parallelism_grid=[2], take_amount=50,
        time_limit_s=0.2, include=[node.name],
    )
    assert rows, "sweep produced no rows"
    assert unrelated.storageLevel.useMemory, (
        "sweep evicted an unrelated session cache (clearCache regression)"
    )
    unrelated.unpersist()


def test_calibrated_ceilings_change_lp_recommendation(spark):
    """VERDICT r7 item 8 (calibrate-then-solve): measured per-node
    ceilings fed into the Q2 LP must change its allocation — the
    reference's benchmark_all_nodes → thetas flow. A node whose measured
    per-core rate is 100x SLOWER than the profiler's estimate must
    receive a larger core share (it becomes the bottleneck the
    water-filling equalizes around)."""
    import pytest

    from plumberapp_spark.metrics.node_bench import per_core_rates
    from plumberapp_spark.metrics.profiler import PipelineProfiler
    from plumberapp_spark.optimizer.advisor import Optimizer
    from plumberapp_spark.pipelines import resnet_pipeline

    p = resnet_pipeline(spark, n=300, batch=32)
    model = PipelineProfiler(spark).profile(p)
    opt = Optimizer(spark)
    base = opt.advise_from_model(p, model)

    target = next(n for n in p.nodes() if n.op == "map").name
    rates = {s.name: s.expected_per_core_max_rate for s in model.stats}
    # calibrate the target far below every other node: it MUST become
    # the binding constraint the water-filling equalizes around
    slow_rate = min(r for r in rates.values() if r > 0) / 10
    slow = opt.advise_from_model(p, model, rate_overrides={target: slow_rate})

    assert slow.thetas[target] > base.thetas[target], (
        "a measured ceiling far below the estimate must buy the node more cores"
    )
    assert slow.lp.min_rate < base.lp.min_rate, (
        "the solved pipeline rate must reflect the measured bottleneck"
    )
    assert any("calibrated per-core rates" in n for n in slow.notes)
    # sweep rows for unknown nodes are a caller error, not a silent solve
    with pytest.raises(ValueError):
        opt.advise_from_model(p, model, rate_overrides={"no_such_node": 1.0})
    # the sweep-row converter: per-core = rate/parallelism, max over grid
    rows = [
        {"name": target, "parallelism": 2, "element_rate": 10.0},
        {"name": target, "parallelism": 4, "element_rate": 32.0},
        {"name": "src", "parallelism": None, "element_rate": 7.0},
    ]
    assert per_core_rates(rows) == {target: 8.0, "src": 7.0}
