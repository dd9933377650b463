"""Round-7 robustness fixes (ADVICE r6): Bloom bitset sizing for
non-multiple-of-8 n_bits, bounded ann_recall_report cache lifetime, and
IVF index staleness vs a rewritten source table."""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_dedup_odd_nbits(spark, tmp_path):
    """n_bits not divisible by 8 must not IndexError in the stateful
    operator: positions hashing into the last partial byte need the
    (n_bits + 7) // 8 bitset (ADVICE r6 item 1)."""
    from plumberapp_spark.streaming.stream_ops import streaming_bloom_dedup

    rows = [(i, f"odd bits doc {i} with filler words") for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(10)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string").format("parquet").load(src)
    )
    # 1001 % 8 == 1: with the old n_bits // 8 sizing, any position in the
    # final partial byte raises IndexError inside the state function.
    out_df = streaming_bloom_dedup(stream, n_shards=2, n_bits=1001, n_hashes=3)
    q = (
        out_df.writeStream.format("memory")
        .queryName("bloom_odd_bits_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {r["doc_id"]: r["kept"] for r in spark.table("bloom_odd_bits_test").collect()}
    assert len(out) == 50
    assert not any(out[100 + i] for i in range(10)), "a re-delivery survived"


def test_recall_report_caches_bounded(spark):
    """Each ann_recall_report call releases the previous call's persisted
    frames: after N calls, at most one report's caches are live
    (ADVICE r6 item 2)."""
    from plumberapp_spark.llm import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    sim.release_recall_caches()
    rep1 = sim.ann_recall_report(emb, queries, k=3, methods=("ivf", "semdedup"))
    rep1.collect()
    first_frames = list(sim._RECALL_CACHES)
    assert len(first_frames) == 2  # exact_ids + semdedup true_drops
    # a second report with DIFFERENT params (so no plan-equality cache
    # aliasing) must release the first call's frames and register its own
    rep2 = sim.ann_recall_report(
        emb, queries, k=4, methods=("ivf", "semdedup"), semdedup_kwargs={"tau": 0.5}
    )
    rep2.collect()
    assert len(sim._RECALL_CACHES) == 2
    assert not any(df in sim._RECALL_CACHES for df in first_frames)
    for df in first_frames:
        assert not df.storageLevel.useMemory and not df.storageLevel.useDisk, (
            "previous report's frame still persisted"
        )
    sim.release_recall_caches()
    assert sim._RECALL_CACHES == []


def test_ivf_index_rebuilds_on_source_rewrite(spark, tmp_path):
    """ensure_ivf_index must rebuild when the source table is newer than
    the persisted index (in-place part rewrites included) — a regenerated
    embeddings table never serves a stale index (ADVICE r6 item 4)."""
    from plumberapp_spark.llm.similarity import ensure_ivf_index
    from plumberapp_spark.session import clear_table_cache

    sf_dir = str(tmp_path / "sfX")
    os.makedirs(sf_dir)
    src = f"{SF_DIR}/embeddings.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, f"{sf_dir}/embeddings.parquet")
    else:
        shutil.copy(src, f"{sf_dir}/embeddings.parquet")
    path = ensure_ivf_index(spark, sf_dir, "embeddings", n_centroids=4)
    marker = os.path.join(path, "cells", "_SUCCESS")
    built1 = os.stat(marker).st_mtime
    # unchanged source: second call is a no-op
    ensure_ivf_index(spark, sf_dir, "embeddings", n_centroids=4)
    assert os.stat(marker).st_mtime == built1
    # in-place rewrite: bump the source mtime past the marker
    future = time.time() + 60
    tbl = f"{sf_dir}/embeddings.parquet"
    targets = [e.path for e in os.scandir(tbl)] if os.path.isdir(tbl) else [tbl]
    for p in targets:
        os.utime(p, (future, future))
    clear_table_cache()
    ensure_ivf_index(spark, sf_dir, "embeddings", n_centroids=4)
    assert os.stat(marker).st_mtime > built1, "stale index served after rewrite"


def test_connected_components_pointer_jump_rounds(spark):
    """Pointer jumping makes convergence O(log diameter): a planted
    diameter-8 chain (9 nodes) must converge in well under 9 rounds and
    still produce the exact min-label fixpoint (VERDICT r6 item 4)."""
    from plumberapp_spark.llm.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "id_a bigint, id_b bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 10)], "doc_id bigint")
    stats: dict = {}
    rows = {
        r["doc_id"]: (r["cluster_label"], r["cluster_size"])
        for r in connected_components(edges, nodes, stats=stats).collect()
    }
    assert rows == {i: (1, 9) for i in range(1, 10)}
    # plain min-label needs 9 rounds (8 changing + 1 confirm); the jump
    # collapses two hops per round
    assert stats["rounds"] <= 6, f"pointer jump regressed: {stats['rounds']} rounds"


def test_roofline_chart_svg(tmp_path):
    """Roofline chart (pa/plotting_util.py:27-75 analog): valid SVG with
    the operational-law line, both bounds, N/N* markers, node ceilings;
    companion CSV carries every plotted value."""
    from plumberapp_spark.metrics.plot_stats import roofline_chart, write_roofline

    svg = roofline_chart(
        4.0, 0.5, 12.0, 8.0,
        nodes_rates=[(9.5, "map"), (14.0, "batch")],
        x_disk_bound=16.0,
    )
    assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")
    for needle in ("LP Compute Bound (12.0)", "Disk Bound (16.0)",
                   "N=4.00", "N*=8.00", "map", "X (minibatches/second)"):
        assert needle in svg, needle
    svg_path, csv_path = write_roofline(
        str(tmp_path / "roof"), 4.0, 0.5, 12.0, 8.0,
        nodes_rates=[(9.5, "map")], x_disk_bound=16.0,
    )
    import csv as _csv

    with open(csv_path) as f:
        rows = list(_csv.reader(f))
    assert ["bound", "X_cpu", "12.0"] in rows
    assert ["node_ceiling", "map", "9.5"] in rows
    with open(svg_path) as f:
        written = f.read()
    assert written.startswith("<svg") and "N*=8.00" in written


def test_per_node_ceiling_sweep(spark):
    """profiler.benchmark_all_nodes (benchmark_util.py:41-60 analog):
    take+cache sandwich before the node, truncation at it, parallelism
    grid for parallelizable ops, per-op ceiling table out."""
    from plumberapp_spark.metrics.profiler import (
        benchmark_all_nodes,
        ceiling_table,
        node_benchmark_pipeline,
    )
    from plumberapp_spark.pipelines import resnet_pipeline

    p = resnet_pipeline(spark, n=400, batch=32)
    # structure: the measured plan is rooted AT the node, its input is
    # take(N) -> cache
    some_node = next(n for n in p.nodes() if n.op == "map")
    bp = node_benchmark_pipeline(p, some_node.name, take_amount=50)
    assert bp.root.name == some_node.name
    assert bp.root.inputs[0].cached
    assert bp.root.inputs[0].op == "cache"
    assert bp.root.inputs[0].inputs[0].op == "take"
    assert bp.root.inputs[0].inputs[0].params == {"n": 50}
    # the original plan is untouched (clone semantics)
    assert p.find(some_node.name).inputs[0].op != "cache"

    rows = benchmark_all_nodes(
        spark,
        p,
        parallelism_grid=[2, 4],
        take_amount=50,
        time_limit_s=0.3,
        include=[some_node.name, p.root.name],
    )
    by_name: dict = {}
    for r in rows:
        assert r["element_rate"] > 0
        by_name.setdefault(r["name"], []).append(r["parallelism"])
    # the map node swept the grid; the root got one row (grid or single)
    assert sorted(by_name[some_node.name]) == [2, 4]
    ceil = ceiling_table(rows)
    assert set(ceil) == set(by_name)
    assert all(v > 0 for v in ceil.values())
