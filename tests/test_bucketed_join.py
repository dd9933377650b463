"""Bucketed co-located join: both Exchanges disappear, results identical.

The scale claim in sources/bucketing.py is enforced here at the physical
plan level — a regression that re-introduces a shuffle on either side of
the bucketed lineitem⋈orders join fails this test, not a cluster run.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark.sources.bucketing import bucketed, write_bucketed  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir points at /tmp (static conf, set in session.py)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_bucketed(li.withColumnRenamed("l_orderkey", "okey"), "li_b", "okey", 8)
    write_bucketed(od.withColumnRenamed("o_orderkey", "okey"), "od_b", "okey", 8)
    yield "li_b", "od_b"
    for t in ("li_b", "od_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _joined(spark, bucketed_tables):
    li, od = bucketed_tables
    return (
        bucketed(spark, li)
        .join(bucketed(spark, od), "okey")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
    )


def test_bucketed_join_elides_both_exchanges(spark, bucketed_tables):
    # Disable broadcast so the join strategy under test is SMJ; AQE off so
    # the pre-execution plan is the final one we inspect.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _joined(spark, bucketed_tables)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # The only allowed Exchange is the one AFTER the join for the groupBy;
    # below the SMJ both children must read bucketed scans directly.
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning(okey" not in plan, plan
    assert "SelectedBucketsCount" in plan, plan


def test_bucketed_or_parquet_routes_q41_and_matches(spark):
    """The catalog router (r4): q41/q35/q39 fall back to plain parquet
    when no bucketed copy exists, read the bucketed scan when the
    session has one (with the pinned merge join on the fact keys — the
    round-6 contract), and produce identical rows either way. One test,
    one ensure_bucketed_tables write+drop cycle: the bucketed copies
    cost ~25 s to build per cycle in this sandbox, so the plain/routed
    probes for all three queries share a single cycle."""
    import plumberapp_spark.all_queries  # noqa: F401 — registry side effects
    from plumberapp_spark.registry import REGISTRY
    from plumberapp_spark.sources.bucketing import (
        bucketed_name,
        default_num_buckets,
        ensure_bucketed_tables,
    )

    q41 = REGISTRY["q41_returned_items"].fn
    plain_df = q41(spark, SF_DIR)
    plain_plan = plain_df._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" not in plain_plan
    plain = [tuple(r) for r in plain_df.collect()]
    # plain-route rows for the pinned-merge-join queries, collected
    # BEFORE the bucketed copies exist (the router would otherwise
    # route them bucketed)
    merge_plain = {
        q: [tuple(r) for r in REGISTRY[q].fn(spark, SF_DIR).collect()]
        for q in ("q35_revenue_by_nation", "q39_shipping_priority")
    }

    names = ensure_bucketed_tables(spark, SF_DIR)
    try:
        assert names["lineitem"] == bucketed_name(SF_DIR, "lineitem", default_num_buckets(spark))
        routed_df = q41(spark, SF_DIR)
        routed_plan = routed_df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in routed_plan
        # the fact⋈fact join must not re-shuffle either bucketed side
        assert "Exchange hashpartitioning(l_orderkey" not in routed_plan
        assert "Exchange hashpartitioning(o_orderkey" not in routed_plan
        assert [tuple(r) for r in routed_df.collect()] == plain
        # round-6 pinned merge join: SortMergeJoin on the fact keys with
        # no hashpartitioning exchange on either side, rows identical to
        # the plain-parquet route
        for q, want in merge_plain.items():
            df = REGISTRY[q].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, q
            assert "Exchange hashpartitioning(l_orderkey" not in plan, q
            assert "Exchange hashpartitioning(o_orderkey" not in plan, q
            got = [tuple(r) for r in df.collect()]
            assert sorted(map(str, got)) == sorted(map(str, want)), q
    finally:
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed("l_orderkey", "okey")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumnRenamed("o_orderkey", "okey")
    plain = (
        li.join(od, "okey")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
    )
    got = {tuple(r) for r in _joined(spark, bucketed_tables).collect()}
    want = {tuple(r) for r in plain.collect()}
    assert got == want


# (the round-6 pinned-merge-join assertions for q35/q39 now live inside
# test_bucketed_or_parquet_routes_q41_and_matches above — one bucketed
# write+drop cycle instead of two)
