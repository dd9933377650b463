"""Plan IR invariants — ported from the reference's runtime-invariant tests
(SURVEY §5.2): element-spec immutability under rewrites, graph
compatibility gating, fingerprints, random-UDF taint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plumberapp_spark.plans.nodes import Pipeline
from plumberapp_spark.plans import rewrites
from tests.conftest import SF_DIR


def build_pipeline() -> Pipeline:
    return (
        Pipeline.source_parquet(f"{SF_DIR}/events.parquet", ["event_id", "user_id", "value"])
        .filter(F.col("value") > 10, desc="value>10")
        .with_columns({"v2": F.col("value") * 2})
        .with_row_idx(["event_id"])
        .batch(32)
    )


def test_materialize_and_schema(spark):
    p = build_pipeline()
    df = p.to_df(spark)
    assert df.count() > 0
    assert "batch" in df.columns


def test_rewrites_preserve_schema(spark):
    p = build_pipeline()
    src = p.nodes()[0].name
    p2 = rewrites.set_parallelism(p, src, 8, spark)
    assert p2.find(src).parallelism == 8
    p3 = rewrites.insert_cache_after(p2, p2.nodes()[2].name, spark)
    assert any(n.cached for n in p3.nodes())
    p4 = rewrites.remove_caches(p3, spark)
    assert not any(n.cached for n in p4.nodes())
    # original untouched (clone semantics)
    assert p.find(src).parallelism is None


def test_schema_invariant_violation_raises(spark):
    p = build_pipeline()

    # simulate an illegal rewrite: swap a node's builder to change columns
    bad = rewrites._clone(p)
    node = bad.nodes()[1]
    node.builder = lambda s, ins: ins[0].drop("user_id")  # unused downstream
    with pytest.raises(rewrites.SchemaChangedError):
        rewrites._checked(p, bad, spark)


def test_truncate_to_source(spark):
    p = build_pipeline()
    src = p.nodes()[0].name
    trunc = rewrites.truncate_to_source(p, src)
    assert [n.op for n in trunc.nodes()] == ["source_parquet"]
    assert trunc.to_df(spark).columns == ["event_id", "user_id", "value"]


def test_fingerprint_stable_and_sensitive(spark):
    a, b = build_pipeline(), build_pipeline()
    assert a.fingerprint() == b.fingerprint()
    c = build_pipeline().take(10)
    assert a.fingerprint() != c.fingerprint()
    # parallelism/cache configs do NOT change the fingerprint (op-keyed WL)
    assert rewrites.set_parallelism(a, a.nodes()[0].name, 4).fingerprint() == a.fingerprint()


def test_plan_diff_and_compat(spark):
    a = build_pipeline()
    b = build_pipeline().take(10)
    d = rewrites.plan_diff(a, b)
    assert d["removed"] == set() and len(d["added"]) == 1
    assert rewrites.is_compatible(a, build_pipeline())
    assert not rewrites.is_compatible(a, b)


def test_random_taint(spark):
    p = build_pipeline().shuffle(seed=7).take(5)
    tainted = p.random_tainted()
    names = [n.name for n in p.nodes()]
    shuffle_idx = next(i for i, n in enumerate(p.nodes()) if n.op == "shuffle")
    for i, name in enumerate(names):
        assert (name in tainted) == (i >= shuffle_idx)


def test_zip_and_concat_plan(spark):
    a = Pipeline.source_parquet(f"{SF_DIR}/customer.parquet", ["c_custkey"]).with_row_idx(["c_custkey"])
    b = Pipeline.source_parquet(f"{SF_DIR}/supplier.parquet", ["s_suppkey"]).with_row_idx(["s_suppkey"])
    z = a.zip_with(b)
    n = z.to_df(spark).count()
    assert n == 10  # truncates to the shorter (supplier)
    c = a.concatenate(b.map(lambda df: df.withColumnRenamed("s_suppkey", "c_custkey")))
    assert c.to_df(spark).count() == 160
