"""Footer-statistics boundary vectors (session.stats_bounds).

stats_bounds replaces with_row_idx's approxQuantile driver job with a
parquet-footer read. The contract it must hold is weak — ANY
order-consistent boundary vector yields the identical row index — so
the tests pin (a) the fallback conditions return None, (b) the bounds
are sorted and inside the key's [min, max], and (c) the resulting
_row_idx is bit-identical to the approxQuantile path's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plumberapp_spark.operators.stream import with_row_idx
from plumberapp_spark.session import load_table, stats_bounds
from tests.conftest import SF_DIR


def test_bounds_sorted_within_range():
    b = stats_bounds(SF_DIR, "events", "event_id", n=8)
    assert b is not None and b == sorted(b)
    assert all(0.0 <= x <= 99999.0 for x in b)
    assert len(b) <= 7


def test_fallbacks_return_none():
    assert stats_bounds(SF_DIR, "events", "no_such_column", n=8) is None
    assert stats_bounds(SF_DIR, "no_such_table", "event_id", n=8) is None
    # string column: footer min/max exist but are not numeric
    assert stats_bounds(SF_DIR, "events", "event_type", n=8) is None
    # n<=1 means a single bucket — nothing to compute
    assert stats_bounds(SF_DIR, "events", "event_id", n=1) is None


def test_row_idx_identical_to_scan_path(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id")
    via_stats = with_row_idx(ev, ["event_id"], bounds=stats_bounds(SF_DIR, "events", "event_id"))
    via_scan = with_row_idx(ev, ["event_id"])  # approxQuantile job
    a = {r["event_id"]: r["_row_idx"] for r in via_stats.collect()}
    b = {r["event_id"]: r["_row_idx"] for r in via_scan.collect()}
    assert a == b


def test_row_idx_correct_on_filtered_subset(spark):
    # table-level bounds stay order-consistent for any filtered subset
    ev = load_table(spark, SF_DIR, "events")
    sub = ev.filter(F.col("event_type") == "signup").select("event_id")
    got = with_row_idx(sub, ["event_id"], bounds=stats_bounds(SF_DIR, "events", "event_id"))
    rows = sorted((r["event_id"], r["_row_idx"]) for r in got.collect())
    expected_ids = sorted(r["event_id"] for r in sub.collect())
    assert [i for _, i in rows] == list(range(len(expected_ids)))
    assert [e for e, _ in rows] == expected_ids


def test_multi_rowgroup_histogram(tmp_path):
    # 100 TB shape in miniature: many row groups with disjoint key spans;
    # the footer histogram should land boundaries near true quantiles
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path / "t.parquet"
    keys = list(range(10_000))
    pq.write_table(pa.table({"k": keys}), p, row_group_size=500)  # 20 row groups
    assert pq.ParquetFile(p).metadata.num_row_groups == 20
    from plumberapp_spark.session import stats_bounds

    b = stats_bounds(str(tmp_path), "t", "k", n=8)
    assert b is not None and len(b) == 7
    # uniform data: each boundary within one row-group span of ideal
    for i, x in enumerate(b, start=1):
        assert abs(x - i * 10_000 / 8) <= 500, (i, x)


def test_footer_sampling_caps_driver_work(tmp_path):
    # directory table with more files than max_footers: still returns
    # order-consistent bounds (subset histogram), never errors
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "t.parquet"
    d.mkdir()
    for i in range(12):
        pq.write_table(
            pa.table({"k": list(range(i * 100, (i + 1) * 100))}), d / f"part-{i:02d}.parquet"
        )
    from plumberapp_spark.session import stats_bounds

    b = stats_bounds(str(tmp_path), "t", "k", n=4, max_footers=5)
    assert b is not None and b == sorted(b)


def test_with_row_idx_warns_on_degenerate_bucketing(spark):
    """Round-6 (VERDICT r5 item 8): a string leading key silently casts
    to all-null, collapsing the bucket probe to ONE serial bucket — the
    result is still correct, but the operator must SAY it degraded."""
    import warnings as _w

    df = spark.createDataFrame([(f"k{i:04d}",) for i in range(100)], "k string")
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        out = with_row_idx(df, ["k"], num_partitions=8)
        rows = out.orderBy("k").collect()
    assert [r["_row_idx"] for r in rows] == list(range(100))  # still correct
    msgs = [str(c.message) for c in caught]
    assert any("single serial bucket" in m for m in msgs), msgs


def test_with_row_idx_no_warning_on_numeric_key(spark):
    import warnings as _w

    df = spark.createDataFrame([(i,) for i in range(1000)], "k int")
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        with_row_idx(df, ["k"], num_partitions=8).collect()
    assert not any("serial bucket" in str(c.message) for c in caught)
