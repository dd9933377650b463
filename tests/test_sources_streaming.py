"""Sources/sinks (§2.1) and the Structured Streaming surface."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from plumberapp_spark.sources.readers import (
    fake_dataset,
    from_slices,
    list_files,
    read_record_files,
    read_text,
    write_record_file,
)
from plumberapp_spark.sources.sinks import plan_to_dot, write_analysis_csv, write_stats
from plumberapp_spark.streaming.stream_ops import (
    repeat_stream,
    stateful_rate_monitor,
    windowed_event_counts,
)
from plumberapp_spark.plans.nodes import Pipeline
from plumberapp_spark.metrics.profiler import PipelineProfiler
from tests.conftest import SF_DIR


def test_record_file_roundtrip(spark, tmp_path):
    records = [f"record-{i}".encode() for i in range(100)]
    path = str(tmp_path / "a.rec")
    write_record_file(path, records)
    df = read_record_files(spark, str(tmp_path / "*.rec"))
    rows = df.orderBy("record_idx").collect()
    assert len(rows) == 100
    assert bytes(rows[7]["record"]) == b"record-7"


def test_list_files(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.txt").write_text("x" * (i + 1))
    df = list_files(spark, str(tmp_path / "*.txt"), shuffle_seed=1)
    got = {os.path.basename(r["path"]): r["size"] for r in df.collect()}
    assert got == {"f0.txt": 1, "f1.txt": 2, "f2.txt": 3}


def test_text_source(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("a\nb\nc\n")
    assert read_text(spark, str(p)).count() == 3


def test_from_slices_and_fake(spark):
    df = from_slices(spark, [(1, "a"), (2, "b")], "id int, s string")
    assert df.count() == 2
    schema = T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("arr", T.ArrayType(T.FloatType()))]
    )
    fake = fake_dataset(spark, schema, 10)
    assert [(f.name, f.dataType) for f in fake.schema.fields] == [
        (f.name, f.dataType) for f in schema.fields
    ]
    assert fake.count() == 10


def test_stats_and_csv_sinks(spark, tmp_path):
    p = Pipeline.source_parquet(f"{SF_DIR}/events.parquet", ["event_id", "value"]).filter(
        F.col("value") > 0
    )
    model = PipelineProfiler(spark).profile(p, sample_rows=200)
    stats_path = str(tmp_path / "stats")
    write_stats(model, stats_path)
    back = spark.read.parquet(stats_path)
    assert back.count() == len(model.stats)
    csv_path = str(tmp_path / "stats_csv")
    write_analysis_csv(model.to_df().select("name", "op", "observed_rate"), csv_path)
    assert spark.read.option("header", True).csv(csv_path).count() == len(model.stats)


def test_dot_sink(spark):
    p = Pipeline.source_parquet(f"{SF_DIR}/events.parquet", ["event_id"]).take(5).cache()
    dot = plan_to_dot(p)
    assert dot.startswith("digraph") and "source_parquet" in dot and "fillcolor" in dot


def test_windowed_counts_batch_path(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("bigint"))
    )
    out = windowed_event_counts(ev, window="1 hour")
    rows = out.collect()
    assert len(rows) > 0 and all(r["n"] > 0 for r in rows)


def test_repeat_stream_and_stateful_monitor(spark):
    finite = spark.range(10).select(F.col("id").alias("idx"), (F.col("id") * 1.0).alias("value"))
    stream = repeat_stream(spark, finite, "idx", n_rows=10, rows_per_second=500)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("rep_stream")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.sql("SELECT count(*) c FROM rep_stream").first()["c"] >= 20:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.sql("SELECT max(_epoch) e, count(*) c FROM rep_stream").first()
    assert got["c"] >= 20 and got["e"] >= 1  # wrapped the finite table

    ev = stream.select(F.lit("a").alias("event_type"), F.col("value"))
    mon = stateful_rate_monitor(ev)
    q2 = mon.writeStream.format("memory").queryName("rate_mon").outputMode("append").start()
    try:
        import time

        deadline = time.time() + 20
        while time.time() < deadline:
            q2.processAllAvailable()
            if spark.sql("SELECT count(*) c FROM rate_mon").first()["c"] >= 1:
                break
            time.sleep(0.5)
    finally:
        q2.stop()
    rows = spark.sql("SELECT * FROM rate_mon").collect()
    assert len(rows) >= 1 and rows[0]["total"] > 0
