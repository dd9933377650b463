"""Persisted lexical index + persisted unigram LM (round 8): serving
paths must be output-identical to the direct operators, rebuild on
source rewrite, and actually prune the postings scan."""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tfidf_indexed_matches_direct(spark, tmp_path):
    """tfidf_topk_indexed over a freshly built index == tfidf_topk on the
    same corpus — same weights, rounding, tie-breaks, every row."""
    from plumberapp_spark.llm.dedup import tfidf_topk
    from plumberapp_spark.llm.lexical import build_lexical_index, tfidf_topk_indexed

    docs = _docs(spark)
    queries = docs.filter(F.col("doc_id") < 5)
    path = str(tmp_path / "lex")
    build_lexical_index(docs, path)
    direct = tfidf_topk(docs, queries, k=10)
    indexed = tfidf_topk_indexed(spark, path, queries, k=10)
    cols = ["query_id", "neighbor_id", "cos_sim", "rank"]
    assert _rows(indexed, cols) == _rows(direct, cols)


def test_bm25_indexed_matches_direct(spark, tmp_path):
    from plumberapp_spark.llm.dedup import bm25_topk
    from plumberapp_spark.llm.lexical import bm25_topk_indexed, build_lexical_index

    docs = _docs(spark)
    queries = docs.filter(F.col("doc_id") < 5)
    path = str(tmp_path / "lex")
    build_lexical_index(docs, path)
    direct = bm25_topk(docs, queries, k=10)
    indexed = bm25_topk_indexed(spark, path, queries, k=10)
    cols = ["query_id", "neighbor_id", "bm25", "rank"]
    assert _rows(indexed, cols) == _rows(direct, cols)


def test_postings_scan_prunes_to_query_buckets(spark, tmp_path):
    """The serving contract: a query run's postings read must carry a
    partition filter on the bucket column — |query buckets| / 64 of the
    postings touches IO, by partition pruning, not a post-scan filter."""
    from plumberapp_spark.llm.lexical import (
        DEFAULT_BUCKETS,
        _query_postings,
        build_lexical_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "lex")
    build_lexical_index(docs, path)
    # a one-term query: its postings read must prune to exactly 1 bucket
    one_term = spark.createDataFrame([("the",)], "tk string")
    pruned = _query_postings(spark, path, one_term)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the physical scan reports the pruned partition count
    n_parts = [
        d for d in os.listdir(f"{path}/postings") if d.startswith("_b=")
    ]
    assert len(n_parts) > 1, "fixture produced a single bucket; test is vacuous"
    expected_bucket = pruned.select("_b").distinct().collect()
    assert len(expected_bucket) == 1
    assert 0 <= expected_bucket[0]["_b"] < DEFAULT_BUCKETS


def test_lexical_index_rebuilds_on_rewrite(spark, tmp_path):
    """ensure_lexical_index follows the sidecar staleness contract: any
    source mtime change (even backdated) triggers a rebuild; an unchanged
    source is a no-op."""
    from plumberapp_spark.llm.lexical import ensure_lexical_index
    from plumberapp_spark.session import clear_table_cache

    sf_dir = str(tmp_path / "sfL")
    os.makedirs(sf_dir)
    src = f"{SF_DIR}/documents.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, f"{sf_dir}/documents.parquet")
    else:
        shutil.copy(src, f"{sf_dir}/documents.parquet")
    path = ensure_lexical_index(spark, sf_dir, "documents")
    marker = os.path.join(path, "norms", "_SUCCESS")
    built1 = os.stat(marker).st_mtime
    ensure_lexical_index(spark, sf_dir, "documents")
    assert os.stat(marker).st_mtime == built1, "unchanged source rebuilt"
    tbl = f"{sf_dir}/documents.parquet"
    targets = [e.path for e in os.scandir(tbl)] if os.path.isdir(tbl) else [tbl]
    past = built1 - 120
    for p in targets:
        os.utime(p, (past, past))
    clear_table_cache()
    ensure_lexical_index(spark, sf_dir, "documents")
    assert os.stat(marker).st_mtime > built1, "rewrite served a stale index"


def test_unigram_lm_indexed_matches_direct(spark, tmp_path):
    """Persisted-LM scoring == direct unigram_logprob_score, and the
    bucketed terciles == direct perplexity_buckets, bit for bit."""
    from plumberapp_spark.llm.textqa import (
        build_unigram_lm,
        perplexity_buckets,
        perplexity_buckets_indexed,
        unigram_logprob_score,
        unigram_logprob_score_indexed,
    )

    docs = _docs(spark)
    path = str(tmp_path / "lm")
    build_unigram_lm(docs, path)
    cols = ["doc_id", "n_tokens", "mean_logprob"]
    assert _rows(unigram_logprob_score_indexed(spark, path, docs), cols) == _rows(
        unigram_logprob_score(docs), cols
    )
    bcols = ["doc_id", "n_tokens", "mean_logprob", "ppl_rank", "bucket"]
    assert _rows(perplexity_buckets_indexed(spark, path, docs), bcols) == _rows(
        perplexity_buckets(docs), bcols
    )


def test_lexical_index_rebuilds_on_format_bump(spark, tmp_path, monkeypatch):
    """A layout change (INDEX_FORMAT bump) must force a rebuild — an
    old-layout index served into the new reader is an AnalysisException
    at serve time (hit live when the denormalized-norm column landed)."""
    import plumberapp_spark.llm.lexical as lex

    sf_dir = str(tmp_path / "sfF")
    os.makedirs(sf_dir)
    src = f"{SF_DIR}/documents.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, f"{sf_dir}/documents.parquet")
    else:
        shutil.copy(src, f"{sf_dir}/documents.parquet")
    path = lex.ensure_lexical_index(spark, sf_dir, "documents")
    marker = os.path.join(path, "postings", "_SUCCESS")
    built1 = os.stat(marker).st_mtime
    monkeypatch.setattr(lex, "INDEX_FORMAT", lex.INDEX_FORMAT + 1)
    lex.ensure_lexical_index(spark, sf_dir, "documents")
    assert os.stat(marker).st_mtime > built1, "format bump did not rebuild"


def test_crc32_bucket_parity_driver_vs_plan(spark):
    """Every driver-side pruning-bucket computation (lexical
    _query_postings, segmented serves, positional phrase_matches) rests
    on zlib.crc32(tk.encode()) % n == Spark crc32(tk) % n. Pin the
    parity directly over unicode/edge-case tokens (ADVICE r11): a
    divergence here silently drops postings rows from every pruned
    serve."""
    import zlib

    from plumberapp_spark.llm.lexical import _bucket
    from plumberapp_spark.session import local_relation

    toks = [
        "", "a", "the", "w00042", "Tok", "tok ", " tok", "añejo",
        "日本語", "emoji🙂", "tab\tsep", "mixedCASE", "ßharp", "0",
        "very-long-" + "x" * 200,
    ]
    n = 64
    df = local_relation(spark, [(t,) for t in toks], "tk string")
    got = {
        r["tk"]: r["b"]
        for r in df.select("tk", _bucket("tk", n).alias("b")).collect()
    }
    for t in toks:
        assert got[t] == zlib.crc32(t.encode("utf-8")) % n, t
