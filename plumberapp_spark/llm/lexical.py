"""Persisted lexical (tf-idf / BM25) index — the q89 serving pattern
applied to sparse retrieval.

The direct operators (:func:`plumberapp_spark.llm.dedup.tfidf_topk`,
:func:`~plumberapp_spark.llm.dedup.bm25_topk`) recompute the full
weights/norms lineage — corpus tokenize, df(t) rollup, weight join — on
EVERY query run; correct, but the dominant cost at any scale and the
named bottleneck behind the family's 5× DuckDB ratio on the Zipf fixture
(VERDICT r7). This module splits the lineage at the index boundary,
exactly like the reference splits optimization-time calibration from
serving (cache insertion, ``pa/pipeline_optimizer.py:1250-1350``):

* **build once** (:func:`build_lexical_index`): materialize under the
  session warehouse

  - ``{path}/postings`` — ``(tk, doc_id, w_tfidf, w_bm25, _b)``
    partitioned by ``_b = crc32(tk) % n_buckets``, so a query run's
    parquet scan PRUNES to the buckets its terms hash into — IO touches
    ``|query-term buckets| / n_buckets`` of the postings, enforced by
    partition pruning, not a runtime filter;
  - ``{path}/norms`` — ``(doc_id, nrm)`` tf-idf L2 norms;
  - ``{path}/scalars`` — one row: corpus doc count, total tokens, mean
    doc length (the BM25 globals), and the bucket modulus the postings
    were laid out under (serve-time pruning reads it back; the
    constant is build-time-only).

  Both weight columns are computed with formulas bit-identical to the
  direct operators' (natural-log idf; Robertson/Lucene BM25 idf with
  ``k1``/``b`` saturation), so indexed search returns exactly what the
  direct operator returns and shares its DuckDB oracle.

* **serve many** (:func:`tfidf_topk_indexed`,
  :func:`bm25_topk_indexed`): tokenize only the QUERY docs (a bounded
  frame under the ANN small-side broadcast contract), prune the
  postings scan to the query terms' buckets, broadcast-join the term
  map, aggregate partial dots, and rank with the same two-stage
  partial top-k as the direct operators. Nothing corpus-sized is
  recomputed, shuffled wide, or collected.

100 TB posture: the index build is the direct operators' one-time
lineage (exchange profile unchanged); a query run reads a pruned
postings subset + the norms relation and pays one bounded aggregate —
the serving cost scales with posting-list length of the query terms,
not corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64

# bumped whenever the on-disk layout changes (sidecar-recorded; a
# mismatch forces a rebuild instead of serving an incompatible schema).
# 3: scalars carries _n_buckets — the bucket modulus is an index
# property read back at serve time, never re-derived from the constant
# (ADVICE r8: a DEFAULT_BUCKETS change must not silently mis-prune an
# index laid out under the old modulus).
INDEX_FORMAT = 3


def _bucket(col, n_buckets: int = DEFAULT_BUCKETS):
    """Partition key for a token: crc32 of the utf-8 bytes mod
    n_buckets — stable across sessions (no Spark-version hash-seed
    dependence), cheap, and pushdown-friendly (an int partition col)."""
    return F.crc32(F.col(col).cast("binary")) % n_buckets


def _index_scalars(spark, path: str):
    """The index's one-row globals relation and its recorded bucket
    modulus. Every serving path derives its pruning key from the
    RECORDED ``_n_buckets`` — the current ``DEFAULT_BUCKETS`` constant
    plays no role at serve time, so a constant change can never compute
    buckets under a new modulus against partitions laid out under the
    old one."""
    from plumberapp_spark.session import (
        local_parquet_rows,
        one_row_relation,
        read_parquet_cached,
    )

    rows = local_parquet_rows(f"{path}/scalars")
    if rows:
        # one-row relation: driver-side pyarrow fast path (zero Spark
        # jobs — the stats_bounds precedent); values identical, shipped
        # as a pure-JVM one-row relation (range+literals — never a
        # Python RDD) so downstream crossJoin(broadcast) plans off a
        # local scan per serve with no Python-worker round trip
        sc = one_row_relation(
            spark,
            ", ".join(
                f"{k} {'bigint' if isinstance(v, int) else 'double'}"
                for k, v in rows[0].items()
            ),
            *rows[0].values(),
        )
        return sc, int(rows[0]["_n_buckets"])
    sc = read_parquet_cached(spark, f"{path}/scalars")
    n_buckets = int(sc.select("_n_buckets").first()[0])
    return sc, n_buckets


def build_lexical_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Materialize the postings/norms/scalars relations (docstring above).

    One pass over the corpus (the shared Arrow tf extraction with doc
    lengths riding along), one vocab-sized df(t) rollup joined back on
    the token (the skew-safe `_doc_frequencies` form), one write per
    relation. Weight formulas mirror ``dedup.tfidf_topk`` /
    ``dedup.bm25_topk`` exactly."""
    from plumberapp_spark.llm.dedup import _doc_frequencies, term_frequencies

    spark = corpus.sparkSession
    tf = term_frequencies(corpus, text_col, id_col, with_doc_len=True)
    nd = corpus.groupBy().agg(F.count("*").alias("_nd"))
    scalars = (
        tf.groupBy()
        .agg(F.sum("_tf").alias("_tt"))
        .crossJoin(F.broadcast(nd))
        .select(
            "_nd",
            F.col("_tt").alias("_total_tokens"),
            (F.col("_tt") / F.col("_nd")).alias("_avgdl"),
            F.lit(int(n_buckets)).alias("_n_buckets"),
        )
    )
    scalars.coalesce(1).write.mode("overwrite").parquet(f"{path}/scalars")
    sc = spark.read.parquet(f"{path}/scalars")

    wts = (
        tf.join(_doc_frequencies(tf), "tk")
        .crossJoin(F.broadcast(sc))
        .select(
            "tk",
            F.col(id_col).alias("doc_id"),
            # tf-idf: tf · ln(N / df)  (dedup._tfidf_weights verbatim)
            (F.col("_tf") * F.log(F.col("_nd") / F.col("_df"))).alias("w_tfidf"),
            # BM25: idf · saturated tf with length norm (dedup.bm25_topk verbatim)
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_nd") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1))
                / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl")))
            ).alias("w_bm25"),
        )
        .withColumn("_b", _bucket("tk", n_buckets).cast("int"))
    )
    wts.write.partitionBy("_b").mode("overwrite").parquet(f"{path}/postings0")

    # denormalize the doc's tf-idf L2 norm INTO every postings row: one
    # extra doc-keyed exchange at BUILD time buys the serving path a
    # join-free cosine — dots aggregate first(nrm) instead of joining a
    # corpus-sized norms relation per query run
    postings0 = spark.read.parquet(f"{path}/postings0")
    norms = postings0.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w_tfidf") * F.col("w_tfidf"))).alias("nrm")
    )
    norms.write.mode("overwrite").parquet(f"{path}/norms")
    (
        postings0.join(spark.read.parquet(f"{path}/norms"), "doc_id")
        .select("tk", "doc_id", "w_tfidf", "w_bm25", "nrm", "_b")
        # compact to one file per bucket: a pruned serving read opens
        # |query buckets| files, not |buckets| x |shuffle partitions|
        .repartition("_b")
        .write.partitionBy("_b")
        .mode("overwrite")
        .parquet(f"{path}/postings")
    )
    # drop the norm-less intermediate
    import shutil as _shutil

    _shutil.rmtree(f"{path}/postings0", ignore_errors=True)


def ensure_lexical_index(
    spark,
    sf_dir: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Build-once path contract, keyed like ``ensure_ivf_index``: the
    index lives under the session warehouse as ``lex_{table}_{sfdir}``
    and is rebuilt when its marker is missing or the source mtime
    RECORDED AT BUILD TIME differs from the current one (sidecar
    comparison — immune to same-granule in-place rewrites)."""
    import re
    from urllib.parse import urlparse

    from plumberapp_spark.session import _path_mtime, load_table

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "spark-warehouse"
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"lex_{table}_{tag}")
    # postings is the LAST relation the build writes, so its marker is
    # the build-complete signal (norms alone would accept a build that
    # died before the denormalized postings landed)
    marker = os.path.join(path, "postings", "_SUCCESS")
    sidecar = os.path.join(path, "source_mtime.txt")
    source_mtime = _path_mtime(f"{sf_dir}/{table}.parquet")
    recorded, rec_format = None, None
    try:
        with open(sidecar) as fh:
            parts = fh.read().split()
            recorded = float(parts[0])
            rec_format = int(parts[1]) if len(parts) > 1 else 1
    except (OSError, ValueError, IndexError):
        recorded = None
    stale = (
        not os.path.exists(marker)
        or recorded is None
        or recorded != source_mtime
        # an index built by an older layout (e.g. pre-denormalized-norm
        # postings) must rebuild, not AnalysisException at serve time
        or rec_format != INDEX_FORMAT
    )
    if stale:
        build_lexical_index(
            load_table(spark, sf_dir, table), path, text_col, id_col
        )
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {INDEX_FORMAT}")
    return path


def _query_postings(
    spark,
    path: str,
    query_terms: DataFrame = None,
    n_buckets: int = DEFAULT_BUCKETS,
    tk_rows: list = None,
) -> DataFrame:
    """Postings rows for the query's terms: partition-prune the scan to
    the terms' buckets (an IN filter on the int partition column — at
    most ``n_buckets`` values, always pushdown-safe), then
    broadcast-semi-join on the token itself. ``query_terms`` is a
    one-column ``tk`` frame, bounded by the small-side contract.
    ``n_buckets`` MUST be the modulus recorded in the index's scalars
    (``_index_scalars``) — pruning under any other modulus silently
    drops postings rows. A caller that already holds the term strings
    driver-side passes ``tk_rows`` (round 11): the distributed
    distinct-and-collect job is skipped entirely."""
    from plumberapp_spark.session import local_relation, read_parquet_cached

    # one bounded collect of the distinct terms (small-side contract,
    # guarded); buckets compute driver-side (zlib.crc32 == Spark crc32
    # over utf-8 bytes) and the semi-join broadcasts a LOCAL relation —
    # the collected output of the exact plan it replaces (round 11:
    # one job instead of a collect plus a re-executed broadcast build)
    import zlib

    if tk_rows is None:
        tk_rows = query_terms.select("tk").distinct().limit(100_001).collect()
        tk_rows = [r["tk"] for r in tk_rows]
    else:
        tk_rows = sorted(set(tk_rows))
    if len(tk_rows) > 100_000:
        # above the bounded-collect contract: keep the OLD distributed
        # path (full postings scan semi-joined against the distinct
        # term frame — no driver-side bucket pruning, which needs the
        # term strings in hand) instead of failing hard (ADVICE r11).
        # ``query_terms`` is required here; tk_rows callers all enforce
        # their own 100k guard before collecting.
        if query_terms is None:
            raise ValueError(
                "_query_postings: term set exceeds the 100000-term "
                "bounded-collect contract and no distributed term frame "
                "was provided; pass query_terms or batch the queries"
            )
        postings = read_parquet_cached(spark, f"{path}/postings")
        return postings.join(
            F.broadcast(query_terms.select("tk").distinct()), "tk", "left_semi"
        )
    buckets = sorted(
        {zlib.crc32(tk.encode("utf-8")) % n_buckets for tk in tk_rows}
    )
    local_terms = local_relation(spark, [(tk,) for tk in tk_rows], "tk string")
    postings = read_parquet_cached(spark, f"{path}/postings")
    if buckets:
        postings = postings.filter(F.col("_b").isin(buckets))
    return postings.join(F.broadcast(local_terms), "tk", "left_semi")


def _two_stage_topk(scored: DataFrame, k: int, score_col: str) -> DataFrame:
    """The family's shared ranking tail: per-(query, partition) rank
    caps what the global rank sees at k · partitions rows per query."""
    w_local = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(
        F.col(score_col).desc(), "neighbor_id"
    )
    pruned = scored.withColumn("_lr", F.row_number().over(w_local)).filter(
        F.col("_lr") <= k
    )
    w_global = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), "neighbor_id"
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            score_col,
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _query_term_frame(queries: DataFrame, text_col: str) -> DataFrame:
    """Distinct tokens of the query docs — a bounded JVM explode on the
    small-side query frame. This is the pruning key: every postings row
    a query run can touch (candidates AND the query docs' own vectors)
    carries one of these tokens, so ONE pruned scan serves both."""
    from plumberapp_spark.functions.text import tokenize

    return (
        queries.select(F.explode(tokenize(F.col(text_col))).alias("tk"))
        .distinct()
    )


def tfidf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """tf-idf cosine top-k over a persisted :func:`build_lexical_index`
    — output-identical to ``dedup.tfidf_topk`` on the same corpus
    (same weights, same 6-decimal rounding before rank, same tie-break).

    ``queries`` carries the query docs (ids + text) drawn from the
    indexed corpus. Their term VECTORS come from the index itself: the
    pruned postings read covers exactly the query terms' buckets, and a
    query doc's own postings all carry query terms, so one pruned scan
    yields both the candidates and the query-side weights — no full
    postings pass anywhere. Postings rows carry the doc norm
    (denormalized at build), so the cosine needs NO norms join: the
    aggregate picks the doc norm up with ``first(nrm)`` and the query
    norm rides the broadcast term map.

    Round 11: the pruned candidate scan is persisted for the call
    (released by the NEXT retrieval call — the
    ``release_retrieval_caches`` contract): the query-weight extraction
    inside the broadcast build and the scoring join read ONE scan."""
    from plumberapp_spark.llm.dedup import (
        _RETRIEVAL_CACHES,
        release_retrieval_caches,
    )

    _, n_buckets = _index_scalars(spark, path)
    qids = queries.select(F.col(id_col).alias("_qid")).distinct()
    release_retrieval_caches()
    cand = _query_postings(
        spark, path, _query_term_frame(queries, text_col), n_buckets
    ).persist()
    _RETRIEVAL_CACHES.append(cand)
    qw = cand.join(
        F.broadcast(qids), cand["doc_id"] == F.col("_qid"), "inner"
    ).select(
        F.col("_qid").alias("query_id"),
        "tk",
        F.col("w_tfidf").alias("_qw"),
        F.col("nrm").alias("_qn"),
    )
    scored = (
        cand.join(F.broadcast(qw), "tk")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("w_tfidf") * F.col("_qw")).alias("_dot"),
            F.first("nrm").alias("_nrm"),
            F.first("_qn").alias("_qn2"),
        )
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            F.round(F.col("_dot") / (F.col("_nrm") * F.col("_qn2")), 6).alias("cos_sim"),
        )
    )
    return _two_stage_topk(scored, k, "cos_sim")


def bm25_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k over a persisted :func:`build_lexical_index` —
    output-identical to ``dedup.bm25_topk`` (same Robertson/Lucene
    weights, 6-decimal rounding before rank, neighbor-id tie-break).
    The query is a term SET (distinct terms, query tf ignored), derived
    from the query docs' own postings rows inside the pruned scan.
    Round 11: the pruned candidate scan is persisted for the call (the
    ``release_retrieval_caches`` contract) — the query-term extraction
    and the scoring join read ONE scan."""
    from plumberapp_spark.llm.dedup import (
        _RETRIEVAL_CACHES,
        release_retrieval_caches,
    )

    _, n_buckets = _index_scalars(spark, path)
    qids = queries.select(F.col(id_col).alias("_qid")).distinct()
    release_retrieval_caches()
    cand = _query_postings(
        spark, path, _query_term_frame(queries, text_col), n_buckets
    ).persist()
    _RETRIEVAL_CACHES.append(cand)
    qterms = (
        cand.join(F.broadcast(qids), cand["doc_id"] == F.col("_qid"), "inner")
        .select(F.col("_qid").alias("query_id"), "tk")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(qterms), "tk")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("w_bm25"), 6).alias("bm25"))
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "bm25")
    )
    return _two_stage_topk(scored, k, "bm25")


# ---- free-text (out-of-corpus) query serving -------------------------
#
# The indexed paths above take query DOCS drawn from the indexed corpus
# (their weights are read back from the query docs' own postings rows).
# A production retrieval endpoint serves the opposite shape: a novel
# query STRING that was never seen at build time. These paths tokenize
# the free text, derive each query term's df by counting its (pruned)
# posting rows — postings hold one row per (term, doc), so the count IS
# df, no extra relation needed — and weight query terms from the
# index's recorded globals, mirroring how the reference's vocab-lookup
# serving path handles tokens unseen at table-build
# (mb/simple_gnmt/utils/iterator_utils.py:142-153: lookup with a
# default). Terms absent from the corpus have no postings, match
# nothing, and drop out of the query vector entirely (df=0 has no
# defined idf) — the documented OOV semantics.
#
# 100 TB posture: identical to the in-corpus serving paths — the only
# corpus-sized relation touched is the pruned postings subset of the
# query's terms; the df rollup is one extra aggregate over that same
# pruned scan (vocab-of-query-sized output), and everything query-sided
# broadcasts.


def _freetext_qtf(queries: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-(query, term) tf of the free-text queries — a bounded JVM
    explode+agg on the small-side query frame."""
    from plumberapp_spark.functions.text import tokenize

    return (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(tokenize(F.col(text_col))).alias("tk"),
        )
        .groupBy("query_id", "tk")
        .agg(F.count("*").alias("_qtf"))
    )


def tfidf_topk_freetext(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "q_text",
    id_col: str = "query_id",
) -> DataFrame:
    """tf-idf cosine top-k for free-text queries over a persisted
    :func:`build_lexical_index`. The query vector is ``qtf(t) ·
    ln(N/df(t))`` over the terms the corpus knows (OOV terms drop from
    dot AND query norm); the document side is the index's stored
    weights and denormalized norms — so scoring against a novel string
    needs exactly one pruned postings scan, one query-vocab-sized df
    aggregate, and the family's shared two-stage top-k. No self-
    exclusion: query ids live in their own id space.

    Round 11: the (query, term, tf) frame is collected ONCE (bounded —
    it is the query-side explode, the same 100k small-side contract as
    every lexical serve) and re-ships as a local relation, and the
    pruned candidate scan is persisted for the duration of the call
    (released by the NEXT direct-form retrieval call — the
    ``release_retrieval_caches`` lifetime contract, so every invocation
    still computes from the parquet index): the df rollup inside the
    broadcast build and the scoring join both read ONE scan instead of
    re-scanning the pruned postings per consumer."""
    from plumberapp_spark.llm.dedup import (
        _RETRIEVAL_CACHES,
        release_retrieval_caches,
    )
    from plumberapp_spark.session import local_relation

    sc, n_buckets = _index_scalars(spark, path)
    qtf_plan = _freetext_qtf(queries, text_col, id_col)
    qtf_rows = qtf_plan.limit(100_001).collect()
    if len(qtf_rows) > 100_000:
        raise ValueError(
            "tfidf_topk_freetext: query term set exceeds the broadcastable "
            "contract (> 100000 (query, term) rows); batch the queries"
        )
    qtf = local_relation(spark, qtf_rows, qtf_plan.schema)
    release_retrieval_caches()
    cand = _query_postings(
        spark, path, None, n_buckets, tk_rows=[r["tk"] for r in qtf_rows]
    ).persist()
    _RETRIEVAL_CACHES.append(cand)
    dfreq = cand.groupBy("tk").agg(F.count("*").alias("_df"))
    qw = (
        qtf.join(dfreq, "tk")
        .crossJoin(F.broadcast(sc.select("_nd")))
        .select(
            "query_id",
            "tk",
            (F.col("_qtf") * F.log(F.col("_nd") / F.col("_df"))).alias("_qw"),
        )
    )
    qn = qw.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("_qw") * F.col("_qw"))).alias("_qn")
    )
    scored = (
        cand.join(F.broadcast(qw.join(qn, "query_id")), "tk")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("w_tfidf") * F.col("_qw")).alias("_dot"),
            F.first("nrm").alias("_nrm"),
            F.first("_qn").alias("_qn2"),
        )
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            F.round(F.col("_dot") / (F.col("_nrm") * F.col("_qn2")), 6).alias("cos_sim"),
        )
    )
    return _two_stage_topk(scored, k, "cos_sim")


def bm25_topk_freetext(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "q_text",
    id_col: str = "query_id",
) -> DataFrame:
    """BM25 top-k for free-text queries over the persisted index. The
    query is the free text's distinct term SET (matching
    ``bm25_topk``'s set semantics); each matched posting contributes
    its stored ``w_bm25`` — BM25's query side needs no df at all, so
    this is one pruned scan + one aggregate. Round 11: the query term
    set is collected ONCE (the family's bounded 100k contract) and
    re-ships as a local relation — one job feeds both the pruning key
    and the scoring broadcast instead of re-running the query explode
    per consumer."""
    from plumberapp_spark.session import local_relation

    _, n_buckets = _index_scalars(spark, path)
    qterms_plan = (
        _freetext_qtf(queries, text_col, id_col)
        .select("query_id", "tk")
        .distinct()
    )
    qterms_rows = qterms_plan.limit(100_001).collect()
    if len(qterms_rows) > 100_000:
        raise ValueError(
            "bm25_topk_freetext: query term set exceeds the broadcastable "
            "contract (> 100000 (query, term) rows); batch the queries"
        )
    qterms = local_relation(spark, qterms_rows, qterms_plan.schema)
    cand = _query_postings(
        spark, path, None, n_buckets, tk_rows=[r["tk"] for r in qterms_rows]
    )
    scored = (
        cand.join(F.broadcast(qterms), "tk")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("w_bm25"), 6).alias("bm25"))
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "bm25")
    )
    return _two_stage_topk(scored, k, "bm25")
