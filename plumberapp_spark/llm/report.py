"""Corpus governance reporting — the "data card" rollup a curation
pipeline publishes per ingestion source: volume, duplication,
eval-contamination, and language spread, composed from the same operator
definitions the standalone queries use (so the report is consistent with
q14/q67 by construction, not by convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plumberapp_spark.functions.text import tokenize


def corpus_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
    lang_col: str = "lang",
    ngram: int = 5,
) -> DataFrame:
    """One row per ``domain_col`` value: ``(domain, n_docs, n_tokens,
    dup_rate, contamination_rate, n_langs, top_lang)``.

    * ``dup_rate`` — share of the domain's docs that are non-first exact
      duplicates of ANY corpus doc (global dedup semantics, q14's
      min-id survivor rule — duplication across sources counts against
      the source that re-delivered it).
    * ``contamination_rate`` — share flagged by the q67 eval-overlap
      rule (distinct ``ngram``-shingle shared with the benchmark).
    * ``top_lang`` — the domain's modal language, ties to the
      lexicographically smallest (deterministic, oracle-replayable).

    Scale shape: duplicate flags ride a window over the content digest
    (one constant-width exchange, no count join); contamination comes
    from :func:`~plumberapp_spark.llm.dedup.decontaminate`'s broadcast
    semi-join lineage and joins back on the id; everything after the
    per-doc frame is a domains-sized aggregate, and the modal-language
    window runs over (domain, lang) rows — plan-sized."""
    from plumberapp_spark.llm.dedup import decontaminate

    digest = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    per_doc = corpus.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        F.col(lang_col).alias("_lang"),
        F.size(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias("_n_tok"),
        digest.alias("_dg"),
    ).withColumn(
        "_dup", F.min(id_col).over(Window.partitionBy("_dg")) != F.col(id_col)
    )
    flags = decontaminate(corpus, benchmark, text_col, id_col, ngram=ngram).select(
        F.col(id_col), F.col("contaminated")
    )
    joined = per_doc.join(flags, id_col)
    per_domain = joined.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("_n_tok").cast("bigint").alias("n_tokens"),
        F.round(F.avg(F.col("_dup").cast("double")), 6).alias("dup_rate"),
        F.round(F.avg(F.col("contaminated").cast("double")), 6).alias(
            "contamination_rate"
        ),
        F.countDistinct("_lang").cast("bigint").alias("n_langs"),
    )
    lang_counts = joined.groupBy("domain", "_lang").agg(F.count("*").alias("_lc"))
    w = Window.partitionBy("domain").orderBy(F.col("_lc").desc(), F.col("_lang"))
    top = (
        lang_counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("domain", F.col("_lang").alias("top_lang"))
    )
    return per_domain.join(top, "domain")
