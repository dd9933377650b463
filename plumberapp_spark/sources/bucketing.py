"""Bucketed-table support: the co-located-join lever for repeated
fact⋈fact joins.

At 100 TB the dominant repeated cost of the star-schema queries is the
lineitem⋈orders shuffle (each side re-exchanged on orderkey per query).
Hive-style bucketing pays that shuffle ONCE at write time: both tables
written ``bucketBy(n, key)`` land with identical hash-partitioning on
disk, and every subsequent equi-join on the key reads bucket-aligned
splits — the physical plan keeps the SortMergeJoin but drops BOTH
Exchange nodes (pinned in ``tests/test_bucketed_join.py``).

The reference has no analog (its graph is a tree — no joins, SURVEY
§2.3); this is a Spark-native extension in the same spirit as its cache
placement: spend one materialization to delete a recurring cost.

Cluster sizing rule: ``num_buckets`` should be a multiple of the
executor count and sized so one bucket of the larger table fits an
executor core's working memory (~128-256 MB of on-disk parquet per
bucket at 100 TB ⇒ thousands of buckets; bucket-count mismatches
between tables force a shuffle on the smaller side only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a managed parquet table bucketed (and by
    default sorted) by ``key`` — after this, equi-joins between tables
    bucketed the same way on ``key`` shuffle nothing.

    ``sort=True`` additionally makes each bucket file key-sorted, so the
    SMJ's per-task sort is a no-op over already-sorted runs.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, which is why this goes through ``table`` not ``read.parquet``)."""
    return spark.table(table)
