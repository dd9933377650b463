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

import os
import time
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException

# Gate for _drop_stale_location: only directories strictly older than this
# process may be treated as orphans of a previous run.
_PROCESS_START = time.time()


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


# Fact tables worth bucketing, with their join key: every fact⋈fact query
# in the suite joins lineitem⋈orders on orderkey (TPC-H Q3/Q5/Q10/Q18
# shapes), so ONE bucketed materialization serves all of them.
FACT_BUCKET_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def bucketed_name(sf_dir: str, table: str, num_buckets: int) -> str:
    """Deterministic catalog name for the bucketed copy of ``sf_dir``'s
    ``table`` — e.g. ``bkt_lineitem_sf0_1_32``."""
    import re

    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    return f"bkt_{table}_{tag}_{num_buckets}"


def default_num_buckets(spark: SparkSession) -> int:
    return spark.sparkContext.defaultParallelism


def ensure_bucketed_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: dict[str, str] | None = None,
    num_buckets: int | None = None,
) -> dict[str, str]:
    """Materialize bucketed copies of the fact tables (idempotent per
    session catalog) and return {table: catalog_name}.

    This is the opt-in 'pay the shuffle once' step: callers that expect
    to run several fact⋈fact queries against the same data (bench.py, a
    long-lived serving session) call this once; every later
    :func:`bucketed_or_parquet` read then joins with ZERO exchanges on
    the bucket key. Sessions that never call it (the correctness driver)
    transparently fall back to the plain parquet path — same results.
    """
    from plumberapp_spark.session import load_table

    tables = tables or FACT_BUCKET_KEYS
    num_buckets = num_buckets or default_num_buckets(spark)
    names: dict[str, str] = {}
    for table, key in tables.items():
        name = bucketed_name(sf_dir, table, num_buckets)
        if not spark.catalog.tableExists(name):
            _drop_stale_location(spark, name)
            try:
                write_bucketed(load_table(spark, sf_dir, table), name, key, num_buckets)
            except AnalysisException as exc:
                # LOCATION_ALREADY_EXISTS from a concurrent process's
                # just-written directory (which _drop_stale_location
                # deliberately left alone): skip — bucketed_or_parquet
                # falls back to the plain parquet read, same results.
                # Narrowed from bare Exception (ADVICE r5): disk-full /
                # permission / schema errors should surface, not silently
                # degrade every run to the unbucketed path.
                warnings.warn(
                    f"bucketed write of {name} failed ({exc}); "
                    "falling back to the plain parquet read",
                    stacklevel=2,
                )
                continue
        names[table] = name
    return names


def _drop_stale_location(spark: SparkSession, name: str) -> None:
    """Remove an orphaned managed-table directory. The session catalog is
    in-memory, so a table written by a PREVIOUS process is 'not exists'
    to this one while its warehouse directory persists on disk —
    saveAsTable then fails with LOCATION_ALREADY_EXISTS (this killed the
    bucketed path of a whole bench run).

    'No live catalog references it' only holds for THIS process, so the
    delete is gated on the directory being older than this process's
    start (ADVICE r4): a directory another concurrently-running
    bench/test process just wrote (or is writing) is younger and is left
    alone — that process's saveAsTable owns it. A genuinely stale orphan
    from a previous run always predates us and is removed as before."""
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if not wh:
        return
    path = f"{wh}/{name.lower()}"
    try:
        dir_mtime = os.stat(path).st_mtime
    except OSError:
        return  # nothing on disk — saveAsTable will just create it
    if dir_mtime >= _PROCESS_START:
        # written during our lifetime by someone else: do not touch; let
        # saveAsTable surface LOCATION_ALREADY_EXISTS to the caller, whose
        # tableExists/except fallback routes to the plain parquet read.
        return
    shutil.rmtree(path, ignore_errors=True)


def has_bucketed(
    spark: SparkSession, sf_dir: str, table: str, num_buckets: int | None = None
) -> bool:
    """True when this session's catalog holds the bucketed copy —
    callers use this to pin the exchange-free merge-join route that the
    bucketed layout exists to serve (AQE otherwise happily picks a
    broadcast join at small SF and pays a build the layout made
    unnecessary)."""
    num_buckets = num_buckets or default_num_buckets(spark)
    try:
        return spark.catalog.tableExists(bucketed_name(sf_dir, table, num_buckets))
    except Exception:
        return False


def bucketed_or_parquet(
    spark: SparkSession, sf_dir: str, table: str, num_buckets: int | None = None
) -> DataFrame:
    """Catalog-routed fact read: the bucketed copy when this session has
    one (see :func:`ensure_bucketed_tables`), else the plain parquet."""
    from plumberapp_spark.session import load_table

    num_buckets = num_buckets or default_num_buckets(spark)
    name = bucketed_name(sf_dir, table, num_buckets)
    try:
        if spark.catalog.tableExists(name):
            return spark.table(name)
    except Exception:
        pass
    return load_table(spark, sf_dir, table)
