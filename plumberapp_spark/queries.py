"""Query registry — every implemented operator surfaced as a named query
with a DuckDB-checkable oracle (the driver's correctness gate).

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with the
ANSI-SQL statement DuckDB runs over the same parquet tables (views:
region nation customer supplier part orders lineitem events documents
embeddings). Column names/types are aligned on both sides; floating
aggregates are rounded identically so cross-engine summation order can't
flip the hash.

Cross-engine discipline (learned the hard way, kept as law):
* counts/sizes -> cast to BIGINT on the Spark side (F.size is int).
* int division -> floor() in the oracle (DuckDB casts double->int by
  ROUNDING; Spark truncates).
* hashes -> md5-derived only (engine-native hashes differ).
* no timestamps in result sets (format drift) — cast or project away.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plumberapp_spark.session import load_table, row_idx_bounds
from plumberapp_spark.operators import (
    with_row_idx,
    take,
    skip,
    shard,
    repeat,
    zip_by_index,
    echo,
    batch,
    unbatch,
    group_by_window,
)
from plumberapp_spark.operators.transforms import (
    pad_to_length,
    hash_bucket,
    vocab_lookup,
    conditional,
    truncate_seq,
)
from plumberapp_spark.functions import tokenize


from plumberapp_spark.registry import REGISTRY, register


# --------------------------------------------------------------------------
# Relational core (A8 rollups, P2 filters, A5 top-k, P8 conditionals, J4 join)
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship rollup (TPC-H Q1 shape): filter -> grouped aggregate.

    Exercises A8 pipeline-level rollups + P2 filter pushdown (the shipdate
    predicate reaches the parquet scan — `PushedFilters` in explain()).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q02_filter_projection",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 50000
    """,
)
def q02_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 FilterDataset + P3 parse-as-projection; both predicate and column
    pruning push to the scan."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 50000))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
    )


@register(
    "q03_topk",
    oracle="""
    SELECT event_id, round(value, 2) AS value
    FROM events ORDER BY value DESC, event_id LIMIT 10
    """,
)
def q03_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 ranked bottleneck list = orderBy + limit (top-k). Spark plans this
    as TakeOrderedAndProject — per-partition top-k then a k-row merge, no
    global sort (the scale-correct plan)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(10)
        .select("event_id", F.round("value", 2).alias("value"))
    )


@register(
    "q04_conditional",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS value_class,
           round(CASE WHEN value < 0 THEN 0.0 ELSE value END, 2) AS clipped
    FROM events
    """,
)
def q04_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 tf.cond per-row conditional (padding-sentinel pattern,
    imagenet_input.py:86-87)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.when(v < 50, "low").when(v < 150, "mid").otherwise("high").alias("value_class"),
        F.round(conditional(v < 0, F.lit(0.0), v), 2).alias("clipped"),
    )


@register(
    "q05_vocab_lookup",
    oracle="""
    SELECT c_custkey, coalesce(n_name, '<unk>') AS nation_name
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q05_vocab_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/J4 vocab-table lookup with default — broadcast hash join
    (iterator_utils.py:90-145). Check explain(): BroadcastHashJoin."""
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "token")
    vocab = (
        load_table(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("token"), F.col("n_name").alias("id"))
    )
    out = vocab_lookup(cust, vocab, token_col="token", id_col="id", default_id="<unk>", out_col="nation_name")
    return out.select("c_custkey", "nation_name")


# --------------------------------------------------------------------------
# Ordered-stream operators (J1 zip, O2-O5, O8/O9, A1, A4)
# --------------------------------------------------------------------------


@register(
    "q06_zip_by_index",
    oracle="""
    WITH a AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS _row_idx, o_orderkey FROM orders),
         b AS (SELECT row_number() OVER (ORDER BY event_id) - 1 AS _row_idx, event_id, event_type FROM events)
    SELECT a._row_idx AS _row_idx, a.o_orderkey, b.event_id, b.event_type
    FROM a JOIN b USING (_row_idx)
    """,
)
def q06_zip_by_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 Dataset.zip — positional pairing of two streams, truncating to the
    shorter (iterator_utils.py:55). Dense index via the two-pass
    range-partition row index (no single-task global window).

    Boundary jobs are per side: the shared-single-job variant
    (shared_row_idx_bounds) was measured at sf0.1 and is NOT faster here
    — the null-padded union scan costs what the saved job latency buys
    back (5-rep A/B: shared ~1.6 s vs per-side ~1.45 s steady-state) —
    so the simpler form stays."""
    from plumberapp_spark.operators.stream import with_row_idx_simple
    from plumberapp_spark.session import table_bytes

    # Size-routed like q36: below 32 MB a single-task window per side
    # beats the distributed bucket machinery's fixed multi-stage cost
    # (measured 0.76 s -> 0.54 s at sf0.1); above it the bucketed
    # two-phase index keeps keys x buckets parallelism (the plain window
    # is the one-task scale-killer SCALE.md quantifies). Both paths
    # produce the identical dense index.
    def side(name: str, cols: list, key: str):
        df = load_table(spark, sf_dir, name).select(*cols)
        size = table_bytes(sf_dir, name)
        if size is not None and size < (32 << 20):
            return with_row_idx_simple(df, [key])
        return with_row_idx(df, [key], bounds=row_idx_bounds(sf_dir, name, key))

    orders = side("orders", ["o_orderkey"], "o_orderkey")
    events = side("events", ["event_id", "event_type"], "event_id")
    return zip_by_index(orders, events).select("_row_idx", "o_orderkey", "event_id", "event_type")


@register(
    "q07_take_skip_shard",
    oracle="""
    WITH s AS (SELECT row_number() OVER (ORDER BY event_id) - 1 AS _row_idx,
                      event_id, user_id, round(value, 2) AS value
               FROM events)
    SELECT _row_idx, event_id, user_id, value
    FROM s WHERE _row_idx < 500 AND _row_idx >= 100 AND _row_idx % 4 = 1
    """,
)
def q07_take_skip_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 take(500) -> O4 skip(100) -> O5 shard(4, 1) over the ordered
    events stream (imagenet_input.py:167,188,200)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round("value", 2).alias("value")
    )
    idxed = with_row_idx(ev, ["event_id"], bounds=row_idx_bounds(sf_dir, "events", "event_id"))
    return shard(skip(take(idxed, 500), 100), 4, 1).select("_row_idx", "event_id", "user_id", "value")


@register(
    "q08_batch_stats",
    oracle="""
    WITH s AS (SELECT row_number() OVER (ORDER BY event_id) - 1 AS _row_idx, value FROM events),
         b AS (SELECT CAST(floor(_row_idx / 64) AS BIGINT) AS _batch_id,
                      count(*) AS batch_size_actual,
                      round(sum(value), 2) AS sum_value,
                      min(_row_idx) AS first_idx,
                      max(_row_idx) AS last_idx
               FROM s GROUP BY 1)
    SELECT * FROM b WHERE batch_size_actual = 64
    """,
)
def q08_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 BatchDatasetV2(64, drop_remainder=True): consecutive blocks as
    array-of-struct rows; verified via per-batch aggregates derived FROM the
    assembled batch array (proves content + order)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    batched = batch(
        with_row_idx(ev, ["event_id"], bounds=row_idx_bounds(sf_dir, "events", "event_id")),
        64,
        drop_remainder=True,
    )
    vals = F.transform(F.col("batch"), lambda b: b["value"])
    return batched.select(
        "_batch_id",
        "batch_size_actual",
        F.round(F.aggregate(vals, F.lit(0.0), lambda acc, v: acc + v), 2).alias("sum_value"),
        F.element_at(F.col("batch"), 1)["_row_idx"].alias("first_idx"),
        F.element_at(F.col("batch"), -1)["_row_idx"].alias("last_idx"),
    )


@register(
    "q09_repeat_echo",
    oracle="""
    WITH s AS (SELECT event_id FROM events ORDER BY event_id LIMIT 50)
    SELECT s.event_id, e.range AS _epoch, c.range AS _echo
    FROM s, range(3) e, range(2) c
    """,
)
def q09_repeat_echo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 repeat(3) + O9 flat_map echoing(2) (dataset_echoing.py:17-23) over
    a take(50) prefix."""
    ev = load_table(spark, sf_dir, "events").select("event_id")
    prefix = take(
        with_row_idx(ev, ["event_id"], bounds=row_idx_bounds(sf_dir, "events", "event_id")), 50
    ).drop("_row_idx")
    out = echo(repeat(prefix, 3), 2)
    return out.select("event_id", "_epoch", F.col("_echo").cast("bigint").alias("_echo"))


@register(
    "q10_unbatch_roundtrip",
    oracle="SELECT event_id, user_id, round(value, 2) AS value FROM events",
)
def q10_unbatch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 batch + O8 unbatch roundtrip == identity on the stream
    (estimator.py:148-150)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round("value", 2).alias("value")
    )
    batched = batch(
        with_row_idx(ev, ["event_id"], bounds=row_idx_bounds(sf_dir, "events", "event_id")), 32
    )
    return unbatch(batched).select("event_id", "user_id", "value")


@register(
    "q11_group_by_window",
    oracle=r"""
    WITH s AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS _row_idx,
                      least(5, CAST(floor(len(list_filter(string_split_regex(text, '\s+'), t -> t != '')) / 10) AS BIGINT)) AS _bucket_key
               FROM documents),
         r AS (SELECT _bucket_key, _row_idx,
                      row_number() OVER (PARTITION BY _bucket_key ORDER BY _row_idx) - 1 AS rk
               FROM s)
    SELECT _bucket_key, CAST(floor(rk / 8) AS BIGINT) AS _window_id,
           count(*) AS batch_size_actual, min(_row_idx) AS first_idx
    FROM r GROUP BY 1, 2
    """,
)
def q11_group_by_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 group_by_window — sequence-length bucketing (GNMT,
    iterator_utils.py:231-255): bucket = least(5, n_tokens div 10),
    windows of 8 per bucket."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idxed = with_row_idx(docs, ["doc_id"], bounds=row_idx_bounds(sf_dir, "documents", "doc_id"))
    key = F.least(F.lit(5), F.floor(F.size(tokenize(F.col("text"))) / 10)).cast("bigint")
    win = group_by_window(idxed.select("_row_idx", key.alias("_k")), F.col("_k"), 8)
    return win.select(
        F.col("_bucket_key"),
        "_window_id",
        "batch_size_actual",
        F.element_at(F.col("batch"), 1)["_row_idx"].alias("first_idx"),
    )


@register(
    "q12_string_pipeline",
    oracle=r"""
    WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
               FROM documents),
         p AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS src_len,
                      (toks[1:12] || ['</s>', '</s>', '</s>', '</s>', '</s>', '</s>', '</s>',
                                      '</s>', '</s>', '</s>', '</s>', '</s>', '</s>', '</s>'])[1:14] AS padded
               FROM t)
    SELECT doc_id, src_len, array_to_string(padded, ' ') AS padded_str FROM p
    """,
)
def q12_string_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 split + truncate, P13 pad-to-length — the GNMT text pipeline shape
    (iterator_utils.py:64-85,170-190), verified via the joined pad result."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    padded = pad_to_length(truncate_seq(toks, 12), 14, "</s>")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("src_len"),
        F.array_join(padded, " ").alias("padded_str"),
    )


@register(
    "q13_hash_bucket",
    oracle="""
    SELECT doc_id, CAST(('0x' || substr(md5(source), 1, 8))::BIGINT % 16 AS BIGINT) AS bucket
    FROM documents
    """,
)
def q13_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 string hash bucketing (modulo-md5 semantics; declared divergence
    from TF Fingerprint64 — SURVEY §2.2)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", hash_bucket(F.col("source"), 16).alias("bucket"))


# --------------------------------------------------------------------------
# Driver contract
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
