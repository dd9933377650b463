"""Structured Streaming surface (SURVEY §7.3).

The reference's unbounded mode is ``repeat()`` with count=-1 — a stream
the benchmark consumes until a time limit (pa/gen_util.py:376-412). Spark's
native unbounded abstraction is Structured Streaming; this module provides:

* :func:`rate_stream` — the infinite-source analog (rate source).
* :func:`repeat_stream` — infinite repeat of a finite DataFrame: a rate
  stream joined to the (broadcast) finite table by modular index; each
  micro-batch emits the next slice of the endless epoch loop.
* :func:`windowed_event_counts` — watermarked sliding-window aggregation
  (the streaming analog of the metrics monitoring rollups A10/A12; the
  reference has NO late-data semantics at all, so watermarking is a pure
  extension).
* :func:`stateful_rate_monitor` — custom stateful operator via
  ``applyInPandasWithState``: per-key running rate + convergence flag,
  the streaming port of AutotuneState (pa/gen_util.py:86-105).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONVERGENCE_REL_ERR = 0.01  # pa/gen_util.py:87-90


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """S5-analog unbounded integer source."""
    return spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()


def repeat_stream(spark: SparkSession, finite: DataFrame, idx_col: str, n_rows: int, rows_per_second: int = 1000) -> DataFrame:
    """O2 repeat(-1): endless re-emission of a finite table. The rate
    stream provides the unbounded driver; each tick maps to row
    ``value % n_rows`` of the finite side (broadcast join, no state)."""
    ticks = rate_stream(spark, rows_per_second).select(
        F.col("value").alias("_tick"), F.col("timestamp").alias("_tick_ts")
    )
    ticks = ticks.withColumn("_pos", F.col("_tick") % n_rows)
    finite_b = F.broadcast(finite.withColumnRenamed(idx_col, "_pos"))
    return (
        ticks.join(finite_b, on="_pos")
        .withColumn("_epoch", (F.col("_tick") / n_rows).cast("bigint"))
        .drop("_tick_ts")
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 seconds",
    slide: str | None = None,
    watermark: str = "30 seconds",
) -> DataFrame:
    """A10/A12 streaming rollup: watermarked windowed counts + mean value.
    Works on a streaming OR batch DataFrame (same code path — Spark's
    unified semantics)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return df.groupBy(win.alias("w"), F.col("event_type")).agg(
        F.count("*").alias("n"), F.avg("value").alias("mean_value")
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("last_rate", T.DoubleType()),
        T.StructField("cum_sum", T.DoubleType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("total", T.LongType()),
        T.StructField("rate", T.DoubleType()),
        T.StructField("cum_rate", T.DoubleType()),
        T.StructField("converged", T.BooleanType()),
    ]
)


def _rate_monitor_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (count, last_rate, cum_sum) = state.get if state.exists else (0, 0.0, 0.0)
    batch_n = 0
    batch_sum = 0.0
    for pdf in pdfs:
        batch_n += len(pdf)
        batch_sum += float(pdf["value"].sum())
    count += batch_n
    cum_sum += batch_sum
    rate = batch_n / max(batch_sum, 1e-9)
    # cum_rate is a function of the TOTALS, so — unlike the per-batch
    # rate — it is invariant to micro-batch boundaries (round-6: gives
    # q55's final row an exact SQL oracle).
    cum_rate = count / max(cum_sum, 1e-9)
    converged = last_rate > 0 and abs(rate / last_rate - 1) < CONVERGENCE_REL_ERR
    state.update((count, rate, cum_sum))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "total": [count],
            "rate": [rate],
            "cum_rate": [cum_rate],
            "converged": [converged],
        }
    )


def stateful_rate_monitor(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """A12 as a custom stateful streaming operator
    (``applyInPandasWithState``): per-key cumulative count + batch rate +
    convergence flag against the previous batch's rate."""
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _rate_monitor_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_exact_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Exact dedup at INGESTION time — the streaming face of the batch
    ``exact_dedup`` family (llm/dedup.py): keep the first arrival of each
    key, dropping re-deliveries that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys the state store on ``key_cols``
    and expires entries once the watermark passes their event time, so
    state is bounded by (keys arriving within one watermark window), not
    by stream length — the property that makes it runnable forever at
    ingest scale. ``watermark=None`` selects plain streaming
    ``dropDuplicates``: state grows with distinct keys ever seen —
    correct and appropriate ONLY for bounded replays (the q57 oracle
    query) or key spaces known to be small; at unbounded ingest scale
    always pass a watermark. Batch DataFrames take the plain
    ``dropDuplicates`` path (same bounded-input semantics).
    """
    if not events.isStreaming or watermark is None:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def run_stream_to_memory(stream_df: DataFrame, query_name: str, timeout_s: float = 10.0):
    """Drive a streaming DataFrame into an in-memory sink until idle or
    timeout; returns the collected rows (test/bench harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update" if stream_df.isStreaming else "append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


_BLOOM_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kept", T.BooleanType()),
    ]
)

_BLOOM_STATE_SCHEMA = T.StructType([T.StructField("bits", T.BinaryType())])


def _bloom_dedup_fn(n_bits: int, n_hashes: int):
    def fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import hashlib

        bits = (
            bytearray(state.get[0]) if state.exists else bytearray((n_bits + 7) // 8)
        )
        chunks = [pdf for pdf in pdfs]
        pdf = pd.concat(chunks) if chunks else pd.DataFrame(columns=["doc_id", "text"])
        # arrival order within the batch is partition order; sort by id so
        # the bounded replay is deterministic (and oracle-reproducible)
        pdf = pdf.sort_values("doc_id")
        ids: list[int] = []
        kept: list[bool] = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            t = text if isinstance(text, str) else ""
            # md5_long parity: int(hexdigest[:14], 16) == conv(substr(md5,1,14),16,10)
            pos = [
                int(hashlib.md5(f"b{j}:{t}".encode()).hexdigest()[:14], 16) % n_bits
                for j in range(n_hashes)
            ]
            seen = all(bits[p >> 3] & (1 << (p & 7)) for p in pos)
            for p in pos:
                bits[p >> 3] |= 1 << (p & 7)
            ids.append(int(doc_id))
            kept.append(not seen)
        state.update((bytes(bits),))
        yield pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"), "kept": kept})

    return fn


def streaming_bloom_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Streaming content dedup with BOUNDED state — the 100 TB answer to
    :func:`streaming_exact_dedup`'s growing digest store: each of
    ``n_shards`` state partitions holds a fixed ``n_bits``-bit Bloom
    bitset (``n_shards x n_bits / 8`` bytes TOTAL, forever, regardless
    of stream length), and a document is kept iff its ``n_hashes``
    md5-derived bits are not all already set in its shard.

    Sharding is by content digest, so every re-delivery of a text lands
    on the shard that saw it first — true duplicates are NEVER kept
    (Bloom filters have no false negatives); a unique doc may be dropped
    with the usual false-positive probability, which is md5-determined
    and therefore exactly reproducible by a relational oracle. Because a
    dropped doc's bits are by definition already set, add-always and
    add-if-kept semantics coincide, making the kept-set order-free
    EXCEPT for which of two colliding docs survives — pinned to
    smallest-id-first within each micro-batch (the bounded-replay /
    oracle contract; an unbounded deploy keeps arrival order, like any
    streaming dedup).

    Output: one ``(id, kept)`` row per input doc.
    """
    from plumberapp_spark.functions.hashing import stable_bucket

    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        stable_bucket(F.coalesce(F.col(text_col), F.lit("")), n_shards).alias("_shard"),
    )
    return keyed.groupBy("_shard").applyInPandasWithState(
        _bloom_dedup_fn(n_bits, n_hashes),
        outputStructType=_BLOOM_OUT_SCHEMA,
        stateStructType=_BLOOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
