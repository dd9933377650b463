"""Batching operators (SURVEY §2.4 A1–A4, §2.5 O8).

Batches are rows whose payload is an array-of-structs column (``batch``),
grouped by ``floor(_row_idx / k)`` — the relational expression of
consecutive-element blocking. ``collect_list`` order is nondeterministic in
Spark, so every batch is re-sorted by the embedded ``_row_idx`` via
``array_sort`` (deterministic, JVM-side).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from plumberapp_spark.operators.stream import ROW_IDX

BATCH_ID = "_batch_id"
BATCH_COL = "batch"


def _collect_sorted_batch(cols: Sequence[str], idx: str) -> Column:
    inner = F.struct(F.col(idx).alias(idx), *[F.col(c).alias(c) for c in cols if c != idx])
    return F.array_sort(F.collect_list(inner)).alias(BATCH_COL)


def batch(
    df: DataFrame,
    batch_size: int,
    drop_remainder: bool = False,
    idx: str = ROW_IDX,
) -> DataFrame:
    """A1 ``BatchDatasetV2`` — groups of ``batch_size`` consecutive elements.

    Reference: ``mb/simple_resnet/MLPerf/imagenet_input.py:214,225``;
    parallel-batch rewrite ``pa/graphdef_util.py:81-107`` (N/A here —
    Spark aggregation is parallel by construction). A2 ``MapAndBatch``
    fusion (``pa/graphdef_util.py:13,46,896-897``) is likewise built-in:
    Catalyst collapses an upstream projection into this aggregation's
    input stage (one WholeStageCodegen span — see
    tests/test_explain_plans.py).

    Output: one row per batch with ``_batch_id``, ``batch`` (array of
    structs sorted by ``_row_idx``) and ``batch_size_actual``.
    """
    cols = [c for c in df.columns if c != idx]
    out = (
        df.withColumn(BATCH_ID, (F.col(idx) / batch_size).cast("bigint"))
        .groupBy(BATCH_ID)
        .agg(_collect_sorted_batch(cols, idx), F.count("*").alias("batch_size_actual"))
    )
    if drop_remainder:
        out = out.filter(F.col("batch_size_actual") == batch_size)
    return out


def unbatch(df: DataFrame, batch_col: str = BATCH_COL) -> DataFrame:
    """O8 ``unbatch`` — split blocks back into elements.

    Reference: ``mb/simple_gnmt/estimator.py:148-150``;
    ``pa/dataset_echoing.py:47-54``.
    """
    exploded = df.select(F.explode(F.col(batch_col)).alias("_elem"))
    return exploded.select("_elem.*")


def padded_batch(
    df: DataFrame,
    batch_size: int,
    padded_shapes: Mapping[str, int],
    padding_values: Mapping[str, object],
    drop_remainder: bool = False,
    idx: str = ROW_IDX,
) -> DataFrame:
    """A3 ``padded_batch`` — pad each array component to its target length,
    then batch. Reference: ``mb/simple_gnmt/utils/iterator_utils.py:207-229``;
    ``notebook/Example.ipynb`` cell 4.
    """
    from plumberapp_spark.operators.transforms import pad_to_length

    padded = df
    for col_name, length in padded_shapes.items():
        padded = padded.withColumn(
            col_name, pad_to_length(F.col(col_name), length, padding_values.get(col_name, 0))
        )
    return batch(padded, batch_size, drop_remainder=drop_remainder, idx=idx)


def group_by_window(
    df: DataFrame,
    key: Column,
    window_size: int,
    idx: str = ROW_IDX,
    key_name: str = "_bucket_key",
) -> DataFrame:
    """A4 ``group_by_window`` — int64 bucket per element via ``key``; each
    bucket emits full windows of ``window_size`` elements in stream order
    (sequence-length bucketing).

    Reference: ``mb/simple_gnmt/utils/iterator_utils.py:231-255`` (key =
    ``min(num_buckets, max(src_len,tgt_len) // bucket_width)``); function
    extraction ``pa/graphdef_util.py:118-125,187-197``.

    The within-bucket rank is a window partitioned BY KEY — parallel across
    buckets (no global sort), which is exactly how this scales: skew shows
    up only if one bucket dominates, the same skew the reference has.
    """
    from pyspark.sql import Window

    cols = [c for c in df.columns if c != idx]
    w = Window.partitionBy(key_name).orderBy(idx)
    keyed = df.withColumn(key_name, key.cast("bigint"))
    ranked = keyed.withColumn("_rank_in_bucket", F.row_number().over(w) - 1)
    ranked = ranked.withColumn("_window_id", (F.col("_rank_in_bucket") / window_size).cast("bigint"))
    return (
        ranked.groupBy(key_name, "_window_id")
        .agg(_collect_sorted_batch(cols, idx), F.count("*").alias("batch_size_actual"))
    )


def bucket_by_sequence_length(
    src_len: Column, tgt_len: Column, bucket_width: int, num_buckets: int
) -> Column:
    """The GNMT bucketing key function, reproduced exactly:
    ``bucket_id = min(num_buckets, max(src_len, tgt_len) // bucket_width)``
    (``mb/simple_gnmt/utils/iterator_utils.py:233-246``).
    """
    raw = F.floor(F.greatest(src_len, tgt_len) / bucket_width)
    return F.least(F.lit(num_buckets), raw).cast("bigint")
