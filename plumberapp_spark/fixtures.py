"""Deterministic pipeline-shaped fixtures (FIXTURES.md F1–F4).

The driver's testdata is relational; the reference's five pipelines
consume image/detection/text shapes. These generators synthesize those
shapes from ``spark.range`` with md5-derived counter-based pseudo-
randomness (seed 42 convention) — no RNG state, so any executor
regenerates identical rows at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plumberapp_spark.functions.hashing import md5_long


def _u(col, seed: int, lo: int, hi: int):
    """Uniform int in [lo, hi] keyed on (seed, row id)."""
    return (md5_long(col.cast("string"), seed) % (hi - lo + 1) + lo).cast("bigint")


def imagenet_examples(spark: SparkSession, n: int = 10_000) -> DataFrame:
    """F1: {image bytes, height, width, label}; 1% label=-1 sentinels
    (imagenet_input.py:42-46,86-87)."""
    df = spark.range(n).withColumnRenamed("id", "_row_idx")
    rid = F.col("_row_idx")
    payload_len = _u(rid, 1, 2_000, 20_000)
    # payload: md5 hex repeated to length (deterministic stand-in bytes)
    payload = F.encode(
        F.substring(F.repeat(F.md5(rid.cast("string")), 700), F.lit(1), payload_len.cast("int")),
        "UTF-8",
    )
    label = F.when(_u(rid, 2, 0, 99) == 0, F.lit(-1)).otherwise(_u(rid, 3, 1, 1000))
    return df.select(
        "_row_idx",
        payload.alias("image"),
        _u(rid, 4, 64, 512).cast("int").alias("height"),
        _u(rid, 5, 64, 512).cast("int").alias("width"),
        label.alias("label"),
    )


def coco_examples(spark: SparkSession, n: int = 5_000) -> DataFrame:
    """F2: variable-length box/class arrays (tf_example_decoder.py:36-77)."""
    df = spark.range(n).withColumnRenamed("id", "_row_idx")
    rid = F.col("_row_idx")
    k = _u(rid, 10, 0, 20)
    idxs = F.sequence(F.lit(1), F.greatest(k, F.lit(1)).cast("int"))
    idxs = F.when(k >= 1, idxs).otherwise(F.array().cast("array<int>"))

    def arr(seed: int, scale: float):
        return F.transform(idxs, lambda i: (md5_long(F.concat(rid.cast("string"), F.lit(":"), i.cast("string")), seed) % 1000) / F.lit(1000.0 / scale))

    xmin = arr(11, 0.5)
    ymin = arr(12, 0.5)
    return df.select(
        "_row_idx",
        rid.cast("string").alias("source_id"),
        _u(rid, 13, 100, 640).cast("int").alias("height"),
        _u(rid, 14, 100, 640).cast("int").alias("width"),
        xmin.alias("xmin"),
        F.zip_with(xmin, arr(15, 0.5), lambda a, b: a + b + 0.001).alias("xmax"),
        ymin.alias("ymin"),
        F.zip_with(ymin, arr(16, 0.5), lambda a, b: a + b + 0.001).alias("ymax"),
        F.transform(idxs, lambda i: md5_long(F.concat(rid.cast("string"), F.lit("c"), i.cast("string")), 17) % 90 + 1).alias("classes"),
        F.transform(idxs, lambda i: (md5_long(F.concat(rid.cast("string"), F.lit("w"), i.cast("string")), 18) % 2) == 0).alias("is_crowd"),
    )


def wmt_text_pairs(spark: SparkSession, n: int = 20_000, vocab_size: int = 5_000) -> tuple[DataFrame, DataFrame, DataFrame]:
    """F3: aligned src/tgt sentence tables + vocab (estimator.py:102-103;
    iterator_utils.py:50-53). ~1% empty lines, ~2% oversized."""

    def lines(seed: int) -> DataFrame:
        df = spark.range(n).withColumnRenamed("id", "_row_idx")
        rid = F.col("_row_idx")
        base_len = _u(rid, seed, 0, 60)
        length = (
            F.when(_u(rid, seed + 1, 0, 99) == 0, F.lit(0))
            .when(_u(rid, seed + 2, 0, 49) == 0, F.lit(55))
            .otherwise(base_len)
        )
        toks = F.transform(
            F.when(length >= 1, F.sequence(F.lit(1), F.greatest(length, F.lit(1)).cast("int"))).otherwise(F.array().cast("array<int>")),
            lambda i: F.concat(F.lit("tok_"), (md5_long(F.concat(rid.cast("string"), F.lit("t"), i.cast("string")), seed + 3) % vocab_size).cast("string")),
        )
        return df.select("_row_idx", F.array_join(toks, " ").alias("line"))

    vocab = spark.range(vocab_size).select(
        F.concat(F.lit("tok_"), F.col("id").cast("string")).alias("token"),
        (F.col("id") + 3).cast("int").alias("id"),
    )
    specials = spark.createDataFrame([("<s>", 0), ("</s>", 1), ("<unk>", 2)], "token string, id int")
    return lines(20), lines(30), specials.unionByName(vocab)


def wmt_tokenized(spark: SparkSession, n: int = 20_000) -> DataFrame:
    """F4: {inputs, targets} int64 sequences, some > 256 (transformer.py:110-114)."""
    df = spark.range(n).withColumnRenamed("id", "_row_idx")
    rid = F.col("_row_idx")

    def seq(seed: int):
        length = _u(rid, seed, 1, 300)
        return F.transform(
            F.sequence(F.lit(1), length.cast("int")),
            lambda i: md5_long(F.concat(rid.cast("string"), F.lit("s"), i.cast("string")), seed) % 32_000,
        )

    return df.select("_row_idx", seq(40).alias("inputs"), seq(50).alias("targets"))
