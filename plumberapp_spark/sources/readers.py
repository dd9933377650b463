"""Sources (SURVEY §2.1 S1–S7).

Parquet is the canonical storage (S1's TFRecord role); the
record-file path (S1/S3) reads whole binary files + splits records, the
way a TFRecord reader would, via binaryFile + a record-splitting
mapInPandas. At scale the parquet path is always preferred: predicate
pushdown and column pruning don't exist on opaque record files — the
reference pays that cost on every pipeline, we only pay it when
ingesting foreign data.
"""

from __future__ import annotations

import struct
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> DataFrame:
    """S1 canonical source. Reference: TFRecordDataset
    (mb/simple_resnet/MLPerf/imagenet_input.py:168-170)."""
    from plumberapp_spark.session import ensure_read_confs

    ensure_read_confs(spark)
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S2 TextLineDataset (mb/simple_gnmt/estimator.py:102-103)."""
    return spark.read.text(path)


def list_files(spark: SparkSession, pattern: str, shuffle_seed: int | None = None) -> DataFrame:
    """S3 Dataset.list_files: glob → dataset of paths; optional seeded
    shuffle (imagenet_input.py:165). One row per file with path/size."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(pattern)
        .select(F.col("path"), F.col("length").alias("size"))
    )
    if shuffle_seed is not None:
        key = F.abs(F.hash(F.col("path"), F.lit(shuffle_seed)))
        df = df.orderBy(key, "path")
    return df


RECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_idx", T.LongType()),
        T.StructField("record", T.BinaryType()),
    ]
)


def write_record_file(path: str, records: list[bytes]) -> None:
    """Length-prefixed binary record writer (the TFRecord framing idea,
    simplified: u64-LE length + payload; no CRC — declared divergence)."""
    with open(path, "wb") as f:
        for r in records:
            f.write(struct.pack("<Q", len(r)))
            f.write(r)


def read_record_files(spark: SparkSession, glob: str) -> DataFrame:
    """S1 record-file ingestion: whole-file binary read, records split in
    an Arrow-batched iterator (one task per file; file-level parallelism =
    the reference's interleave cycle_length, O10)."""

    def split_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "record_idx": [], "record": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                buf, off, i = bytes(blob), 0, 0
                while off + 8 <= len(buf):
                    (n,) = struct.unpack_from("<Q", buf, off)
                    off += 8
                    out["path"].append(path)
                    out["record_idx"].append(i)
                    out["record"].append(buf[off : off + n])
                    off += n
                    i += 1
            yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(glob).select("path", "content")
    return files.mapInPandas(split_records, RECORD_SCHEMA)


def from_slices(spark: SparkSession, rows: list, schema) -> DataFrame:
    """S4 from_tensor_slices: literal in-memory dataset
    (imagenet_input.py:144-157)."""
    return spark.createDataFrame(rows, schema)


def fake_dataset(spark: SparkSession, schema: T.StructType, n: int) -> DataFrame:
    """S6 synthetic zeros dataset matching a schema
    (pa/pipeline_optimizer.py:726-743 fake_dataset) — benchmark stand-in
    that keeps the element spec."""
    cols = []
    for f in schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            col = F.array_repeat(F.lit(0).cast(f.dataType.elementType), 4)
        elif isinstance(f.dataType, T.StringType):
            col = F.lit("")
        elif isinstance(f.dataType, T.BinaryType):
            col = F.lit(b"")
        else:
            col = F.lit(0)
        cols.append(col.cast(f.dataType).alias(f.name))
    return spark.range(n).select(*cols)
