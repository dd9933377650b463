"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata structs, with Arrow-batched decode/feature plumbing.

The Spark-side machinery (schema, partition sizing, ``mapInPandas``
iterator-of-batches signature) is real and tested; the actual codec calls
are STUBBED — this container has no PIL/cv2/ffmpeg. Each stub either
raises ``NotImplementedError`` (real decode) or computes a deterministic
fake (length/digest-derived), clearly marked, so the pipeline shape is
exercised end-to-end without pretending to decode JPEGs.

Scale notes: binary payloads dominate row size, so these operators
(1) never shuffle the binary column — features are extracted first, then
the binary is dropped or written through; (2) cap Arrow batch bytes via
``spark.sql.execution.arrow.maxRecordsPerBatch`` guidance rather than
row counts, since rows are megabytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def attach_media(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Wrap a binary column with its typed metadata struct (the multimodal
    column convention: payload + ``{media_type, n_bytes, digest}``)."""
    return df.withColumn(
        binary_col + "_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(F.col(binary_col)).cast("bigint").alias("n_bytes"),
            F.md5(F.col(binary_col)).alias("digest"),
        ),
    )


def extract_features(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` (iterator→iterator: constant memory per task no matter
    the partition size).

    DETERMINISTIC FAKE decode: features are byte-level (length, md5,
    mean byte value) — exactly reproducible by the DuckDB oracle — standing
    in for where a real image decode would run. Swap ``_featurize`` for a
    PIL/cv2 call on a cluster that has it.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "mean_byte": payloads.map(
                        lambda b: round(sum(bytes(b)) / len(b), 6) if len(b) else 0.0
                    ),
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(_featurize, FEATURE_SCHEMA)


def decode_image(df: DataFrame, binary_col: str) -> DataFrame:
    """P5 image decode (decode_jpeg analog, imagenet_input.py:52,78-80).

    STUB: real decode requires PIL/cv2, absent in this container.
    """
    raise NotImplementedError(
        "image decode requires PIL/cv2 (not in this container); "
        "use extract_features for the deterministic byte-level path"
    )


def sample_frames(df: DataFrame, binary_col: str, every_n: int) -> DataFrame:
    """Video frame sampling. STUB: requires ffmpeg bindings."""
    raise NotImplementedError("video frame sampling requires ffmpeg (not in this container)")


def resize_images(df: DataFrame, binary_col: str, height: int, width: int) -> DataFrame:
    """P6 resize/augment analog. STUB: requires PIL/cv2."""
    raise NotImplementedError("image resize requires PIL/cv2 (not in this container)")
