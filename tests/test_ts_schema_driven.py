"""Schema-driven timestamp normalization (session.ts_as_timestamp /
events_with_timestamp): the engine derives ts handling from the actual
df.schema — the r2->r3 lesson, where the driver testdata silently moved
from TIMESTAMP(NANOS) (read as epoch-long) to TIMESTAMP(MICROS) (read
as TIMESTAMP_NTZ) and a hard-coded `ts div 1000` crashed the streaming
query. Both physical representations must normalize to the same
timestamps."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark.session import events_with_timestamp, ts_as_timestamp  # noqa: E402
from tests.conftest import SF_DIR


def test_nanos_long_and_native_timestamp_agree(spark):
    micros = 1_767_225_600_123_456  # 2026-01-01 00:00:00.123456 UTC
    as_long = spark.createDataFrame([(micros * 1000,)], "ts long")
    as_ts = spark.createDataFrame([(micros,)], "x long").select(
        F.timestamp_micros("x").alias("ts")
    )
    out_long = as_long.select(
        ts_as_timestamp(as_long.schema["ts"].dataType, "ts").alias("t")
    ).first()["t"]
    out_ts = as_ts.select(
        ts_as_timestamp(as_ts.schema["ts"].dataType, "ts").alias("t")
    ).first()["t"]
    assert out_long == out_ts


def test_ntz_passthrough(spark):
    df = spark.createDataFrame([("2026-01-01 10:00:00",)], "s string").select(
        F.to_timestamp_ntz("s").alias("ts")
    )
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    out = df.select(ts_as_timestamp(df.schema["ts"].dataType, "ts").alias("t"))
    assert isinstance(out.schema["t"].dataType, T.TimestampNTZType)
    assert out.first()["t"] == df.first()["ts"]


def test_unsupported_dtype_raises():
    with pytest.raises(TypeError, match="unsupported ts dtype"):
        ts_as_timestamp(T.StringType(), "ts")


def test_integral_conversion_requires_column_name():
    with pytest.raises(TypeError, match="column name"):
        ts_as_timestamp(T.LongType(), F.col("ts"))


def test_events_with_timestamp_on_driver_testdata(spark):
    ev = events_with_timestamp(spark, SF_DIR)
    dtype = ev.schema["ts"].dataType
    assert isinstance(dtype, (T.TimestampType, T.TimestampNTZType))
    r = ev.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert r["lo"] is not None and r["lo"] <= r["hi"]
