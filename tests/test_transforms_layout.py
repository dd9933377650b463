"""P7 layout transpose and O12 restructure — the tensor-layout corner of
the operator inventory (SURVEY §2.2 P7, §2.5 O12)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F
from pyspark.sql import types as T

from plumberapp_spark.operators.transforms import transpose_layout, restructure


def test_transpose_matches_numpy_2d(spark):
    df = spark.createDataFrame([([1, 2, 3, 4, 5, 6],)], "a array<int>")
    got = df.select(transpose_layout(F.col("a"), [2, 3], [1, 0]).alias("t")).first()["t"]
    want = [int(x) for x in np.arange(1, 7).reshape(2, 3).T.flatten()]
    assert got == want


def test_transpose_matches_numpy_hwc_to_chw(spark):
    """The ResNet HWC->CHW layout move (imagenet_input.py:122-132)."""
    shape, perm = [4, 5, 3], [2, 0, 1]
    flat = list(range(4 * 5 * 3))
    df = spark.createDataFrame([(flat,)], "a array<int>")
    got = df.select(transpose_layout(F.col("a"), shape, perm).alias("t")).first()["t"]
    want = [int(x) for x in np.array(flat).reshape(shape).transpose(perm).flatten()]
    assert got == want


def test_transpose_is_jvm_side(spark):
    df = spark.createDataFrame([(list(range(6)),)], "a array<int>")
    plan = df.select(transpose_layout(F.col("a"), [2, 3], [1, 0]).alias("t"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_restructure_reorders_and_casts(spark):
    df = spark.createDataFrame([("a", 1)], "x string, y int")
    s = T.StructType([T.StructField("y", T.LongType()), T.StructField("x", T.StringType())])
    out = restructure(df, s)
    assert out.columns == ["y", "x"]
    assert out.schema == s
    assert out.first()["y"] == 1
