"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst expressions (``zip_with`` + ``aggregate``) — no UDF, no
serialization; at 100 TB the similarity scan is a single narrow projection.
All arithmetic in double so the DuckDB oracle (``list_dot_product`` etc.)
matches bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product. DuckDB: ``list_dot_product(a::DOUBLE[], b::DOUBLE[])``."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))
