"""Portable deterministic hashing.

All hashes are md5-derived so the DuckDB oracle computes bit-identical
values (Spark's ``hash``/``xxhash64`` are Spark-specific; md5 is the one
cross-engine hash both engines expose). md5 is plenty at 100 TB — it's
computed JVM-side per row, no shuffle, and collision probability at 56 bits
over 1e12 rows is handled by bucketing semantics (buckets, not identity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 14 hex chars = 56 bits — fits signed int64 with headroom (conv() returns a
# decimal string; 16 chars could exceed Long.MAX and overflow to null).
_HEX_CHARS = 14


def md5_long(col: Column, seed: int | None = None) -> Column:
    """First 56 bits of md5 as a non-negative bigint.

    DuckDB oracle: ``('0x' || substr(md5(x), 1, 14))::BIGINT``
    (seeded: ``md5(concat('s<seed>:', x))``).
    """
    keyed = F.concat(F.lit(f"s{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(keyed), 1, _HEX_CHARS), 16, 10).cast("bigint")


def stable_bucket(col: Column, num_buckets: int, seed: int | None = None) -> Column:
    """Deterministic bucket id in ``[0, num_buckets)`` — used for LSH
    banding, shard assignment and salting.
    """
    return (md5_long(col, seed) % num_buckets).cast("bigint")


def minhash_value(shingles: Column, seed: int) -> Column:
    """MinHash for one permutation: min over the shingle array of the seeded
    56-bit hash. ``array_min(transform(shingles, s -> h(seed, s)))`` —
    fully JVM-side; a signature of k permutations is k such columns computed
    in ONE pass over the shingles (no shuffle at all until the LSH band
    group-by).

    DuckDB oracle: ``list_min(list_transform(shingles, s ->
    ('0x' || substr(md5(concat('s<seed>:', s)), 1, 14))::BIGINT))``.
    """
    return F.array_min(
        F.transform(
            shingles,
            lambda s: F.conv(F.substring(F.md5(F.concat(F.lit(f"s{seed}:"), s)), 1, _HEX_CHARS), 16, 10).cast(
                "bigint"
            ),
        )
    )
