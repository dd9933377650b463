"""Generate an N-fold scaled copy of a testdata SF directory (default
10x sf0.1 ≈ sf1) under .scaled/ for local scaling experiments.

Keys are remapped per copy (offset by copy_idx * 10^9) so join/group
cardinalities scale linearly like a real bigger dataset would — a naive
row duplication would square the join outputs instead. Dimension tables
(region/nation/part/supplier) keep their size: that is exactly how a
star schema grows, and it is what keeps the dim joins broadcast-able at
any scale. Document texts are NOT remapped, so the dedup operators see a
realistic 10x duplicate corpus.

Usage: python tools/gen_scaled.py [factor] [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from plumberapp_spark import get_spark

OFF = 1_000_000_000

# fact tables: per-copy key offsets; dims are copied once, unchanged
REMAP = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "part", "supplier"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else str(
        Path(__file__).resolve().parent.parent / ".scaled" / f"x{factor}"
    )
    spark = get_spark("gen_scaled")
    for name in DIMS:
        spark.read.parquet(f"{src}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: copied")
    for name, keys in REMAP.items():
        base = spark.read.parquet(f"{src}/{name}.parquet")
        copies = None
        for i in range(factor):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFF))
            copies = c if copies is None else copies.unionAll(c)
        copies.repartition(8).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{factor}")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
