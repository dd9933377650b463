"""Generate a large deterministic embeddings bed for dense-family
scale measurements (SCALE.md §13's ``emb500k``).

The driver testdata's embeddings table tops out at 50k rows, where
multi-job dense queries (k-means, IVF append) measure Spark's
scheduling floor against sub-0.2 s DuckDB oracles. This tool writes an
``embeddings.parquet`` with the SAME schema (vec_id, embedding
float[], label int) at any row count: 32 Gaussian topic centers +
sigma=0.35 noise (seed 709), so cells/clusters are realistic rather
than uniform, and regeneration is bit-for-bit reproducible. Other
tables are copied from the source dir so the full harness can point at
the output.

Usage: python tools/gen_embeddings.py [n_rows] [dim] [out_dir] [src_sf_dir]
Defaults: 500000 rows, 64 dims, .scaled/emb500k, /root/testdata/sf0.01.
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

SEED = 709
N_CENTERS = 32
NOISE = 0.35


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = sys.argv[3] if len(sys.argv) > 3 else str(
        Path(__file__).resolve().parent.parent / ".scaled" / "emb500k"
    )
    src = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"

    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    centers = rng.normal(0, 1, (N_CENTERS, dim)).astype(np.float32)
    writer = None
    for lo in range(0, n_rows, 100_000):
        n = min(100_000, n_rows - lo)
        topics = rng.integers(0, N_CENTERS, n)
        vecs = centers[topics] + rng.normal(0, NOISE, (n, dim)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(lo, lo + n, dtype=np.int64)),
                "embedding": pa.array(
                    list(vecs.astype(np.float32)), type=pa.list_(pa.float32())
                ),
                "label": pa.array(topics.astype(np.int32)),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(f"{out}/embeddings.parquet", tbl.schema)
        writer.write_table(tbl)
    writer.close()
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            s = f"{src}/{t}.parquet"
            if os.path.isdir(s):
                shutil.copytree(s, dst)
            else:
                shutil.copy(s, dst)
    mb = os.path.getsize(f"{out}/embeddings.parquet") // 2**20
    print(f"done -> {out} ({n_rows} x {dim}, {mb} MB)")


if __name__ == "__main__":
    main()
