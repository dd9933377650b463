"""Ad-hoc per-query timing: spark wall + DuckDB oracle wall at a given
sf dir. Usage: python tools/time_queries.py [--noop] SF_DIR q24_token_stats ...
(repeats each query twice, reports the second/warm run).

``--noop`` consumes the Spark side with bench.py's count-free noop
write instead of collect() — the protocol of record for corpus-sized
outputs, where collect()'s driver transfer tax is a measurement
artifact (the r9 q97 dissection: 2.2x by collect, 1.38x by noop).

``--spark-only`` skips the DuckDB oracle entirely — REQUIRED at beds
where the oracle is a documented DNF (the bigram derivation at Zipf
scale OOMs the machine and can take the Spark JVM with it; see
SCALE.md and GRADED.json's dnf_baseline entries)."""

from __future__ import annotations

import sys
import time

import duckdb

import plumberapp_spark.all_queries  # noqa: F401
from plumberapp_spark.registry import REGISTRY
from tools.check_correctness import TABLES, get_spark


def main() -> None:
    args = sys.argv[1:]
    noop = "--noop" in args
    spark_only = "--spark-only" in args
    args = [a for a in args if a not in ("--noop", "--spark-only")]
    sf_dir = args[0]
    names = args[1:]
    spark = get_spark("time_queries")
    duck = duckdb.connect()
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    for name in names:
        qd = REGISTRY[name]
        try:
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                if noop:
                    qd.fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    n = -1
                else:
                    n = len(qd.fn(spark, sf_dir).collect())
                walls.append(time.perf_counter() - t0)
            best = min(walls[1:])  # exclude the cold first rep
            if qd.oracle and not spark_only:
                dws = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    duck.execute(qd.oracle).fetchall()
                    dws.append(time.perf_counter() - t0)
                dwall = min(dws[1:])
            else:
                dwall = float("nan")
            print(
                f"{name}: spark cold={walls[0]:.3f}s best={best:.3f}s "
                f"duck={dwall:.3f}s ratio={best/dwall if dwall == dwall else float('nan'):.2f} rows={n}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — keep sweeping
            print(f"{name}: FAIL {type(exc).__name__}: {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
