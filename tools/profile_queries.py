"""Per-query wall-time dissection (guide §1: measure first).

Splits one warm run of each named query into:
  * build_s  — REGISTRY[name].fn(): Python plan construction, ensure_*
               fixture checks, spark.read.parquet footer resolutions,
               and any driver-side .collect()/.first() the builder runs;
  * action_s — the noop write of the returned frame;
and counts Spark jobs launched in each phase (statusTracker), which is
the scheduling-floor signal: a 2.5 s serve that launches 14 jobs is
paying ~0.15 s/job of fixed cost, not compute.

Usage: python tools/profile_queries.py q113_bm25_serve_after_delete ...
       (no args = the 20 slowest from BENCH_local.json)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark import get_spark  # noqa: E402
import plumberapp_spark.all_queries  # noqa: F401
from plumberapp_spark.registry import REGISTRY  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        bench = json.load(open(Path(__file__).resolve().parent.parent / "BENCH_local.json"))
        names = [
            k
            for k, v in sorted(
                bench["queries"].items(), key=lambda kv: -(kv[1] or 0)
            )
        ][:20]
    spark = get_spark("profile")
    st = spark.sparkContext.statusTracker()
    # warm the session + fixtures once, unprofiled
    for name in names:
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: warmup failed: {exc}", file=sys.stderr)
    spark.catalog.clearCache()
    print(f"{'query':42s} {'build_s':>8s} {'act_s':>8s} {'total':>8s} {'jobs_b':>6s} {'jobs_a':>6s}")
    rows = []
    for name in names:
        j0 = len(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: fn failed: {exc}", file=sys.stderr)
            continue
        t1 = time.perf_counter()
        j1 = len(st.getJobIdsForGroup(None) or [])
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j2 = len(st.getJobIdsForGroup(None) or [])
        spark.catalog.clearCache()
        rows.append((name, t1 - t0, t2 - t1, t2 - t0, j1 - j0, j2 - j1))
        print(
            f"{name:42s} {t1 - t0:8.3f} {t2 - t1:8.3f} {t2 - t0:8.3f} "
            f"{j1 - j0:6d} {j2 - j1:6d}"
        )
    tb = sum(r[1] for r in rows)
    ta = sum(r[2] for r in rows)
    print(f"{'TOTAL':42s} {tb:8.3f} {ta:8.3f} {tb + ta:8.3f}")


if __name__ == "__main__":
    main()
