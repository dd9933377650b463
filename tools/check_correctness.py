"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (rows sorted, columns sorted by name,
values canonicalized). Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark import get_spark  # noqa: E402
from plumberapp_spark.session import TABLES  # noqa: E402
import plumberapp_spark.all_queries  # noqa: F401
from plumberapp_spark.registry import REGISTRY  # noqa: E402

SF_DIR_DEFAULT = "/root/testdata/sf0.01"


def canon(v) -> str:
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256("\x1e".join(canon_rows).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else SF_DIR_DEFAULT
    wanted = [a for a in args if "/" not in a] or list(REGISTRY)

    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata are single files; tools/gen_scaled.py output are
        # Spark parquet directories — glob those for DuckDB
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    spark = get_spark("check_correctness")
    failures = 0
    for name in wanted:
        qd = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if qd.oracle is None:
            print(f"ok?   {name}: rows={len(srows)} (no oracle — rows-only check) [{spark_s:.1f}s]")
            continue
        try:
            rel = con.sql(qd.oracle)
            ocols = list(rel.columns)
            # r1 lesson (q45): the driver converts DuckDB results through
            # pandas, where HUGEINT becomes float64 and hashes differently
            # from Spark's bigint even when every value is equal. fetchall()
            # hides that (HUGEINT -> python int), so flag the type here.
            wide = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()
            ]
            if wide:
                print(f"WARN  {name}: oracle emits HUGEINT columns {wide} — "
                      "CAST(... AS BIGINT) or the driver's pandas hash will mismatch")
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sh, sn = frame_digest(scols, srows)
        oh, on = frame_digest(ocols, orows)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns differ spark={sorted(scols)} duck={sorted(ocols)}")
            failures += 1
        elif sn != on:
            print(f"FAIL  {name}: rows spark={sn} duck={on}")
            failures += 1
        elif sh != oh:
            print(f"FAIL  {name}: value hash differs ({sn} rows)")
            sset = {tuple(map(canon, r)) for r in srows}
            oset = {tuple(map(canon, r)) for r in orows}
            only_s = list(sset - oset)[:3]
            only_o = list(oset - sset)[:3]
            print(f"      spark-only: {only_s}\n      duck-only: {only_o}")
            failures += 1
        else:
            print(f"PASS  {name}: rows={sn} hash={sh} [{spark_s:.1f}s]")
    print(f"\n{len(wanted) - failures}/{len(wanted)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
