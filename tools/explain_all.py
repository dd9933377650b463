"""Dump the formatted physical plan of every registered query to
PLANS.txt (or stdout with --stdout) — the artifact for auditing
pushdown / pruning / join strategies / exchange counts per query.

Usage: python tools/explain_all.py [sf_dir] [--stdout]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark import get_spark
import plumberapp_spark.all_queries  # noqa: F401
from plumberapp_spark.registry import REGISTRY

SKIP = {"q52_streaming_window_counts"}  # streaming plans print differently


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    to_stdout = "--stdout" in sys.argv
    spark = get_spark("explain_all")
    chunks = []
    for name in sorted(REGISTRY):
        if name in SKIP:
            continue
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            plan = f"<error: {e}>"
        chunks.append(f"{'=' * 70}\n{name}\n{'=' * 70}\n{plan}\n")
    text = "\n".join(chunks)
    if to_stdout:
        print(text)
    else:
        out = Path(__file__).resolve().parent.parent / "PLANS.txt"
        out.write_text(text)
        print(f"wrote {out} ({len(chunks)} plans)")


if __name__ == "__main__":
    main()
