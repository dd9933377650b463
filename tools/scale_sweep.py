"""Single-rep scale sweep: run every registered query once at a given
SF directory (default the 100x copy from tools/gen_scaled.py), print one
line per query with wall seconds or FAIL + the exception.

This is the audit that caught the round-3 superlinear outliers (q36's
5-task window, q26's global range sort, q56's pair-materializing LSH
join — see SCALE.md §9): cold single-rep wall time at 100x data makes
anything superlinear stick out by an order of magnitude. Queries whose
exact semantics are inherently explosive on the duplicate-heavy scaled
corpus (q17/q19/q21/q53 pair generators) are skipped by default; pass
--all to include them (expect minutes each, and q19 needs tens of GB of
shuffle spill space).

Usage: python tools/scale_sweep.py [sf_dir] [--all]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark import get_spark
import plumberapp_spark.all_queries  # noqa: F401
from plumberapp_spark.registry import REGISTRY

PAIR_GENERATORS = {
    "q17_minhash_lsh_pairs",
    "q19_ngram_jaccard_top_pairs",
    "q21_embedding_near_dup_pairs",
    "q50_dedup_then_lsh",
    "q53_embedding_pairs_blocked",
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else ".scaled/x100"
    include_all = "--all" in sys.argv
    spark = get_spark("scale_sweep")
    total = 0.0
    for name, qd in REGISTRY.items():
        if not include_all and name in PAIR_GENERATORS:
            print(f"{name} SKIP (pair generator; use --all)", flush=True)
            continue
        try:
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            total += dt
            print(f"{name} {dt:.2f}", flush=True)
        except Exception as exc:  # noqa: BLE001 — audit must finish
            print(f"{name} FAIL {type(exc).__name__}: {str(exc)[:200]}", flush=True)
        finally:
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
    print(f"TOTAL {total:.1f}s over {sf_dir}")


if __name__ == "__main__":
    main()
