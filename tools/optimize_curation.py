"""VERDICT r8 #7: exercise the full §3.1 optimize loop on the curation
pipeline at Zipf scale and record whether CALIBRATED advice changes the
config and the measured wall.

Flow (the reference's flagship path, pa/annotations.py:86-211 →
pa/pipeline_optimizer_wrapper.py:365-459 → convex_solver):

  build curation_pipeline_v2 → baseline wall →
  Optimizer.advise_calibrated (profile for structure + per-node ceiling
  sweep for measured rates → Q2 LP) → apply (parallelism / cache /
  prefetch rewrites) → re-measure wall.

Usage: python -m tools.optimize_curation [SF_DIR] [--sample-rows N]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time


def _wall(df, reps: int = 3) -> tuple[float, list[float]]:
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.count()
        walls.append(round(time.perf_counter() - t0, 3))
    return min(walls), walls


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scaled/zipf10"
    sample_rows = None
    if "--sample-rows" in sys.argv:
        sample_rows = int(sys.argv[sys.argv.index("--sample-rows") + 1])

    from plumberapp_spark import get_spark
    from plumberapp_spark.optimizer.advisor import Optimizer
    from plumberapp_spark.pipelines import curation_pipeline_v2

    spark = get_spark("optimize_curation")

    p = curation_pipeline_v2(spark, sf_dir=sf_dir)
    df0 = p.to_df(spark)
    df0.count()  # warm: codegen + page cache, outside the measurement
    base, base_walls = _wall(df0)

    opt = Optimizer(spark)
    t0 = time.perf_counter()
    advice = opt.advise_calibrated(p, sample_rows=sample_rows)
    calib_s = round(time.perf_counter() - t0, 1)

    p2, cache_kept = opt.apply_validated(p, advice)
    caches: list = []
    df1 = p2.to_df(spark, persisted_out=caches)
    df1.count()  # warm pass fills any advised cache
    tuned, tuned_walls = _wall(df1)
    for c in caches:
        try:
            c.unpersist()
        except Exception:  # noqa: BLE001 — hygiene only
            pass

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "sample_rows": sample_rows,
                "baseline_wall_s": base,
                "baseline_walls": base_walls,
                "calibration_s": calib_s,
                "advice": {
                    "bottleneck": advice.bottleneck,
                    "partitions": advice.partitions,
                    "cache_at": advice.cache_at,
                    "prefetch_at": advice.prefetch_at,
                    "prefetch_buffer": advice.prefetch_buffer,
                    "notes": advice.notes[:4],
                },
                "cache_kept_by_validation": cache_kept,
                "optimized_wall_s": tuned,
                "optimized_walls": tuned_walls,
                "speedup": round(base / max(tuned, 1e-9), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
