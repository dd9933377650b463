"""End-to-end optimizer demo — the reference's flagship path (SURVEY
§3.1) on the GNMT-analog pipeline:

  build -> instrumented profile -> metrics DataFrame -> bottleneck /
  LP / cache queries -> advice -> rewritten plan -> re-benchmark.

Prints the per-operator metrics table, the advice, and measured
before/after rates. Usage: python tools/demo_optimize.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark import get_spark
from plumberapp_spark.metrics.profiler import PipelineProfiler
from plumberapp_spark.optimizer.advisor import Optimizer
from plumberapp_spark.pipelines import gnmt_pipeline


def timed_rate(df) -> tuple[float, float]:
    n = df.count()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return dt, n / max(dt, 1e-9)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 20_000
    spark = get_spark("demo_optimize")

    print(f"== build: GNMT-analog pipeline over {n} sentence pairs")
    pipe = gnmt_pipeline(spark, n=n)

    print("== profile: instrumented run -> per-operator metrics DataFrame")
    model = PipelineProfiler(spark).profile(pipe)
    model.to_df().select(
        "name", "op", "topo_idx", "observed_rate", "p_busy",
        "expected_parallel_max_rate", "expected_dataset_size",
    ).orderBy("topo_idx").show(50, truncate=False)

    opt = Optimizer(spark)
    advice = opt.advise_from_model(pipe, model)
    print(f"== bottleneck: {advice.bottleneck}")
    # calibrate-then-solve (round 8): the measured per-node ceiling sweep
    # replaces the profiler's rate estimates in the LP — pass
    # --calibrate to run it (a few seconds of node benchmarks)
    if "--calibrate" in sys.argv:
        print("== calibrate: per-node ceiling sweep -> measured LP rates")
        advice = opt.advise_calibrated(pipe, take_amount=300, time_limit_s=1.0)
    if advice.lp:
        print(f"== LP: min_rate={advice.lp.min_rate:.1f} binding={advice.lp.binding}")
        for name, theta in sorted(advice.lp.thetas.items()):
            print(f"   theta[{name}] = {theta:.3f}")
    print(f"== cache at: {advice.cache_at}   partitions: {advice.partitions}")
    for note in advice.notes:
        print(f"   note: {note}")

    before_dt, before_rate = timed_rate(pipe.to_df(spark))
    optimized = opt.apply(pipe, advice)
    after_dt, after_rate = timed_rate(optimized.to_df(spark))
    # second pass: the cache advice pays off on re-iteration (the
    # reference's warm-cache steady state, pa/pipeline_optimizer.py:151-192)
    after2_dt, after2_rate = timed_rate(optimized.to_df(spark))
    print(f"== before:        {before_rate:,.0f} rows/s ({before_dt:.2f}s)")
    print(f"== after (cold):  {after_rate:,.0f} rows/s ({after_dt:.2f}s)")
    print(f"== after (warm):  {after2_rate:,.0f} rows/s ({after2_dt:.2f}s)")
    print(f"== schema unchanged: {pipe.schema(spark) == optimized.schema(spark)}")


if __name__ == "__main__":
    main()
