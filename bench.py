"""Benchmark harness — runs EVERY registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries", "sf", ...}.

Protocol mirrors the reference's benchmark sink (pa/gen_util.py:253-506):
each query is consumed by a count-free noop write action, timed
wall-clock; a warmup action first absorbs JVM/session startup so rates
reflect steady state (the reference's warm-cache measurement mode).

The commensurable baseline (VERDICT r1 item 7): the same oracle SQL every
query is hash-checked against is also TIMED on DuckDB over the same
parquet, same machine — "duckdb_sec" per query plus "vs_duckdb" ratios
(spark_warm / duckdb_warm; < 1 means Spark is faster). DuckDB runs the
whole query single-process with all cores; it is a strong single-node
columnar baseline, which is exactly what BASELINE.md's 2x gate needs.
Set SPARK_GRAFT_BENCH_DUCKDB=0 to skip the baseline pass.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from plumberapp_spark import get_spark  # noqa: E402
import plumberapp_spark.all_queries  # noqa: F401
from plumberapp_spark.registry import REGISTRY  # noqa: E402
from plumberapp_spark.session import TABLES  # noqa: E402

# Primary input table per query — the denominator for rows/sec rates
# (the reference reports elements/sec over the source stream,
# pa/gen_util.py:470-488).
PRIMARY_INPUT = {
    "q01_pricing_summary": "lineitem",
    "q02_filter_projection": "orders",
    "q03_topk": "events",
    "q04_conditional": "events",
    "q05_vocab_lookup": "documents",
    "q06_zip_by_index": "events",
    "q07_take_skip_shard": "events",
    "q08_batch_stats": "events",
    "q09_repeat_echo": "events",
    "q10_unbatch_roundtrip": "events",
    "q11_group_by_window": "documents",
    "q12_string_pipeline": "documents",
    "q13_hash_bucket": "documents",
    "q14_exact_dedup": "documents",
    "q15_fingerprint_clusters": "documents",
    "q16_minhash_signature": "documents",
    "q17_minhash_lsh_pairs": "documents",
    "q18_simhash": "documents",
    "q19_ngram_jaccard_top_pairs": "documents",
    "q20_embedding_topk": "embeddings",
    "q21_embedding_near_dup_pairs": "embeddings",
    "q22_text_quality": "documents",
    "q23_language_id": "documents",
    "q24_token_stats": "documents",
    "q25_multimodal_features": "documents",
    "q26_shuffle_multiset": "events",
    "q27_concatenate": "events",
    "q28_choose_from": "events",
    "q29_bottleneck_node": "events",
    "q30_roofline_rollup": "events",
    "q31_span_outliers": "events",
    "q32_convergence_lag": "events",
    "q33_plateau_detection": "events",
    "q34_deterministic_sample": "events",
    "q35_revenue_by_nation": "lineitem",
    "q36_order_priority_window": "orders",
    "q37_cache_placement": "events",
    "q38_padded_batch": "documents",
    "q39_shipping_priority": "lineitem",
    "q40_forecast_revenue": "lineitem",
    "q41_returned_items": "lineitem",
    "q42_large_volume_orders": "lineitem",
    "q43_disk_bound": "events",
    "q44_prefetch_gap": "events",
    "q45_file_size_agg": "documents",
    "q46_skew_salted_agg": "events",
    "q47_lp_throughput": "events",
    "q48_min_cost_milp": "events",
    "q49_topo_depth": "documents",
    "q50_dedup_then_lsh": "documents",
    "q51_sql_interface": "customer",
    "q52_streaming_window_counts": "events",
    "q53_embedding_pairs_blocked": "embeddings",
    "q54_ivf_topk": "embeddings",
    "q55_stateful_rate_monitor": "events",
    "q56_lsh_bucketed_topk": "embeddings",
}

RATE_TABLES = ("lineitem", "orders", "events", "documents", "embeddings", "customer")


def run_query(spark, name: str, sf_dir: str) -> float:
    df = REGISTRY[name].fn(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    # Bench hygiene: a 56-query session accumulates cached blocks from any
    # query that persists internally; a leaked cache measured 3.3x
    # slowdowns on later queries in round 1. Clearing is post-measurement,
    # so it never hides a query's own first-run cost.
    spark.catalog.clearCache()
    return dt


def duckdb_baseline(sf_dir: str, names: list[str]) -> dict[str, float]:
    """Warm best-of-2 DuckDB wall time per oracle — same SQL the query is
    hash-checked against, same parquet, all cores."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata are single files; tools/gen_scaled.py output are
        # Spark parquet directories — glob those for DuckDB
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"read_parquet('{p}')"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    out: dict[str, float] = {}
    for name in names:
        sql = REGISTRY[name].oracle
        if sql is None:
            continue
        try:
            con.execute(sql).fetchall()  # cold / page-cache pass
        except Exception:
            # scaled copies regenerate some columns with different types
            # (e.g. events.ts TIMESTAMP(NANOS) -> BIGINT); skip the oracle
            # rather than kill the whole baseline pass
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("plumberapp_spark_bench")

    # Warmup: absorb session/JIT startup (not part of the measurement),
    # and capture source-table cardinalities for the rate report.
    input_rows = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet").count() for t in RATE_TABLES
    }

    # Reference protocol (pa/gen_util.py:253-506): measure steady state.
    # Pass 1 (cold) pays codegen/JIT + page-cache warming and is recorded;
    # the headline is the BEST of two warm passes — the reference's
    # post-convergence rate window keeps the converged (not the noisiest)
    # rate, and single warm runs here show GC-bound outliers.
    names = list(REGISTRY)
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    rates: dict[str, float] = {}
    for name in names:
        cold[name] = round(run_query(spark, name, sf_dir), 3)
    for name in names:
        dt = min(run_query(spark, name, sf_dir) for _ in range(2))
        timings[name] = round(dt, 3)
        src = PRIMARY_INPUT.get(name)
        if src:
            rates[name] = round(input_rows[src] / max(dt, 1e-9))
    total = round(sum(timings.values()), 3)

    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "rows_per_sec": rates,
        "cold_sec": cold,
        "input_rows": input_rows,
    }

    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") != "0":
        duck = duckdb_baseline(sf_dir, names)
        result["duckdb_sec"] = duck
        result["vs_duckdb"] = {
            n: round(timings[n] / max(duck[n], 1e-9), 2) for n in duck if n in timings
        }
        covered = [n for n in names if n in duck]
        g = [result["vs_duckdb"][n] for n in covered]
        result["vs_duckdb_geomean"] = round(
            float(__import__("math").exp(sum(__import__("math").log(x) for x in g) / len(g))), 3
        ) if g else None

    print(json.dumps(result))


if __name__ == "__main__":
    main()
