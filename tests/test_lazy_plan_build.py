"""VERDICT r4 item 4 (full form): no operator may run Spark jobs while
BUILDING its plan — eagerness must be an explicit, documented contract.

Every registered query is built (not executed) under a job-group
listener with a pre-warmed table cache (first-touch parquet schema
listing is the read layer's cost, not the operator's). Queries that ARE
allowed to run jobs at build time each carry a reason here; anything
new that starts running build-time jobs fails this test and must either
become lazy or join the allowlist with a documented why.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import plumberapp_spark.all_queries  # noqa: F401, E402
from plumberapp_spark.registry import REGISTRY  # noqa: E402
from plumberapp_spark.session import TABLES, load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# name -> why build-time Spark jobs are part of the operator's contract
EAGER_ALLOWED = {
    # vectorized ANN collects the bounded query matrix for broadcast
    # (<=100k enforced contract, similarity.py)
    "q20_embedding_topk": "query-matrix collect (bounded broadcast contract)",
    "q54_ivf_topk": "query-matrix collect (bounded broadcast contract)",
    "q56_lsh_bucketed_topk": "query-matrix collect (bounded broadcast contract)",
    "q72_ann_recall": "exact+IVF+LSH query-matrix collects (same contract)",
    "q74_semantic_dedup": "n_centroids-row centroid collect (IVF contract)",
    # grid pair search sizes its blocking grid from a collected stats row
    "q21_embedding_near_dup_pairs": "grid sizing stats (one tiny agg)",
    "q53_embedding_pairs_blocked": "grid sizing stats (one tiny agg)",
    "q92_crossmodal_candidates": "grid sizing stats (q21 contract, embedding route)",
    # driver-side algorithms over plan-sized collected inputs
    "q49_topo_depth": "collect plan-sized edge list for driver BFS",
    "q63_near_dup_clusters": "iterative min-label propagation (bounded rounds)",
    "q91_cluster_representatives": "iterative min-label propagation (q63 contract)",
    "q47_lp_throughput": "collect plan-sized metrics vector for the LP",
    "q48_min_cost_milp": "collect plan-sized metrics vector for the MILP",
    "q78_lp_bandwidth_bound": "collect plan-sized metrics vector for the LP (q47 contract)",
    # round-6 q77: the vocab_size-row top-k vocabulary ships in the Arrow
    # scorer's closure (same bounded-collect contract as IVF centroids)
    "q77_unigram_logprob": "vocab_size-row vocabulary collect (bounded broadcast contract)",
    # q79 scores via unigram_logprob_score, so it inherits q77's bounded
    # vocabulary collect (plus its route-probe stats lookups)
    "q79_perplexity_buckets": "vocab_size-row vocabulary collect (q77 contract)",
    # Bloom sketch: the eval-set-sized position collect builds the bitset
    # shipped in the Arrow prober's closure (same bounded contract)
    "q81_bloom_decontamination": "position-set collect (bounded eval-set contract)",
    # persisted-IVF: index materialization (build-once, bucketed-tables
    # contract) + centroid/query-matrix collects (IVF contract)
    "q89_ivf_indexed_topk": "index materialization + bounded collects",
    # round-8 persisted-index serving paths: index/LM materialization
    # (build-once warehouse contract) + bounded collects (bucket list /
    # vocab_size-row LM load)
    "q94_tfidf_indexed_search": "index materialization + bucket-list collect",
    "q95_bm25_indexed_search": "index materialization + bucket-list collect",
    "q96_unigram_logprob_indexed": "LM materialization + vocab collect",
    "q97_perplexity_buckets_indexed": "LM materialization + vocab collect",
    # q98's dense route collects the bounded query matrix (ANN contract)
    "q98_hybrid_search": "query-matrix collect (bounded broadcast contract)",
    "q99_hybrid_indexed_search": "index materialization + bounded collects",
    "q100_hybrid_ivf_search": "index materializations + bounded collects",
    # round-9 fail-fast guard: the uncapped inverted-index path probes
    # projected candidate-pair volume (one scalar) before the self-join
    "q19_ngram_jaccard_top_pairs": "candidate-volume probe (fail-fast contract)",
    # round-9 free-text serving: same build-once + bounded-collect shape
    "q101_tfidf_freetext_search": "index materialization + bucket-list collect",
    "q102_bm25_freetext_search": "index materialization + bucket-list collect",
    "q103_hybrid_freetext_search": "index materializations + bounded collects",
    # round-9 maintenance tier: segment/delta materialization (build-once
    # warehouse contract) + bucket-list / scalar collects at serve
    "q104_bm25_incremental_index": "segment materialization + bucket-list collect",
    "q105_bm25_compacted_index": "segment+compaction materialization + bucket-list collect",
    "q106_streaming_index_ingest": "streaming segment ingest (micro-batch) + bucket-list collect",
    "q109_ivf_incremental_append": "index+delta materialization + bounded collects",
    "q111_tfidf_segmented_search": "segment+norms materialization + bucket-list collect",
    "q112_streaming_ivf_ingest": "streaming delta ingest (micro-batch) + bounded collects",
    # round-9 k-means: the fit-once centroid table round-trips the
    # driver (k×dim bounded collect; cached per source mtime)
    "q107_kmeans_cluster_profile": "Lloyd fit collects (k×dim bounded contract)",
    "q108_cluster_balanced_sample": "Lloyd fit collects (q107 contract)",
    # round-10 deletion tier: same build-once materialization shape,
    # plus the tombstone write (a delete IS a materialization)
    "q113_bm25_serve_after_delete": "segment+tombstone materialization + bucket-list collect",
    "q114_bm25_compact_after_delete": "segment+tombstone+compaction materialization + bucket-list collect",
    "q115_tfidf_serve_after_delete": "segment+tombstone+norms materialization + bucket-list collect",
    "q116_ivf_serve_after_delete": "index+delta+tombstone materialization + bounded collects",
    "q117_ivf_compact_after_delete": "index+compaction materialization + bounded collects",
    # round-10 segmented bigram LM: segment materialization only (the
    # serving plan itself is lazy — counts merge inside the plan)
    "q118_bigram_lm_segmented": "LM segment materialization (build-once warehouse contract)",
    "q119_bigram_lm_after_delete": "LM segment + negative-segment materialization",
    # round-11 filtered retrieval: the same index materialization +
    # bounded collects as their unfiltered twins (q95/q89); the filter
    # relation itself stays lazy (semi-join inside the plan)
    "q120_bm25_filtered_search": "segment materialization + bucket-list collect (q95 contract)",
    "q121_ivf_filtered_search": "index materialization + bounded collects (q89 contract)",
    # round-11 segmented unigram LM + rebuild: segment/index
    # materialization (build-once warehouse contract)
    "q122_unigram_lm_segmented": "LM segment materialization (q118 contract)",
    "q123_unigram_lm_after_delete": "LM segment + negative-segment materialization",
    "q124_ivf_rebuild_serve": "index+delta+tombstone+rebuild materialization + bounded collects",
    # round-11 compressed index: same materialization shape + the
    # centroid/scale/query-matrix collects (IVF contract); the stats
    # card probes the corpus dim with one limit-1 row
    "q125_sq_ivf_search": "SQ index materialization + bounded collects",
    "q126_sq_compression_stats": "dim probe (one limit-1 row)",
    "q127_sq_serve_after_delete": "SQ index+delta+tombstone materialization + bounded collects",
    "q128_sq_compact_after_delete": "SQ index+compaction materialization + bounded collects",
    # round-12 phrase retrieval: positional-index materialization
    # (build-once warehouse contract) + the bounded phrase-pair /
    # term-set collects (the bucket-list contract)
    "q129_phrase_search": "positional index materialization + phrase-pair collect",
    "q130_phrase_bm25_search": "positional+lexical index materialization + bounded collects",
    # round-12 PQ tier: same materialization shape + codebook/
    # query-matrix collects (the SQ/IVF contract)
    "q131_pq_ivf_search": "PQ index materialization + bounded collects",
    "q132_pq_compression_stats": "codebook collect + dim probe (q126 contract)",
    "q133_pq_serve_after_delete": "PQ index+delta+tombstone materialization + bounded collects",
    "q134_pq_compact_after_delete": "PQ index+compaction materialization + bounded collects",
    # Structured Streaming queries start and drain their micro-batches
    "q52_streaming_window_counts": "micro-batch execution is the query",
    "q55_stateful_rate_monitor": "micro-batch execution is the query",
    "q57_streaming_exact_dedup": "micro-batch execution is the query",
    "q66_streaming_quality_monitor": "micro-batch execution is the query",
    "q86_streaming_bloom_dedup": "micro-batch execution is the query",
    "q93_streaming_decontamination": "micro-batch execution is the query",
}


@pytest.mark.usefixtures()
def test_plan_build_runs_no_spark_jobs(spark):
    sc = spark.sparkContext
    for t in TABLES:
        load_table(spark, SF_DIR, t)  # exclude first-touch schema listing
    violations = {}
    for name, qd in REGISTRY.items():
        if name in EAGER_ALLOWED:
            continue
        group = f"lazy-guard-{name}"
        sc.setJobGroup(group, "plan build must be lazy")
        try:
            qd.fn(spark, SF_DIR)
        finally:
            sc.setJobGroup(None, None)
        jobs = list(sc.statusTracker().getJobIdsForGroup(group))
        if jobs:
            violations[name] = len(jobs)
    assert not violations, f"operators ran Spark jobs at plan-build time: {violations}"
