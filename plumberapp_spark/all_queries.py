"""Aggregates every query group into the registry (import side effects),
and exposes the driver-contract accessors.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

import plumberapp_spark.queries  # noqa: F401  (q01-q13: core relational + stream ops)
import plumberapp_spark.queries_llm  # noqa: F401  (q14-q25: dedup/similarity/text/multimodal)

try:  # q26+: metrics model, windows, joins (added incrementally)
    import plumberapp_spark.queries_metrics  # noqa: F401
except ImportError:
    pass

try:  # q37+: optimizer-query shapes, TPC-H analogs, LP/MILP surface
    import plumberapp_spark.queries_analytic  # noqa: F401
except ImportError:
    pass

try:  # q52+: Structured Streaming surface under the driver contract
    import plumberapp_spark.queries_streaming  # noqa: F401
except ImportError:
    pass

from plumberapp_spark.registry import REGISTRY

# The correctness driver evaluates the first 50 registry entries, so order
# matters: every operator's primary evidence query must land inside the cap.
# Round-5 rotation (VERDICT r4 item 2): q55 and q63-q71 — the entire
# round-4 tail, which has NEVER had a driver CORRECTNESS row in any round
# — move inside the cap. Displaced: ten rows that are driver-green in at
# least two prior rounds, all with the strongest external evidence in the
# suite (q01-q05, q08, q11, q12, q14, q16 — VERDICT r4's named set).
# With this rotation the union of CORRECTNESS_r01..r05 covers all 71
# registered queries. Everything in the tail stays registered, benched,
# and oracle-checked by tests/test_queries_oracle.py at sf0.001 every run.
# Round-7 rotation (VERDICT r6 item 1): q78, q86, q93 have never had a
# driver CORRECTNESS row in any round, and q55's round-6 exact oracle has
# never been driver-run (its last driver row, r5, was an err). All four
# are PROMOTED to the front of the registry so they land inside the cap.
# Displaced into the tail: q17, q20, q23, q25 — VERDICT r6's named set,
# each driver-green in at least two prior rounds. With this rotation the
# union of CORRECTNESS_r01..r07 covers all 93 registered queries.
_TAIL = (
    # driver-green r1+r2+r3+r4 (rotated out for the first time):
    "q01_pricing_summary",
    "q02_filter_projection",
    "q03_topk",
    "q04_conditional",
    "q05_vocab_lookup",
    "q08_batch_stats",
    "q11_group_by_window",
    "q12_string_pipeline",
    "q14_exact_dedup",
    "q16_minhash_signature",
    # displaced by q72/q73/q74/q75 (new, round 5 — need their first
    # driver rows); q13, q10, q09, q07 are driver-green in r1, r2, r4:
    "q13_hash_bucket",
    "q10_unbatch_roundtrip",
    "q09_repeat_echo",
    "q07_take_skip_shard",
    "q27_concatenate",
    "q28_choose_from",
    # carried over from the r4 tail (driver-green r1-r3, family siblings
    # in-cap: q15~q14-lineage, q18~q16/q17, q22~q23/q24, q30/q31~q29,
    # q34~q46, q53/q21~q20/q56, q19~q58, q32/q33~q29/q52):
    "q15_fingerprint_clusters",
    "q18_simhash",
    "q22_text_quality",
    "q30_roofline_rollup",
    "q31_span_outliers",
    "q34_deterministic_sample",
    "q53_embedding_pairs_blocked",
    "q19_ngram_jaccard_top_pairs",
    "q21_embedding_near_dup_pairs",
    "q32_convergence_lag",
    "q33_plateau_detection",
    # displaced by the round-7 promotion of q78/q86/q93/q55 (driver-green
    # in >=2 rounds: q17 r2/r6, q20 r2/r6, q23 r3/r6, q25 r4/r6):
    "q17_minhash_lsh_pairs",
    "q20_embedding_topk",
    "q23_language_id",
    "q25_multimodal_features",
)
for _name in _TAIL:
    if _name in REGISTRY:
        REGISTRY[_name] = REGISTRY.pop(_name)

# Round-8 note: the new queries (q94-q97 persisted-index serving,
# q98-q100 hybrid retrieval) register at the natural end of
# queries_llm.py and land INSIDE the first-50 cap (positions 41-47),
# displacing q35-q41 — each driver-green in four rounds (r4-r7). No
# explicit rotation needed this round; the r1-r8 union keeps covering
# every registered query.
# Promote the never-driver-checked four to the front of the registry so
# they sit inside the driver's first-50 CORRECTNESS cap (VERDICT r6 #1).
_PROMOTE = (
    "q78_lp_bandwidth_bound",
    "q55_stateful_rate_monitor",
    "q86_streaming_bloom_dedup",
    "q93_streaming_decontamination",
)
for _name in [n for n in list(REGISTRY) if n not in _PROMOTE]:
    REGISTRY[_name] = REGISTRY.pop(_name)

# Round-9 rotation (VERDICT r8 item 2): swing the sf0.01 driver window
# back to the registry's first half — the 42 queries whose most recent
# driver CORRECTNESS row is r3/r4/r5 (computed from the
# CORRECTNESS_r01..r08 union) — plus the three NEW round-9 free-text
# serving queries plus the round-9 maintenance/curation families
# (q101-q110, never driver-checked: free-text serving, the segmented
# incremental index trio, k-means curation pair, IVF append, bigram
# LM, segmented tf-idf, streaming IVF ingest). 51 promotions: the 50
# window takes registry positions 0-49, so q33 (r4-green, with its
# family sibling q32 still in-window) sits at position 50 and waits
# for r10 — new queries' FIRST driver rows take precedence over a
# re-check. Displaced into the tail: the r7/r8-green rows, every one
# driver-green within the last two rounds.
_PROMOTE_R9 = (
    # new this round — first driver rows needed:
    "q101_tfidf_freetext_search",
    "q102_bm25_freetext_search",
    "q103_hybrid_freetext_search",
    "q104_bm25_incremental_index",
    "q105_bm25_compacted_index",
    "q106_streaming_index_ingest",
    "q107_kmeans_cluster_profile",
    "q108_cluster_balanced_sample",
    "q109_ivf_incremental_append",
    "q110_bigram_logprob",
    "q111_tfidf_segmented_search",
    "q112_streaming_ivf_ingest",
    # last driver-checked r3:
    "q15_fingerprint_clusters",
    "q18_simhash",
    "q19_ngram_jaccard_top_pairs",
    "q21_embedding_near_dup_pairs",
    "q22_text_quality",
    "q30_roofline_rollup",
    "q31_span_outliers",
    "q32_convergence_lag",
    "q33_plateau_detection",
    "q34_deterministic_sample",
    "q53_embedding_pairs_blocked",
    # last driver-checked r4:
    "q01_pricing_summary",
    "q02_filter_projection",
    "q03_topk",
    "q04_conditional",
    "q05_vocab_lookup",
    "q07_take_skip_shard",
    "q08_batch_stats",
    "q09_repeat_echo",
    "q10_unbatch_roundtrip",
    "q11_group_by_window",
    "q12_string_pipeline",
    "q13_hash_bucket",
    "q14_exact_dedup",
    "q16_minhash_signature",
    "q27_concatenate",
    "q28_choose_from",
    # last driver-checked r5:
    "q42_large_volume_orders",
    "q43_disk_bound",
    "q44_prefetch_gap",
    "q45_file_size_agg",
    "q46_skew_salted_agg",
    "q47_lp_throughput",
    "q48_min_cost_milp",
    "q49_topo_depth",
    "q51_sql_interface",
    "q52_streaming_window_counts",
    "q57_streaming_exact_dedup",
    "q66_streaming_quality_monitor",
)
for _name in [n for n in list(REGISTRY) if n not in _PROMOTE_R9]:
    REGISTRY[_name] = REGISTRY.pop(_name)

# Round-10 rotation (VERDICT r9 #5): the window is exactly the 50
# STALEST queries by last-driver-green round, computed from the
# CORRECTNESS_r01..r09 union — the 7 NEW round-10 queries (deletion
# tier q113-q117 and q119, segmented bigram LM q118; never
# driver-checked),
# then q33 (r4), the r6 four (q17/q20/q23/q25), the r7 band
# (q35-q41), and 32 of the r8-green set (name-order tie-break:
# q06/q100/q24/q26/q29/q50/q54-q56/q58-q65/q67-q81). Displaced into
# the tail: everything green in r9 plus the most recent half of the
# r8 set (q82-q99) — every one driver-green within the last two
# rounds. With this rotation the r1-r10 union again covers all 118
# registered queries with no row older than two rounds except none.
_PROMOTE_R10 = (
    # new this round — first driver rows needed:
    "q113_bm25_serve_after_delete",
    "q119_bigram_lm_after_delete",
    "q114_bm25_compact_after_delete",
    "q115_tfidf_serve_after_delete",
    "q116_ivf_serve_after_delete",
    "q117_ivf_compact_after_delete",
    "q118_bigram_lm_segmented",
    # last driver-checked r4 (missed the r9 window at position 50):
    "q33_plateau_detection",
    # last driver-checked r6:
    "q17_minhash_lsh_pairs",
    "q20_embedding_topk",
    "q23_language_id",
    "q25_multimodal_features",
    # last driver-checked r7:
    "q35_revenue_by_nation",
    "q36_order_priority_window",
    "q37_cache_placement",
    "q38_padded_batch",
    "q39_shipping_priority",
    "q40_forecast_revenue",
    "q41_returned_items",
    # last driver-checked r8 (stalest 32 by name-order tie-break):
    "q06_zip_by_index",
    "q100_hybrid_ivf_search",
    "q24_token_stats",
    "q26_shuffle_multiset",
    "q29_bottleneck_node",
    "q50_dedup_then_lsh",
    "q54_ivf_topk",
    "q55_stateful_rate_monitor",
    "q56_lsh_bucketed_topk",
    "q58_ngram_jaccard_capped",
    "q59_simhash_hamming_pairs",
    "q60_repetition_stats",
    "q61_stratified_sample",
    "q62_quality_filter",
    "q63_near_dup_clusters",
    "q64_top_ngrams",
    "q65_token_budget_packing",
    "q67_decontamination",
    "q68_incremental_dedup",
    "q69_document_chunking",
    "q70_quota_sample",
    "q71_hash_split",
    "q72_ann_recall",
    "q73_lsh_multiprobe",
    "q74_semantic_dedup",
    "q75_pii_redaction",
    "q76_line_dedup",
    "q77_unigram_logprob",
    "q78_lp_bandwidth_bound",
    "q79_perplexity_buckets",
    "q80_tfidf_search",
    # (q81 displaced by q119, the 7th new round-10 registration —
    # r8-green, the least-stale of the r8 band's name-order slice)
)
for _name in [n for n in list(REGISTRY) if n not in _PROMOTE_R10]:
    REGISTRY[_name] = REGISTRY.pop(_name)

# Round-11 rotation (VERDICT r10 #3 + the standing policy): the window
# is exactly the 50 STALEST queries by last-driver-green round from the
# CORRECTNESS_r01..r10 union — the 5 NEW round-11 registrations
# (filtered retrieval q120/q121, segmented unigram LM q122/q123, IVF
# rebuild q124; never driver-checked, staleness 0), then the ENTIRE
# r8-green band VERDICT r10 flagged as stalest (q81-q93 + q94-q99, 19
# queries), then the stalest 26 of the r9-green set by name-order
# tie-break (q01-q15 plus the q10x serving family). Displaced into the
# tail: the rest of the r9 set and everything r10-green — nothing in
# the registry is now older than two rounds. With this rotation the
# r1-r11 union covers all 124 registered queries.
_PROMOTE_R11 = (
    # new this round — first driver rows needed (q125-q128, the
    # compressed-index tier, displace q12-q15 — the least-stale of the
    # r9 name-order slice, all driver-green in 3+ prior rounds):
    "q125_sq_ivf_search",
    "q126_sq_compression_stats",
    "q127_sq_serve_after_delete",
    "q128_sq_compact_after_delete",
    "q120_bm25_filtered_search",
    "q121_ivf_filtered_search",
    "q122_unigram_lm_segmented",
    "q123_unigram_lm_after_delete",
    "q124_ivf_rebuild_serve",
    # last driver-checked r8 (the full stale band):
    "q81_bloom_decontamination",
    "q82_domain_mixture",
    "q83_bm25_search",
    "q84_duplicate_spans",
    "q85_dsir_selection",
    "q86_streaming_bloom_dedup",
    "q87_remove_duplicate_spans",
    "q88_incremental_fuzzy_dedup",
    "q89_ivf_indexed_topk",
    "q90_corpus_report",
    "q91_cluster_representatives",
    "q92_crossmodal_candidates",
    "q93_streaming_decontamination",
    "q94_tfidf_indexed_search",
    "q95_bm25_indexed_search",
    "q96_unigram_logprob_indexed",
    "q97_perplexity_buckets_indexed",
    "q98_hybrid_search",
    "q99_hybrid_indexed_search",
    # last driver-checked r9 (stalest 26 by name-order tie-break):
    "q01_pricing_summary",
    "q02_filter_projection",
    "q03_topk",
    "q04_conditional",
    "q05_vocab_lookup",
    "q07_take_skip_shard",
    "q08_batch_stats",
    "q09_repeat_echo",
    "q101_tfidf_freetext_search",
    "q102_bm25_freetext_search",
    "q103_hybrid_freetext_search",
    "q104_bm25_incremental_index",
    "q105_bm25_compacted_index",
    "q106_streaming_index_ingest",
    "q107_kmeans_cluster_profile",
    "q108_cluster_balanced_sample",
    "q109_ivf_incremental_append",
    "q10_unbatch_roundtrip",
    "q110_bigram_logprob",
    "q111_tfidf_segmented_search",
    "q112_streaming_ivf_ingest",
    "q11_group_by_window",
)
for _name in [n for n in list(REGISTRY) if n not in _PROMOTE_R11]:
    REGISTRY[_name] = REGISTRY.pop(_name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
