"""Driver-facing query registry.

Each entry pairs a PySpark implementation with an equivalent ANSI-SQL
oracle (run by DuckDB on the same parquet tables) — the correctness
gate described in ``__spark_entry__.py``. Keys map to SURVEY.md §2
operator ids.

Cross-engine determinism rules used throughout (see ``_det`` helpers):

- Money/measure sums go through exact ``DECIMAL`` arithmetic and are
  cast to DOUBLE only at the end — double summation order differs
  between engines, exact decimal sums do not.
- Derived floating-point expressions are written with the *same*
  operation order on both sides so IEEE results match bit-for-bit.
- Every ranking has a unique tiebreak column.
- Cross-engine hashing uses md5 (both engines agree on it), never
  engine-native hash functions.
"""

from __future__ import annotations

from .registry import QUERIES, QuerySpec, query  # noqa: F401
from . import core  # noqa: F401,E402  (registers core operator queries)
from . import cdc  # noqa: F401,E402  (SCD2 / incremental / sessionization)
from . import extra  # noqa: F401,E402  (set ops, pivot, JSON, as-of join)
from . import llmdata  # noqa: F401,E402  (dedup/similarity/text extensions)
from . import round5  # noqa: F401,E402  (Q3/Q4/Q6 shapes, graph/ANN/corpus depth)
from . import round5b  # noqa: F401,E402  (fraud screens, time travel, collocations)
from . import round6  # noqa: F401,E402  (TPC-H Q2/Q7/Q8/Q9 planner-stress shapes)
from . import round6b  # noqa: F401,E402  (SemDeDup, BM25 retrieval)
from . import round6c  # noqa: F401,E402  (decontamination, export manifests)
from . import round7  # noqa: F401,E402  (ExactSubstr substring dedup)
from . import round7b  # noqa: F401,E402  (deterministic sketches: bloom/HLL/CMS)
from . import round8  # noqa: F401,E402  (PNG decode, substring rewrite era)
from . import round8b  # noqa: F401,E402  (mu-law, Z-order layout, HLL overlap)
from . import round8c  # noqa: F401,E402  (image resize, KMV distinct sketch)
from . import round9  # noqa: F401,E402  (capped SemDeDup family, paragraph dedup)
from . import round10  # noqa: F401,E402  (capped mutual-kNN, composed pipelines)
from . import round12  # noqa: F401,E402  (coverage curves, balanced sampling)
from . import round13  # noqa: F401,E402  (curation-plan capstone)
from . import round14  # noqa: F401,E402  (drift-aware curation mix + sample)
from . import round15  # noqa: F401,E402  (plan-driven admission feedback)


# The driver's correctness gate executes the FIRST 50 registry entries.
# Round-15 rotation (house rule since r9 judge directive #6): all 50
# CORRECTNESS_r14 strict passes fold into the verified set. The r15
# window = the 2 round-15 registrations (x_curation_admission /
# x_plan_feedback_sim) + the 4 changed-code heads (x_curation_plan /
# x_curation_sample / x_curation_plan_drift / x_curation_sample_drift:
# the zero-weight allocation guard changed both the Spark path and
# every oracle CTE, so all four owe fresh driver proofs) + the 44
# stalest driver proofs: the ENTIRE remaining r10-era cohort (22
# names) and the first 22 r11-era names in staleness-then-alphabetical
# order. After this round no query's only-ever driver proof predates
# r11 except the r11 tail itself.
# a_approx_sketches is PERMANENTLY pinned in this set (r9 judge
# directive #2): it is the registry's sole no-oracle entry (Spark-native
# approx_count_distinct has no DuckDB twin); its real correctness gate
# is the bounded-error pytest twin (tests/test_sketches.py). Keeping it
# out of the window means every driver slot verifies strictly.
# The exactly-50 pin is tested
# (tests/test_properties.py::test_driver_window_is_exactly_fifty).
_DRIVER_VERIFIED = frozenset({
    "a1_having_probe", "a2_table_counts", "a3_high_water_mark",
    "a4_reconciliation", "a4b_reconciliation_decimal", "a5_zscore_anomalies",
    "a6_argmax_latest", "a_approx_sketches", "a_cohort_retention",
    "a_distinct_users", "a_dormant_reactivation", "a_duplicate_payments",
    "a_funnel_stages", "a_percentiles", "a_sliding_distinct",
    "a_structuring_screen", "a_top_paths", "agg_grouping_sets",
    "agg_pivot_event_types", "agg_rollup_region_nation", "asof_last_view_before_purchase",
    "c1_scd2_replay", "c1b_scd2_apply", "c3_incremental_merge",
    "c6_incremental_rollup", "c7_late_events", "c8_asof_snapshot",
    "j1_fact_dim_join", "j2_two_hop_join", "j3_anti_orphans",
    "j5_self_join", "j6_interval_join", "j7_range_band_join",
    "o1_top10_orders", "p1_json_extract", "p_scalar_suite",
    "p_subqueries", "q01_pricing_summary", "q02_min_cost_supplier",
    "q03_shipping_priority", "q04_order_priority", "q05_local_supplier_volume",
    "q06_revenue_forecast", "q07_volume_shipping", "q08_market_share",
    "q09_product_profit", "q10_returned_items", "q11_revenue_concentration",
    "q12_late_shipments", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_variety", "q17_small_quantity_revenue",
    "q18_large_volume_orders", "q19_disjunctive_predicates", "q20_heavy_shippers",
    "q21_suppliers_kept_waiting", "q22_dormant_rich_customers", "s_tumbling_window_agg",
    "set_ops_cohorts", "t_event_type_drift", "t_freshness_skew",
    "t_quality_checks", "w1_dedup_latest", "w_distribution_ranks",
    "w_event_rate_spike", "w_locf_gapfill", "w_running_totals",
    "w_sessionize", "w_topk_per_group", "x_ann_ivf_multiprobe",
    "x_ann_ivf_topk", "x_ann_ivf_trained", "x_ann_ivf_trained_mp",
    "x_ann_ivfpq_topk", "x_ann_pq_adc", "x_ann_recall_eval",
    "x_ann_sq8", "x_ann_sq8_rescore", "x_audio_decode",
    "x_audio_mulaw_stats", "x_bfs_layers", "x_bigram_likelihood",
    "x_bloom_decontaminate", "x_bloom_skip_index", "x_bm25_search",
    "x_bpe_apply", "x_bpe_merges", "x_chunk_documents",
    "x_cluster_balanced_sample", "x_cms_heavy_hitters", "x_containment_pairs",
    "x_contamination", "x_corpus_pipeline_v2", "x_corpus_pipeline_v3",
    "x_coverage_knee_sweep", "x_cross_corpus_dedup", "x_curriculum_order",
    "x_dataset_card", "x_dataset_manifest", "x_dedup_clusters",
    "x_dedup_clusters_star", "x_dedup_keep_best", "x_dedup_source_report",
    "x_domain_mix", "x_embedding_outliers", "x_filter_threshold_sweep",
    "x_fingerprint", "x_gopher_rules", "x_hll_distinct",
    "x_image_decode", "x_kcore", "x_label_propagation",
    "x_lang_id", "x_length_bucket_batching", "x_minhash_calibration",
    "x_minhash_lsh_pairs", "x_minhash_signature", "x_multimodal_features",
    "x_mutual_knn_capped", "x_mutual_knn_clusters", "x_mutual_knn_recall_eval",
    "x_ngram_coverage_curve", "x_ngram_jaccard_pairs", "x_ngram_novelty",
    "x_pack_sequences", "x_paragraph_dedup", "x_paragraph_profile",
    "x_pii_redact", "x_pmi_cooccurrence", "x_pq_codes",
    "x_quality_classifier", "x_quality_score", "x_quality_stratified_trim",
    "x_rank_fusion_rrf", "x_repetition", "x_reservoir_sample",
    "x_semdedup", "x_semdedup_capped", "x_semdedup_diverse",
    "x_semdedup_diverse_capped", "x_semdedup_keep_best", "x_semdedup_keep_best_capped",
    "x_semdedup_recall_eval", "x_semdedup_refined", "x_semdedup_refined_capped",
    "x_simhash", "x_simhash_dedup_pairs", "x_snapshot_diff",
    "x_source_diversity", "x_source_drift", "x_source_novelty",
    "x_source_reputation", "x_span_dedup", "x_split_assign",
    "x_substring_dedup", "x_substring_keep_first", "x_temperature_mix",
    "x_tfidf_cosine_pairs", "x_tfidf_topk_terms", "x_token_stats",
    "x_top_terms", "x_training_data_prep", "x_triangle_count",
    "x_unigram_likelihood", "x_video_framesample", "x_vocab_coverage",
    "x_winnowing", "x_winnowing_matches",
})

_ordered = {n: s for n, s in QUERIES.items() if n not in _DRIVER_VERIFIED}
_ordered.update({n: s for n, s in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)
del _ordered

__all__ = ["QUERIES", "QuerySpec", "query"]
