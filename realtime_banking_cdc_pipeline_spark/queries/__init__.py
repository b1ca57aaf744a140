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


# The driver's correctness gate executes the FIRST 50 registry entries.
# Round-9 rotation (judge directive #6): all 50 CORRECTNESS_r08 keys
# fold into the verified set; the window is then exactly
#   4 new round-9 queries (x_semdedup_diverse_capped,
#     x_semdedup_keep_best_capped, x_semdedup_refined_capped,
#     x_paragraph_dedup)
# + 1 changed query re-proof (x_semdedup_refined — its assignment was
#     extracted into _refined_cells for the capped variant; results
#     verified unchanged locally, but changed code loses its pass)
# + 44 r07-era re-proofs (every CORRECTNESS_r07 key not already
#     re-proved inside the r08 window)
# + agg_grouping_sets (r06-driver-verified once; fills the 50th slot).
# Late-round registrations swap zero-sum against the re-proof cohort
# (new-first wins the slot, house rule): x_bloom_skip_index entered
# and x_embedding_centroids — r07-driver-verified, unmodified, strict
# in every full sweep since — returned to the verified set; same swap
# for x_mutual_knn_clusters (x_langid_eval returned) and
# x_paragraph_profile (x_heldout_likelihood returned).
# The exactly-50 pin is tested
# (tests/test_properties.py::test_driver_window_is_exactly_fifty).
# NOTE: a_approx_sketches (in this window) is rows-only BY DESIGN (no
# oracle_sql entry — bounded-error sketch with a pytest twin); it is
# the reason full sweeps report 195 hash + 1 rows-only = 196.
_DRIVER_VERIFIED = frozenset({
    "a_benford", "a_cohort_retention", "a_dormant_reactivation",
    "a_duplicate_payments", "a_event_transitions", "a_funnel_stages",
    "a_mad_anomalies", "a_mode_per_group", "a_pareto_share",
    "a_rfm_segments", "a_sliding_distinct", "a_structuring_screen",
    "a_time_weighted_balance", "a_top_paths", "a_value_histogram",
    "agg_cube_status_priority", "agg_unpivot_metrics", "c7_late_events",
    "c8_asof_snapshot", "j7_range_band_join", "o1b_trailing_window_top",
    "q02_min_cost_supplier", "q03_shipping_priority", "q04_order_priority",
    "q05_local_supplier_volume", "q06_revenue_forecast", "q07_volume_shipping",
    "q08_market_share", "q09_product_profit", "q10_returned_items",
    "q11_revenue_concentration", "q12_late_shipments", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_variety",
    "q17_small_quantity_revenue", "q18_large_volume_orders", "q19_disjunctive_predicates",
    "q20_heavy_shippers", "q21_suppliers_kept_waiting", "q22_dormant_rich_customers",
    "t_event_type_drift", "t_freshness_skew", "t_profile_table",
    "w_distribution_ranks", "w_event_rate_spike", "w_gap_islands",
    "w_locf_gapfill", "w_range_frame", "w_rolling_median",
    "x_ann_cosine_topk", "x_ann_ivf_multiprobe", "x_ann_ivf_topk",
    "x_ann_ivf_trained", "x_ann_ivf_trained_mp", "x_ann_ivfpq_topk",
    "x_ann_lsh_buckets", "x_ann_lsh_cosine_pairs", "x_ann_pq_adc",
    "x_ann_recall_eval", "x_ann_sq8", "x_ann_sq8_rescore",
    "x_audio_decode", "x_audio_mulaw_stats", "x_bfs_layers",
    "x_bigram_likelihood", "x_bm25_search", "x_bpe_apply",
    "x_bpe_merges", "x_chunk_documents", "x_clean_normalize",
    "x_cms_calibration", "x_cms_heavy_hitters", "x_containment_pairs",
    "x_contamination", "x_corpus_pipeline_v2", "x_cross_corpus_dedup",
    "x_curriculum_order", "x_dataset_manifest", "x_ddsketch_quantiles",
    "x_dedup_clusters", "x_dedup_clusters_star", "x_dedup_exact",
    "x_dedup_keep_best", "x_domain_mix", "x_embedding_centroids",
    "x_embedding_outliers",
    "x_feature_hash_embed", "x_filter_threshold_sweep", "x_fingerprint",
    "x_fuzzy_pairs", "x_hll_overlap", "x_image_decode",
    "x_image_gif_stats", "x_image_png_stats", "x_image_resize",
    "x_importance_sample", "x_kcore", "x_kmv_distinct",
    "x_kmv_jaccard", "x_knn_classify", "x_label_centroids",
    "x_langid_eval", "x_heldout_likelihood",
    "x_lang_id", "x_length_bucket_batching", "x_length_trim",
    "x_lsh_dedup_eval", "x_minhash_lsh_pairs", "x_minhash_signature",
    "x_multimodal_features", "x_ngram_counts", "x_ngram_jaccard_pairs",
    "x_ngram_novelty", "x_pack_sequences", "x_pagerank",
    "x_pii_redact", "x_pmi_cooccurrence", "x_pq_codes",
    "x_quality_classifier", "x_quality_score", "x_quality_stratified_trim",
    "x_rank_fusion_rrf", "x_repetition", "x_reservoir_sample",
    "x_semdedup", "x_semdedup_capped", "x_semdedup_diverse",
    "x_semdedup_keep_best", "x_semdedup_recall_eval", "x_simhash",
    "x_simhash_dedup_pairs", "x_snapshot_diff", "x_source_diversity",
    "x_source_reputation", "x_span_dedup", "x_split_assign",
    "x_substring_dedup", "x_substring_keep_first", "x_substring_rewrite",
    "x_temperature_mix", "x_tfidf_cosine_pairs", "x_tfidf_topk_terms",
    "x_token_stats", "x_top_terms", "x_training_data_prep",
    "x_triangle_count", "x_unigram_likelihood", "x_video_framesample",
    "x_vocab_coverage", "x_zorder_layout", "x_zorder_pruning_eval",
})

_ordered = {n: s for n, s in QUERIES.items() if n not in _DRIVER_VERIFIED}
_ordered.update({n: s for n, s in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)
del _ordered

__all__ = ["QUERIES", "QuerySpec", "query"]
