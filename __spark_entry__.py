"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing
summary) at sf0.001. ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with DuckDB oracles; the
registry lives in tera_spark/queries/.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _registry():
    import tera_spark.queries as Q

    Q.load_all()
    return Q.QUERIES, Q.ORACLES


# Driver-sample ordering: the correctness driver checks the FIRST 50
# queries() entries each round. Rounds 1-2 covered the 50 relational/
# cell entries (CORRECTNESS_r01/r02.json, all green); round 3 surfaces
# a class-spanning 50 of the not-yet-driver-checked LLM-pipeline /
# events / graph queries, then the remaining unchecked ones, then the
# already-green 50 last. All entries pass the identical local DuckDB
# gate at sf0.01 (tests/test_oracle_parity.py) regardless of position.
_DRIVER_PRIORITY = [
    # dedup family
    "dedup_exact_hash", "dedup_minhash_lsh_pairs", "dedup_lsh_verified",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "dedup_components", "dedup_edit_distance", "dedup_containment_pairs",
    "dedup_incremental_batch",
    # similarity / ANN
    "ann_cosine_topk", "ann_ivf_topk", "ann_ivf_near_pairs",
    "ann_hyperplane_pairs", "ann_int8_topk", "ann_hard_negatives",
    "ann_embedding_health",
    # text analysis
    "text_language_id", "text_quality_score", "text_tfidf_bm25",
    "text_unigram_surprisal", "text_zipf_slope", "text_pii_redaction",
    "text_bpe_pair_counts", "text_vocab_profile", "text_tokenizer_fertility",
    "text_pmi_collocations",
    # document stats / fingerprints
    "doc_fingerprint_rolling", "doc_token_stats", "doc_bpe_token_stats",
    # multimodal columns
    "multimodal_features", "multimodal_audio_features", "multimodal_resize",
    "multimodal_frame_plan",
    # pipeline ops
    "pipeline_token_packing", "pipeline_leakage_safe_split",
    "pipeline_dedup_drop_list", "pipeline_decontaminate",
    "pipeline_dsir_importance", "pipeline_weighted_interleave",
    "pipeline_doc_chunking",
    # sampling
    "sample_stratified_deterministic", "sample_weighted_reservoir",
    # events analytics
    "events_tumbling_window", "events_sessionize", "events_funnel_3step",
    "events_retention_cohorts", "events_asof_prev_click",
    "events_range_join_windows",
    # graph over the near-dup graph
    "graph_pagerank_neardup",
]

# keys with a green driver row in CORRECTNESS_r01/r02.json — ordered last
_DRIVER_GREEN_R2 = frozenset({
    "cell_append_merge", "cell_batch_get", "cell_check_and_apply",
    "cell_compact_fold", "cell_counter_add_merge", "cell_filter_list_and_or",
    "cell_max_qualifiers", "cell_multiversion_trim", "cell_put_ifabsent",
    "cell_row_map_shape", "cell_scan_range_projection", "cell_snapshot_read",
    "cell_time_range_scan", "cell_tombstone_mask", "cell_value_filter",
    "kv_ttl_scan", "q10_returned_items", "q11_important_parts",
    "q12_priority_shipping", "q13_cust_order_distribution", "q14_promo_effect",
    "q15_top_supplier", "q16_supplier_part_count", "q17_small_qty_revenue",
    "q18_large_volume_customer", "q19_disjunctive_filter", "q1_pricing_summary",
    "q20_excess_stock_suppliers", "q21_waiting_suppliers",
    "q22_idle_rich_customers", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q_cube_agg", "q_distinct_agg", "q_grouping_sets", "q_percentile_profile",
    "q_pivot_status", "q_rollup_revenue", "q_semi_anti_join", "q_set_ops",
    "q_sql_surface", "q_topk_per_group", "q_window_running_total",
    "sec_index_lookup",
})


def _driver_order(names):
    pri = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}

    def key(n):
        if n in pri:
            return (0, pri[n])
        if n not in _DRIVER_GREEN_R2:
            return (1, n)
        return (2, n)

    return sorted(names, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs, _ = _registry()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = _registry()
    return {name: qs[name] for name in _driver_order(qs)}


def oracle_sql() -> dict[str, str]:
    qs, oracles = _registry()
    return {name: oracles[name] for name in _driver_order(qs) if name in oracles}
