from mspr2_back_spark.plans.analytics import ANALYTICS_QUERIES
from mspr2_back_spark.plans.analytics_oracle import ANALYTICS_ORACLE_SQL
from mspr2_back_spark.plans.customer import CUSTOMER_QUERIES
from mspr2_back_spark.plans.customer_oracle import CUSTOMER_ORACLE_SQL
from mspr2_back_spark.plans.extensions import EXTENSION_QUERIES
from mspr2_back_spark.plans.extensions_oracle import EXTENSION_ORACLE_SQL
from mspr2_back_spark.plans.oracle import ORACLE_SQL as _RELATIONAL_SQL
from mspr2_back_spark.plans.pipeline_oracle import PIPELINE_ORACLE_SQL
from mspr2_back_spark.plans.pipeline_queries import PIPELINE_QUERIES
from mspr2_back_spark.plans.queries import QUERIES as _RELATIONAL_QUERIES
from mspr2_back_spark.plans.sketches import SKETCH_QUERIES
from mspr2_back_spark.plans.sketches_oracle import SKETCH_ORACLE_SQL
from mspr2_back_spark.plans.timeseries import TIMESERIES_QUERIES
from mspr2_back_spark.plans.timeseries_oracle import TIMESERIES_ORACLE_SQL
from mspr2_back_spark.plans.workloads import WORKLOAD_QUERIES
from mspr2_back_spark.plans.workloads_oracle import WORKLOAD_ORACLE_SQL

QUERIES = {
    **_RELATIONAL_QUERIES,
    **PIPELINE_QUERIES,
    **EXTENSION_QUERIES,
    **ANALYTICS_QUERIES,
    **WORKLOAD_QUERIES,
    **TIMESERIES_QUERIES,
    **SKETCH_QUERIES,
    **CUSTOMER_QUERIES,
}
ORACLE_SQL = {
    **_RELATIONAL_SQL,
    **PIPELINE_ORACLE_SQL,
    **EXTENSION_ORACLE_SQL,
    **ANALYTICS_ORACLE_SQL,
    **WORKLOAD_ORACLE_SQL,
    **TIMESERIES_ORACLE_SQL,
    **SKETCH_ORACLE_SQL,
    **CUSTOMER_ORACLE_SQL,
}

# The driver's correctness sweep covers the first 50 registered
# queries in dict order; per-round verdicts union latest-wins
# (rotation history in COVERAGE.md).  Round-5 priorities:
# 1. simhash_bucket_stats / simhash_near_degree — the only two
#    registered queries that have NEVER carried a driver verdict
#    (registered after the round-4 window was set);
# 2. queries whose body changed this round (listed right after the
#    never-swept block; any query registered mid-round is inserted
#    here in the SAME commit that registers it — registration and
#    rotation are one atomic edit);
# 3. the remaining slots refresh the 48 queries whose latest verdict
#    is round 3 (everything swept in round 4 keeps its r4 green).
# Every key listed here must still exist in QUERIES.
_SWEEP_FIRST = [
    # never swept — first-ever driver verdicts
    "simhash_bucket_stats",
    "simhash_near_degree",
    # new / changed in round 5 (kept adjacent so mid-round inserts
    # stay inside the 50-slot window; tail entries below rotate out
    # one-for-one as these grow)
    "simhash64_near_degree",
    "idle_customers_avg_bal",
    "dedup_embedding_cells",
    "bm25_topk",
    "ann_batch_topk",
    "retention_cohorts",
    "event_funnel",
    "waiting_orders_by_supplier",  # r5 one-pass argmax rework
    "quality_weighted_sample",
    "equidepth_price_bands",
    "embedding_quantize_stats",
    "fk_integrity_audit",
    "lineitem_corr_matrix",
    "sliding_event_rates",
    "scd2_customer_merge",
    "ann_quantized_topk",
    "approx_price_quantiles",
    "hybrid_search_rrf",
    "gapfill_user_daily",
    "daily_anomaly_scores",
    "event_transition_matrix",
    "attribution_last_touch",
    "daily_value_trend",
    "cms_heavy_hitters",
    "tfidf_top_terms",
    "dedup_edit_distance",
    "ewma_daily_value",
    "event_debounce",
    "bloom_prefilter_audit",
    "seasonal_decompose_daily",
    "weighted_sample_fixed_k",
    "event_weekday_contingency",
    "unigram_surprisal",
    "corpus_datacard",
    "event_association_rules",
    "funnel_latency",
    "rfm_segments",
    "session_paths",
    "cohort_ltv",
    "rolling_active_users",
    # latest verdict is round 3 — refresh
    "pricing_summary",
    "global_totals",
    "weekly_rollup",
    "daily_timeseries",
    "avg_by_segment",
    "distinct_counts",
    "max_year_orders",
    "last_value_sum",
    # rotated out (continued): revenue_by_nation,
    # year_week_rollup_join,
    # urgent_semijoin, props_extract,
    # rotated out (r3-green, refresh deferred to round 6) when the
    # round-5 "new / changed" block grew: pct_negative_acctbal,
    # dedup_embedding_cosine, dedup_clusters,
    # repeated_spans,
    # contamination_screen,
    # pii_scrub, dedup_incremental,
    # source_mixture_sample,
    # quality_filter, dedup_gate, dedup_corpus_summary,
    # sessionize_events, ann_ivf_topk, user_event_sequences,
    # percentile_prices_refined, chunk_documents,
    # approx_distinct_users (rows-only — no hash to refresh),
    # top3_orders_per_segment, shipping_priority,
    # local_supplier_volume,
    # above_avg_orders,
    # window_frame_metrics,
    # order_rank_metrics,
    # status_pivot, pack_documents, scaled_user_values,
    # price_histogram, hot_shingles, props_variant_stats, profile_orders,
    # set_ops_nations, customer_order_coverage,
    # customers_no_jumbo_order, crud_upsert, crud_delete,
    # crud_point_lookup
]
_missing = [n for n in _SWEEP_FIRST if n not in QUERIES]
assert not _missing, f"_SWEEP_FIRST names unknown queries: {_missing}"
QUERIES = {
    **{n: QUERIES[n] for n in _SWEEP_FIRST},
    **QUERIES,
}

__all__ = ["QUERIES", "ORACLE_SQL"]
