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
# (rotation history in COVERAGE.md).  Round-18 continues the 3x50
# steady state (50 r17 / 50 r16 / 50 r15 at r17 close): this round
# owes exactly the plain 50-entry r15 block — the keys of
# CORRECTNESS_r15 set-minus the r16 sweep, precomputed in
# COVERAGE.md "Round-18 freshness obligation" and recomputed by the
# r17 judge from the artifacts (set-equal, 50 = 50).  ZERO spare
# slots: no registration this round (the registry stays at 151
# registered / 150 on the treadmill, percentile_prices retired),
# no retirement, no displacement.  TWO entries are rows-only by
# design (approx_distinct_users, ml_forecast_ar).  This block
# carries SEVEN changed-plan keys whose r18 verdicts certify
# deferred or fix-before-sweep changes: the two codec probes
# multimodal_wav_stats + audio_feature_stats (r16 NULL-doc_id
# scan-side exclusion, frozen through r17 as ordered) plus the five
# late-r17 try_cast-family totality fixes (props_extract,
# props_variant_stats, source_mixture_sample, price_histogram,
# rfm_segments) — all seven sim-verified at change time and
# judge-sim-confirmed at r17.  FOUR more fix-before-sweep keys,
# r18 (the extreme-timestamp + metric-contract classes, COVERAGE.md
# "Round-18 fix" + "addendum 2"): rolling_active_users (spine
# calendar window), user_event_sequences (operating window),
# ml_forecast_ar (pandas-path domain; rows-only),
# seasonal_decompose_daily (second-level sums through
# TREND_MOMENT_SCALE) — landed r18 pre-sweep, the r15 props_*
# precedent; all sim-verified at change time and the whole block
# re-simulated at final HEAD (48/48 + 2 rows-only).
# Round 19 then owes the plain 50-entry r16 block
# (carrying dedup_embedding_lsh — the r17 conformance-filter WAIT
# key — plus r18's event_debounce + asof_event_value), cycling at
# period 3.
# Every key listed here must still exist in QUERIES.
_SWEEP_FIRST = [
    # -- the plain 50-entry r15 block, enumerated exactly as in
    #    COVERAGE.md "Round-18 freshness obligation" (alphabetical;
    #    no entry is new; order carries no priority semantics.  Two
    #    entries, approx_distinct_users and ml_forecast_ar, are
    #    rows-only by design) --
    "ann_ivf_topk",
    "approx_distinct_users",
    "audio_feature_stats",
    "avg_by_segment",
    "bloom_prefilter_audit",
    "chunk_documents",
    "contamination_screen",
    "crud_delete",
    "crud_point_lookup",
    "crud_upsert",
    "customer_order_coverage",
    "dedup_clusters",
    "dedup_corpus_summary",
    "dedup_embedding_cosine",
    "dedup_gate",
    "dedup_incremental",
    "dedup_keep_best",
    "distinct_counts",
    "event_weekday_contingency",
    "global_totals",
    "hll_distinct_users_sketch_only",
    "hot_shingles",
    "last_value_sum",
    "max_year_orders",
    "ml_forecast_ar",
    "multimodal_wav_stats",
    "order_rank_metrics",
    "pack_documents",
    "percentile_prices_refined",
    "pii_scrub",
    "price_histogram",
    "profile_orders",
    "props_extract",
    "props_variant_stats",
    "quality_filter",
    "repeated_spans",
    "revenue_by_nation",
    "rfm_segments",
    "rolling_active_users",
    "scaled_user_values",
    "seasonal_decompose_daily",
    "sessionize_events",
    "set_ops_nations",
    "source_mixture_sample",
    "status_pivot",
    "top3_orders_per_segment",
    "urgent_semijoin",
    "user_event_sequences",
    "window_frame_metrics",
    "year_week_rollup_join",
]
_missing = [n for n in _SWEEP_FIRST if n not in QUERIES]
assert not _missing, f"_SWEEP_FIRST names unknown queries: {_missing}"
QUERIES = {
    **{n: QUERIES[n] for n in _SWEEP_FIRST},
    **QUERIES,
}

__all__ = ["QUERIES", "ORACLE_SQL"]
