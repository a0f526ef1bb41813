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
# (rotation history in COVERAGE.md).  Round-6 priorities (VERDICT r5
# task 1 — verdict freshness):
# 1. queries whose body or oracle changed in round 6 (any query
#    registered or changed mid-round is inserted here in the SAME
#    commit — registration and rotation are one atomic edit; this
#    block is capped at 10 so the stale refresh below never gets
#    crowded out again);
# 2. ALL 40 queries whose latest driver verdict is round 3 — the
#    full deferred backlog, so after this round every registered
#    query's latest verdict is ≤ 2 rounds old.
# Everything swept in round 4/5 keeps its green (r4 verdicts are 2
# rounds old at the r6 sweep — inside the freshness bar).
# Every key listed here must still exist in QUERIES.
_SWEEP_FIRST = [
    # -- new / changed in round 6 (cap 10) --
    "ml_forecast_ar",  # r6: refreshed rows-only signal (AR(14) pandas path)
    "ml_forecast_ar_exact",  # r6: NEW — closed-form AR(2), fully oracle-checked
    "dedup_minhash_lsh",  # r6: 2-universal signature derivation rework
    "event_weekday_contingency",  # r6: oracle hardened to sign-safe mod (ADVICE)
    "seasonal_decompose_daily",  # r6: oracle hardened to sign-safe mod (ADVICE)
    "bloom_prefilter_audit",  # r6: NULLIF guard on fp_rate denominator (ADVICE)
    "rolling_active_users",  # r6: gap days densified to dau=0 rows (ADVICE)
    "multimodal_decode_stats",  # r6: NEW — real BMP codec proof, oracle-checked
    "rfm_segments",  # r6: one stacked quantile pass (same cutpoints, same oracle)
    "funnel_latency",  # r6: converted relation persisted (same plan output)
    # -- latest verdict is round 3 — the full 40-query refresh --
    "revenue_by_nation",
    "year_week_rollup_join",
    "urgent_semijoin",
    "props_extract",
    "pct_negative_acctbal",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "repeated_spans",
    "contamination_screen",
    "pii_scrub",
    "dedup_incremental",
    "source_mixture_sample",
    "quality_filter",
    "dedup_gate",
    "dedup_corpus_summary",
    "sessionize_events",
    "ann_ivf_topk",
    "user_event_sequences",
    "percentile_prices_refined",
    "chunk_documents",
    "approx_distinct_users",  # rows-only — refresh keeps the rows signal current
    "top3_orders_per_segment",
    "shipping_priority",
    "local_supplier_volume",
    "above_avg_orders",
    "window_frame_metrics",
    "order_rank_metrics",
    "status_pivot",
    "pack_documents",
    "scaled_user_values",
    "price_histogram",
    "hot_shingles",
    "props_variant_stats",
    "profile_orders",
    "set_ops_nations",
    "customer_order_coverage",
    "customers_no_jumbo_order",
    "crud_upsert",
    "crud_delete",
    "crud_point_lookup",
]
_missing = [n for n in _SWEEP_FIRST if n not in QUERIES]
assert not _missing, f"_SWEEP_FIRST names unknown queries: {_missing}"
QUERIES = {
    **{n: QUERIES[n] for n in _SWEEP_FIRST},
    **QUERIES,
}

__all__ = ["QUERIES", "ORACLE_SQL"]
