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
# (rotation history in COVERAGE.md).  Round-9 priorities (VERDICT r8
# task 1 — the steady-state freshness obligation, precomputed at r8
# close in COVERAGE.md "Round-9 freshness obligation"):
# 1. queries registered in round 9 (same-commit atomic with this
#    rotation; cap 4): multimodal_wav_stats is NEW (the WAV/PCM
#    codec under the driver hash — the last real codec that was
#    pytest-only, VERDICT r8 task 2); hll_distinct_users_sketch_only
#    is NEW (the 100 TB sketch shape as registered code, VERDICT r8
#    task 3). hll_distinct_users itself was refactored to share the
#    builder, but its plan, column order, and oracle results are
#    identical (whitespace-only oracle diff; verified green in the
#    r9 session sim) — a no-op refactor does not spend a slot and
#    its r8 verdict stays fresh;
# 2. ALL 46 queries whose latest driver verdict is round 6 — the
#    full obligation list COVERAGE.md precomputed at r8 close,
#    including the three refresh slots (year_week_rollup_join,
#    urgent_semijoin, revenue_by_nation) ceded to the late-r8
#    registrations. After this round every registered query's latest
#    verdict is <= 2 rounds old. new(2) + obligation(46) = 48;
# 3. the remaining 2 slots: leakage_safe_splits and
#    split_contamination_audit — both ride the dedup_clusters
#    subplan that the round-9 connected-components A/B (VERDICT r8
#    task 4) probes, so they sweep this round either way: if the A/B
#    adopts a new CC plan they re-verify the changed subplan under
#    the driver hash (their oracles are closure-based and
#    plan-independent; dedup_clusters itself is already in the
#    obligation block above), and if it rejects, they are deliberate
#    refreshes of the engine's two heaviest composite queries. See
#    PLANS.md for the A/B verdict.
# Every key listed here must still exist in QUERIES.
_SWEEP_FIRST = [
    # -- new in round 9 (cap 4) --
    "multimodal_wav_stats",  # r9: NEW — RIFF/PCM codec vs closed-form sample grid
    "hll_distinct_users_sketch_only",  # r9: NEW — the 100 TB HLL shape, no exact branch
    # -- latest verdict is round 6 — the full 46-query obligation --
    "above_avg_orders",
    "ann_ivf_topk",
    "approx_distinct_users",
    "bloom_prefilter_audit",
    "chunk_documents",
    "contamination_screen",
    "crud_delete",
    "crud_point_lookup",
    "crud_upsert",
    "customer_order_coverage",
    "customers_no_jumbo_order",
    "dedup_clusters",
    "dedup_corpus_summary",
    "dedup_embedding_cosine",
    "dedup_gate",
    "dedup_incremental",
    "event_weekday_contingency",
    "hot_shingles",
    "local_supplier_volume",
    "ml_forecast_ar",
    "order_rank_metrics",
    "pack_documents",
    "pct_negative_acctbal",
    "percentile_prices_refined",
    "pii_scrub",
    "price_histogram",
    "profile_orders",
    "props_extract",
    "props_variant_stats",
    "quality_filter",
    "repeated_spans",
    "rfm_segments",
    "rolling_active_users",
    "scaled_user_values",
    "seasonal_decompose_daily",
    "sessionize_events",
    "set_ops_nations",
    "shipping_priority",
    "source_mixture_sample",
    "status_pivot",
    "revenue_by_nation",
    "top3_orders_per_segment",
    "urgent_semijoin",
    "user_event_sequences",
    "window_frame_metrics",
    "year_week_rollup_join",
    # -- clustering-subplan re-verification (r9 CC adoption) --
    "leakage_safe_splits",
    "split_contamination_audit",
]
_missing = [n for n in _SWEEP_FIRST if n not in QUERIES]
assert not _missing, f"_SWEEP_FIRST names unknown queries: {_missing}"
QUERIES = {
    **{n: QUERIES[n] for n in _SWEEP_FIRST},
    **QUERIES,
}

__all__ = ["QUERIES", "ORACLE_SQL"]
