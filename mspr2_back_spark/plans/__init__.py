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
# (rotation history in COVERAGE.md).  Round-8 priorities (VERDICT r7
# task 1 — the steady-state freshness obligation):
# 1. cms_heavy_hitters LEADS: its r7 probe-set rework (probe = the
#    exact relation's keys) was plan-only and deliberately held out
#    of the r7 sweep, so the CHANGED plan has never carried a driver
#    verdict — r8 front-loads it before everything else;
# 2. queries registered or changed in round 8 (same-commit atomic
#    with this rotation; cap 8): multimodal_jpeg_meta is NEW (the
#    JPEG marker path under the driver hash, VERDICT r7 task 3);
#    multimodal_meta's decode dispatch gained KeyError fallback
#    (r8 ADVICE medium) — behavior on the corpus is unchanged but
#    the code path is, so it re-verifies; late-r8 adds three more NEW
#    registrations — hll_distinct_users (deterministic HLL, the
#    hash-green twin of the rows-only approx_distinct_users),
#    leakage_safe_splits (cluster-level train/val/test assignment),
#    and split_contamination_audit (the residual span-level leakage
#    the cluster-atomic split does NOT close, measured);
# 3. ALL 42 queries whose latest driver verdict is round 5 — the
#    full backlog COVERAGE.md precomputed at r7 close (minus
#    cms_heavy_hitters already at slot 1, minus nothing else), so
#    after this round every registered query's latest verdict is
#    <= 2 rounds old. cms(1) + changed(5) + stale(41) = 47;
# 4. the remaining 3 slots are spent DELIBERATELY on r6-verdict
#    queries (dict order would waste 3 of them on already-fresh r7
#    verdicts): dedup_minhash_lsh (its r6 signature rework deserves
#    a second verdict), ml_forecast_ar_exact (the M5 green half),
#    and funnel_latency (its persist was A/B'd against
#    localCheckpoint in r8 — plan unchanged after the measured
#    revert, but the verdict refresh documents that). Three of the
#    six originally planned refreshes (year_week_rollup_join,
#    urgent_semijoin, revenue_by_nation) ceded their slots to the
#    late-r8 registrations and join the round-9 obligation
#    (43 + 3 = 46; see COVERAGE.md).
# Every key listed here must still exist in QUERIES.
_SWEEP_FIRST = [
    # -- the one registered plan with no driver verdict on record --
    "cms_heavy_hitters",  # r7 plan rework (probe = exact keys), never swept
    # -- new / changed in round 8 (cap 8) --
    "multimodal_jpeg_meta",  # r8: NEW — SOF0/DHT/DRI/RSTn parse vs MCU-grid SQL
    "multimodal_meta",  # r8: dispatch KeyError fallback (ADVICE medium)
    "hll_distinct_users",  # r8: NEW — deterministic HLL registers vs md5-nibble SQL
    "leakage_safe_splits",  # r8: NEW — cluster-level split assignment vs recursive-CTE SQL
    "split_contamination_audit",  # r8: NEW — residual span leakage across splits
    # -- latest verdict is round 5 — the full 41-query refresh --
    "ann_batch_topk",
    "ann_quantized_topk",
    "approx_price_quantiles",
    "attribution_last_touch",
    "avg_by_segment",
    "bm25_topk",
    "cohort_ltv",
    "corpus_datacard",
    "daily_anomaly_scores",
    "daily_timeseries",
    "daily_value_trend",
    "dedup_edit_distance",
    "dedup_embedding_cells",
    "distinct_counts",
    "embedding_quantize_stats",
    "equidepth_price_bands",
    "event_association_rules",
    "event_funnel",
    "ewma_daily_value",
    "fk_integrity_audit",
    "gapfill_user_daily",
    "global_totals",
    "hybrid_search_rrf",
    "idle_customers_avg_bal",
    "last_value_sum",
    "lineitem_corr_matrix",
    "max_year_orders",
    "pricing_summary",
    "quality_weighted_sample",
    "retention_cohorts",
    "scd2_customer_merge",
    "session_paths",
    "simhash64_near_degree",
    "simhash_bucket_stats",
    "simhash_near_degree",
    "sliding_event_rates",
    "tfidf_top_terms",
    "unigram_surprisal",
    "waiting_orders_by_supplier",
    "weekly_rollup",
    "weighted_sample_fixed_k",
    # -- deliberate r6-verdict refreshes for the 3 remaining slots
    # (three of the six originally planned ceded their slots to the
    # late-r8 registrations above; year_week_rollup_join,
    # urgent_semijoin, and revenue_by_nation stay r6-age and join the
    # round-9 obligation) --
    "dedup_minhash_lsh",
    "ml_forecast_ar_exact",
    "funnel_latency",
]
_missing = [n for n in _SWEEP_FIRST if n not in QUERIES]
assert not _missing, f"_SWEEP_FIRST names unknown queries: {_missing}"
QUERIES = {
    **{n: QUERIES[n] for n in _SWEEP_FIRST},
    **QUERIES,
}

__all__ = ["QUERIES", "ORACLE_SQL"]
