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
# (rotation history in COVERAGE.md).  Round-13 priorities (VERDICT
# r12 task 1 — the precomputed freshness obligation in COVERAGE.md
# "Round-13 freshness obligation" — plus task 2's single
# registration in the precomputed spare slot):
# 1. multimodal_adpcm_stats: the ONE new registration this round
#    (VERDICT r12 task 2 — the compressed-WAV decode paths were
#    pytest-pinned but not driver-hashed; this query round-trips all
#    four compressed framings and hashes the exact-through-lossy
#    metadata + closed-form container sizes).  Its slot is the
#    precomputed r13 spare (49 due < 50), explicitly reserved by the
#    r12 verdict for exactly this registration.  Registered: 151
#    callables; treadmill: 150 (percentile_prices stays retired).
# 2. the five entries displaced in rounds 11->12 — above_avg_orders,
#    customers_no_jumbo_order, local_supplier_volume,
#    pct_negative_acctbal, shipping_priority — now 3 rounds old (the
#    age ceiling): due FIRST among the obligations.
# 3. the full 44-entry r10 block (the 45 r10-fresh keys minus the
#    retired percentile_prices) — nothing displaced this round.
# After this round: 50 r13 / 50 r12 / 50 r11 — the treadmill reaches
# the exact 3x50 steady state: round 14 owes the plain 50-query r11
# block, round 15 the r12 block, and so on; every future
# registration now REQUIRES a same-round retirement (the spare is
# spent).  Precomputed in COVERAGE.md "Round-14 freshness
# obligation".  Every key listed here must still exist in QUERIES.
_SWEEP_FIRST = [
    # -- the round-13 registration (the precomputed spare slot;
    #    plan is new, so it sweeps first) --
    "multimodal_adpcm_stats",
    # -- displaced in r11->r12, now 3 rounds old: due first --
    "above_avg_orders",
    "customers_no_jumbo_order",
    "local_supplier_volume",
    "pct_negative_acctbal",
    "shipping_priority",
    # -- latest verdict is round 10 — the full 44-entry block --
    "ann_lsh_topk",
    "ann_topk",
    "asof_event_value",
    "bigram_surprisal",
    "brand_surrogate_ids",
    "corpus_shuffle",
    "cube_order_stats",
    "customer_order_histogram",
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
    "metric_projection",
    "multimodal_decode_stats",
    "multimodal_frames",
    "region_yearly_lag",
    "rolling_sum3",
    "rollup_revenue",
    "segment_decode",
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
