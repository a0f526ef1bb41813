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
# (rotation history in COVERAGE.md).  Round-10 priorities (VERDICT r9
# task 1 — the precomputed freshness obligation in COVERAGE.md
# "Round-10 freshness obligation"):
# 1. queries whose PLAN CHANGED in round 10 (same-commit atomic with
#    this rotation; the registry stays closed at 149 — zero new
#    registrations): the three n-gram count joins dropped their
#    explicit F.broadcast hints (VERDICT r9 "What's wrong" #1 /
#    task 3 — a hint never flips, so at open-vocab 100 TB the
#    distinct-n-gram broadcast was a driver OOM; AQE now chooses, and
#    tests/test_sketches.py pins that the flipped join reuses the
#    count aggregation's own exchange). bigram_surprisal is r9-fresh
#    (takes the round's one free slot), unigram_surprisal and
#    tfidf_top_terms are r8-fresh — re-swept here a round early,
#    each displacing one r7-age obligation entry per the rotation
#    rules. dedup_minhash_lsh (r8-fresh) also changed twice: the
#    persisted shingle projection is hash(doc)-partitioned so the
#    verify joins stop shuffling the corpus-wide shingle arrays, and
#    the banding expansion collapses identical bucket member lists
#    before the explode (VERDICT r9 task 2 — interleaved A/Bs at
#    256x: 68.0 -> 40.1 -> 37.5 s min-of-2, SCALING.md round 10;
#    both changes share the one sweep slot; pair sets verified
#    bit-identical each time, so the
#    closure-based oracles of the riding queries are unchanged and
#    the FIVE riders — dedup_clusters, dedup_keep_best,
#    dedup_corpus_summary, leakage_safe_splits,
#    split_contamination_audit (dedup_incremental builds its own
#    batch-vs-corpus shingle join and does NOT ride the pair
#    relation), all re-verified green in the r10 session sim —
#    re-sweep at their natural r11/r12 due dates).
#    The accounting nets to zero for r11: the three early refreshes
#    leave the r8 block at 47, and the three displaced entries
#    (table_preview, orders_page, pagination_meta — trivial
#    LIMIT/COUNT queries with pytest cover, lowest-risk to carry one
#    round over age) HEAD the round-11 obligation → r11 owes exactly
#    50 again;
# 2. the remaining 46 of the 49 queries whose latest driver verdict
#    is round 7 — COVERAGE.md's precomputed obligation minus the
#    three displaced above. After this round: 50 r10 / 49 r9 /
#    47 r8 / 3 r7 (bigram left the r9 block and only three queries
#    left the r8 block; the displaced trio is due first in r11).
# Every key listed here must still exist in QUERIES.
_SWEEP_FIRST = [
    # -- plans changed in round 10 (broadcast-hint removal) --
    "bigram_surprisal",  # r10: hint-free count joins (was the weak-list entry)
    "unigram_surprisal",  # r10: hint-free vocab join (displaces table_preview)
    "tfidf_top_terms",  # r10: hint-free df join (displaces orders_page)
    "dedup_minhash_lsh",  # r10: hash(doc)-partitioned verify + distinct bucket lists (displaces pagination_meta)
    # -- latest verdict is round 7 — the obligation minus displaced --
    "ann_lsh_topk",
    "ann_topk",
    "asof_event_value",
    "bigram_pmi",
    "brand_supplier_counts",
    "brand_surrogate_ids",
    "corpus_shuffle",
    "cube_order_stats",
    "customer_order_histogram",
    "date_spine",
    "dedup_embedding_lsh",
    "dedup_exact",
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
    "min_cost_supplier_per_part",
    "multimodal_decode_stats",
    "multimodal_frames",
    "or_of_ands_revenue",
    "percentile_prices",
    "region_yearly_lag",
    "revenue_share_by_nation",
    "rolling_sum3",
    "rollup_revenue",
    "segment_decode",
    "skewed_join_topk",
    "status_priority_rollup",
    "text_fingerprints",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
    "token_budget_sample",
    "top5_customers",
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
