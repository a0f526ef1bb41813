from mspr2_back_spark.plans.extensions import EXTENSION_QUERIES
from mspr2_back_spark.plans.extensions_oracle import EXTENSION_ORACLE_SQL
from mspr2_back_spark.plans.oracle import ORACLE_SQL as _RELATIONAL_SQL
from mspr2_back_spark.plans.pipeline_oracle import PIPELINE_ORACLE_SQL
from mspr2_back_spark.plans.pipeline_queries import PIPELINE_QUERIES
from mspr2_back_spark.plans.queries import QUERIES as _RELATIONAL_QUERIES

QUERIES = {**_RELATIONAL_QUERIES, **PIPELINE_QUERIES, **EXTENSION_QUERIES}
ORACLE_SQL = {**_RELATIONAL_SQL, **PIPELINE_ORACLE_SQL, **EXTENSION_ORACLE_SQL}

# The driver's correctness sweep covers the first 50 registered
# queries in dict order.  Round 1 left 22 of the 72 without a
# CORRECTNESS row, so round 2 front-loads exactly those, followed by
# the queries whose oracle or physical plan changed this round; the
# rotation (and the union of per-round verdicts) is documented in
# COVERAGE.md.  Every key listed here must still exist in QUERIES.
_SWEEP_FIRST = [
    # unchecked in CORRECTNESS_r01
    "approx_distinct_users",
    "asof_event_value",
    "events_in_windows",
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
    # red in r01 (oracle SUM typing fixed this round)
    "props_extract",
    "pct_negative_acctbal",
    "sessionize_events",
    # plan or oracle changed this round
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    # new in round 2
    "dedup_clusters",
    "repeated_spans",
    "contamination_screen",
    "pii_scrub",
    "dedup_incremental",
    "source_mixture_sample",
    "quality_filter",
    "user_event_sequences",
    "dedup_gate",
    "percentile_prices_refined",
    "chunk_documents",
    "dedup_corpus_summary",
]
_missing = [n for n in _SWEEP_FIRST if n not in QUERIES]
assert not _missing, f"_SWEEP_FIRST names unknown queries: {_missing}"
QUERIES = {
    **{n: QUERIES[n] for n in _SWEEP_FIRST},
    **QUERIES,
}

__all__ = ["QUERIES", "ORACLE_SQL"]
