"""Round-5 customer-analytics batch: RFM, path mining, cohort LTV.

The three named CRM/product-analytics families the surface didn't
yet spell out:

- rfm_segments    — recency/frequency/monetary quintile scoring per
                    customer, rolled up to segment cells (the classic
                    CRM segmentation grid).
- session_paths   — top event-type paths per (user, day) session
                    (clickstream path mining: which first-k step
                    sequences dominate).
- cohort_ltv      — cumulative value per first-activity-week cohort
                    over cohort age (the LTV-curve twin of
                    retention_cohorts' user counts).

Contract identical to plans/queries.py; constants and thresholds
live here, the oracle (plans/customer_oracle.py) imports them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mspr2_back_spark.functions.numeric import MONEY, dsum
from mspr2_back_spark.sources.readers import load_table

# Fixed "as of" date for recency: just after the orders table's date
# range at every SF (generator is date-stationary across SFs).
RFM_REF_DATE = "1999-01-01"
RFM_QS = (0.2, 0.4, 0.6, 0.8)
# Path mining: first N steps of each (user, day) session, top K.
PATH_STEPS = 5
PATH_TOP_K = 20
PATH_SEP = ">"


def _quintile_score(v, cuts_prefix: str):
    """1–5 score from the four broadcast quintile cutpoints
    (<=-banded, identical CASE tree on both engines)."""
    return (
        F.when(v <= F.col(f"{cuts_prefix}p20"), 1)
        .when(v <= F.col(f"{cuts_prefix}p40"), 2)
        .when(v <= F.col(f"{cuts_prefix}p60"), 3)
        .when(v <= F.col(f"{cuts_prefix}p80"), 4)
        .otherwise(5)
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last
    order), frequency (order count), monetary (exact-decimal spend),
    each scored into quintiles against the customer population's
    exact discrete cutpoints, rolled up to (r, f, m) segment cells
    with size and total spend.

    The per-customer relation is ONE aggregation of orders; all
    THREE dimensions' cutpoints come from a SINGLE
    operators/quantiles.binned_quantiles pass (r6) over the
    unpivoted (dim, value) relation — per-dim bin widths ride the
    ``bin_width_by_group`` CASE expression, and since the refine
    phase ranks raw values the cutpoints are exactly the ones three
    separate passes produced (regression-pinned by the unchanged
    oracle). One pass ≈ 6 stages instead of ~18: measured
    2.9 s → 1.9 s at sf0.1. The 12 cutpoints pivot to one row and
    attach by constant-key broadcast. Ties at cutpoints band
    identically on both engines (<= CASE tree, exact cutpoint
    values; the double cast of the int dims is value-exact).

    ``per_cust`` is PERSISTED (r12): the plan consumes it three
    times — the quantile bin pass, the refine pass, and the final
    banding — and while ReusedExchange dedups the shuffle write, the
    post-shuffle final aggregation re-runs over the full shuffled
    orders on every consumer. The persist caches the customers-sized
    result instead (rows ≈ corpus/10, 4 columns — bounded the same
    way binned_quantiles' own bin_counts persist is). Interleaved
    A/B at 256× orders (38.4M rows), min-of-3 warm, output identity
    asserted: 11.71 → 8.53 s at shuffle=32, 15.41 → 12.46 s at
    shuffle=128 (-20–27%). At sf0.1 the A/B read +0.4 s under
    loadavg ~11, but the gated round bench shows no cost (min 2.19 s
    vs the prior round's 2.47 warm-max) — the toy-scale delta
    straddles zero while the scale win is stable; adopted on the
    scale term (SCALING.md round 12).

    CACHE-LIFECYCLE CONTRACT (r13, ADVICE; same terms as
    ``funnel_latency``'s r8 contract in ``plans/timeseries.py``):
    this persist cannot be unpersisted at this API boundary (the
    consumer collects the returned DataFrame later), so the CALLER
    owns the session cache — repeated calls in a long-lived session
    stack cache-registry entries until long-lived sessions
    clearCache() or Spark's LRU evicts; MEMORY_AND_DISK keeps the
    stacked entries evictable, so the leak is bounded-harm by
    construction. The ``localCheckpoint(eager=True)`` alternative
    (GC-scoped cleanup, used by ``cms_heavy_hitters``) was NOT
    chosen for the same reason it was rejected at the funnel site:
    ``per_cust`` feeds ``binned_quantiles``, and a checkpointed
    LogicalRDD loses the relation statistics its downstream
    broadcast decisions depend on (PLANS.md "Round-8 amendment" —
    localCheckpoint is right only when nothing downstream joins on
    the relation's statistics).
    """
    from pyspark import StorageLevel

    from mspr2_back_spark.operators.quantiles import binned_quantiles
    from mspr2_back_spark.plans.analytics import _with_scalar

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.to_date(F.lit(RFM_REF_DATE)),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice", MONEY).alias("monetary"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    dims = ["recency_days", "frequency", "monetary"]
    stacked = per_cust.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"),
                        F.col(d).cast("double").alias("v"),
                    )
                    for d in dims
                ]
            )
        ).alias("e")
    ).select("e.dim", "e.v")
    q = binned_quantiles(
        stacked,
        "dim",
        "v",
        ps=RFM_QS,
        bin_width_by_group={
            "recency_days": 16.0,
            "frequency": 2.0,
            "monetary": 50_000.0,
        },
    )
    pnames = [f"p{round(p * 100)}" for p in RFM_QS]
    cuts_wide = (
        q.groupBy()
        .pivot("grp", dims)
        .agg(*[F.first(n).alias(n) for n in pnames])
    )
    scored = _with_scalar(per_cust, cuts_wide).select(
        _quintile_score(F.col("recency_days"), "recency_days_").alias(
            "r_score"
        ),
        _quintile_score(F.col("frequency"), "frequency_").alias("f_score"),
        _quintile_score(F.col("monetary"), "monetary_").alias("m_score"),
        "monetary",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # decimal(28,2), not MONEY (r17 money-extremes probe):
            # `monetary` is ALREADY a per-customer SUM — re-casting
            # an aggregate through the per-row money type overflows
            # when one customer's in-contract orders total past 1e16
            # (a 100 TB certainty for segment totals). The wider
            # fixed-point keeps the second-level sum order-free and
            # engine-exact; values for in-(18,2) totals unchanged.
            F.round(
                F.sum(F.col("monetary").cast("decimal(28,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event-type paths: the first PATH_STEPS steps of each
    (user, day) session, joined with '>' — which opening sequences
    dominate the product's usage (clickstream path mining).

    One shuffle builds per-session ordered type lists
    (sort_array(collect_list(struct)) — per-session state is that
    session's events, the sessionization bound), the path string is
    a scan-side slice + concat, and the final count/rank runs on the
    path-vocabulary relation. (ts, event_id) ordering makes every
    path deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy(
            "user_id", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(ts, event_id,"
                " event_type))), e -> e.event_type)"
            ).alias("steps")
        )
        .select(
            F.concat_ws(
                PATH_SEP, F.slice("steps", 1, PATH_STEPS)
            ).alias("path")
        )
    )
    counts = sessions.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    from mspr2_back_spark.plans.analytics import _with_scalar

    total = counts.agg(F.sum("n_sessions").alias("n_total"))
    return (
        _with_scalar(counts, total)
        .select(
            "path",
            "n_sessions",
            F.round(
                F.col("n_sessions").cast("double")
                / F.col("n_total").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP_K)
    )


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative event value per first-activity-
    week cohort as a function of weeks since first activity — the
    revenue twin of retention_cohorts.

    Same two key-hash shuffles as the retention matrix (user_id,
    then (cohort, offset)); the cumulative window runs over the
    cohorts × offsets relation (tiny at any corpus size), summing
    left-to-right over 6-dp-exact weekly values so the running
    totals are bit-identical cross-engine.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("event_week"),
        "value",
    )
    cohorts = ev.groupBy("user_id").agg(
        F.min("event_week").alias("cohort_week")
    )
    weekly = (
        ev.join(cohorts, "user_id")
        .withColumn(
            "week_offset",
            F.floor(
                F.datediff("event_week", "cohort_week") / 7
            ).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(dsum("value", "decimal(18,6)").alias("week_value"))
    )
    cum = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return weekly.select(
        "cohort_week",
        "week_offset",
        F.round("week_value", 6).alias("week_value"),
        F.round(F.sum("week_value").over(cum), 6).alias("cum_value"),
    ).orderBy("cohort_week", "week_offset")


CUSTOMER_QUERIES = {
    "rfm_segments": rfm_segments,
    "session_paths": session_paths,
    "cohort_ltv": cohort_ltv,
}
