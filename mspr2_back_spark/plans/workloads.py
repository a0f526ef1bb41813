"""Round-5 workload batch: retrieval + behavioral analytics.

Four shapes the earlier surface didn't exercise:

- bm25_topk       — keyword relevance ranking (Okapi BM25): one
                    corpus scan, one-row global-stats broadcast,
                    TakeOrderedAndProject heap.
- ann_batch_topk  — per-GROUP top-k over a query batch: the
                    two-phase (partition-local then per-query)
                    ranking that replaces TakeOrderedAndProject
                    when k is per key.
- retention_cohorts — cohort matrix: users keyed by first-activity
                    week × activity-week offset (the classic
                    retention triangle).
- event_funnel    — ordered sequential funnel (signup → view →
                    click → purchase), each stage's timestamp
                    strictly after the previous stage's.

Same contract as plans/queries.py: ``(spark, sf_dir) -> DataFrame``,
every computed column aliased identically to the oracle
(plans/workloads_oracle.py); shared constants live here and the
oracle imports them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mspr2_back_spark.functions.numeric import dsum
from mspr2_back_spark.operators import retrieval, similarity
from mspr2_back_spark.sources.readers import load_table

# BM25: one rare term ('dup' ~5% df in the synthetic corpus) and two
# common ones — idf separates them by ~2 nats. The oracle formats
# the SAME tuple into its SQL.
BM25_TERMS = ("dup", "spark", "merge")
BM25_K = 15
ANN_BATCH_QUERIES = 8
ANN_BATCH_K = 5
# Funnel stage order (events.event_type): entry → engagement → intent
# → conversion. The oracle mirrors this tuple.
FUNNEL_STAGES = ("signup", "view", "click", "purchase")
# Conversion window: stage events must land within signup-day + N
# calendar days. N=2 discriminates at every SF (sf0.01 ladder
# 150/150/99/49/15); unbounded saturates (~everyone converts over a
# month) and same-day zeroes the last stage — both vacuous-verdict
# shapes (ADVICE r4).
FUNNEL_WINDOW_DAYS = 2


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 docs by BM25 for the fixed query-term bag.

    Plan: scan-side tf/dl array expressions (no token explode), one
    global stats row broadcast back on a constant key, codegen'd
    closed-form score, TakeOrderedAndProject. The single
    Exchange SinglePartition is the final step of the stats
    aggregate (partial map-side — one row per partition crosses).
    """
    return retrieval.bm25_topk(
        load_table(spark, sf_dir, "documents"), BM25_TERMS, k=BM25_K
    )


def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for each of 8 stored query vectors.

    The per-query ranking is two-phase (see
    operators/similarity.batch_topk): partition-local row_number
    prunes to Q × P × k rows before the per-q_id window, so no
    reducer ever receives a corpus-sized group.
    """
    return similarity.batch_topk(
        load_table(spark, sf_dir, "embeddings"),
        n_queries=ANN_BATCH_QUERIES,
        k=ANN_BATCH_K,
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: distinct active users per
    (first-activity week, weeks-since-first).

    Two key-partitioned shuffles (user_id for the cohort assignment,
    then (cohort_week, week_offset) for the matrix) — both scale-free
    in group count. The cohort relation is user-sized; at 100 TB the
    events⋈cohorts join shuffles on user_id (AQE handles power-user
    skew), never broadcast — the user dimension grows with the
    corpus. week_offset is exact: both weeks are Monday-truncated so
    the day delta is always a multiple of 7.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("event_week"),
    )
    cohorts = ev.groupBy("user_id").agg(F.min("event_week").alias("cohort_week"))
    return (
        ev.join(cohorts, "user_id")
        .withColumn(
            "week_offset",
            F.floor(F.datediff("event_week", "cohort_week") / 7).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed ordered conversion funnel over event sequences.

    Stage k counts users whose FIRST qualifying stage-k event
    happened STRICTLY AFTER their stage-(k-1) event and within
    FUNNEL_WINDOW_DAYS calendar days of their first signup —
    set-membership funnels overcount (order matters), and the window
    keeps the funnel a conversion measure instead of saturating over
    a long history. One shuffle by user_id builds per-user sorted per-stage
    timestamp lists (bounded by per-user event count — same state
    bound as sessionization; a pathological power user is an
    AQE-skew case, not a plan change), then the stage chain is pure
    array logic and the final count is a one-row aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    s0 = FUNNEL_STAGES[0]
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == s0, F.col("ts"))).alias("t_0"),
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == s, F.col("ts")))
            ).alias(f"ts_{s}")
            for s in FUNNEL_STAGES[1:]
        ],
    )
    stepped = per_user
    for i, s in enumerate(FUNNEL_STAGES[1:], start=1):
        stepped = stepped.withColumn(
            f"t_{i}",
            # get() (not [0]) — ANSI mode throws on indexing an
            # empty array; get returns NULL, matching the oracle's
            # out-of-range list index semantics. date + int is
            # date_add on both engines.
            F.expr(
                f"get(filter(ts_{s}, x -> x > t_{i - 1}"
                f" AND CAST(x AS DATE) <= CAST(t_0 AS DATE)"
                f" + {FUNNEL_WINDOW_DAYS}), 0)"
            ),
        )
    return stepped.agg(
        F.count(F.lit(1)).alias("n_users"),
        *[
            F.count(f"t_{i}").alias(f"reached_{s}")
            for i, s in enumerate(FUNNEL_STAGES)
        ],
    )


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by quality: keep each document with
    probability equal to its blended quality score.

    The continuous-per-row-rate counterpart of
    `source_mixture_sample`'s constant-per-source rates — the
    recipe that upweights high-quality text without hard filtering
    (soft quality curation). Decision = engine-portable md5 bucket <
    floor(score × 65536), so the kept set is deterministic under any
    partitioning and reproducible by the oracle character-for-
    character. Pure scan-side filter: no shuffle, no driver state,
    the 100 TB shape.
    """
    from mspr2_back_spark.functions.text import quality_score_col
    from mspr2_back_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score_col().alias("quality_score")
    )
    return mixture_sample(scored, F.col("quality_score"), "doc_id", salt="qw")


def equidepth_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile) histogram of order price per priority.

    Composes the scale-path quantile machinery: exact discrete
    p25/p50/p75 cutpoints per group via the binned two-phase
    refinement (operators/quantiles.py — no per-group full sort),
    broadcast back, band assignment scan-side, then one
    (group, band) aggregation. The NTILE way needs a global
    row_number per group (every row through one reducer per group);
    this shape's only corpus-sized exchanges hash on
    (group, bin) / (group, band). Money sums go through DECIMAL so
    the result is partition-count-invariant.
    """
    from mspr2_back_spark.operators.quantiles import binned_quantiles

    o = load_table(spark, sf_dir, "orders")
    cuts = binned_quantiles(o, "o_orderpriority", "o_totalprice").select(
        F.col("grp").alias("o_orderpriority"), "p25", "p50", "p75"
    )
    band = (
        F.when(F.col("o_totalprice") <= F.col("p25"), 0)
        .when(F.col("o_totalprice") <= F.col("p50"), 1)
        .when(F.col("o_totalprice") <= F.col("p75"), 2)
        .otherwise(3)
    )
    return (
        o.join(F.broadcast(cuts), "o_orderpriority")
        .withColumn("band", band)
        .groupBy("o_orderpriority", "band")
        .agg(
            F.count(F.lit(1)).alias("n_in_band"),
            F.min("o_totalprice").alias("band_min"),
            F.max("o_totalprice").alias("band_max"),
            dsum("o_totalprice").alias("band_total"),
        )
        .orderBy("o_orderpriority", "band")
    )


def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-style quantization reconstruction-error audit per label
    (operators/quantize.py): the storage-compression decision data a
    100 TB vector corpus needs before switching its ANN index to
    int8 codes. One scan + one 128-value stats row broadcast; the
    single Exchange SinglePartition is the stats aggregate's final
    step."""
    from mspr2_back_spark.operators.quantize import int8_quantize_stats

    return int8_quantize_stats(load_table(spark, sf_dir, "embeddings"))


RRF_K = 60
HYBRID_TOPK = 10
HYBRID_VEC_QUERY = 0


def rrf_score_sql() -> str:
    """Reciprocal-rank-fusion score — engine-portable SQL text over
    nullable kw_rank / vec_rank columns (absent side contributes 0)."""
    return (
        f"ROUND(COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + kw_rank), CAST(0 AS DOUBLE))"
        f" + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + vec_rank), CAST(0 AS DOUBLE)), 6)"
    )


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 keyword list and the vector
    top-k by reciprocal rank fusion (Cormack et al.'s RRF, the
    standard hybrid-search combiner) — score = Σ 1/(60 + rank) over
    the lists a doc appears in.

    Both candidate lists are k-sized relations, so everything after
    the two retrieval plans (rank windows, full outer join, fusion
    top-k) is work over ≤ 25 rows; the corpus-sized cost is exactly
    the two underlying retrievals. Embeddings align to documents by
    id (vec_id == doc_id in the testdata). The oracle composes the
    registered bm25_topk and ann_topk oracle texts verbatim, so the
    fused verdict certifies the same lists the component queries
    return.
    """
    kw = bm25_topk(spark, sf_dir).withColumn(
        "kw_rank",
        F.row_number().over(
            W.orderBy(F.desc("score"), F.asc("doc_id"))
        ),
    ).select("doc_id", "kw_rank")
    vec = (
        similarity.brute_force_topk(
            load_table(spark, sf_dir, "embeddings"), HYBRID_VEC_QUERY, k=10
        )
        .withColumn(
            "vec_rank",
            F.row_number().over(
                W.orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
            ),
        )
        .select(F.col("vec_id").alias("doc_id"), "vec_rank")
    )
    fused = kw.join(vec, "doc_id", "full_outer").withColumn(
        "rrf_score", F.expr(rrf_score_sql())
    )
    return (
        fused.select("doc_id", "kw_rank", "vec_rank", "rrf_score")
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(HYBRID_TOPK)
    )


APPROX_Q_ACCURACY = 10000


def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate (Greenwald-Khanna sketch) vs exact discrete price
    quartiles per priority, side by side.

    `percentile_approx` is the sketch a 100 TB job actually runs
    (mergeable, bounded memory, one pass — no per-group sort); its
    estimates are implementation-defined, so like
    `approx_distinct_users` this is rows-only at the driver but NOT
    unfalsified: the exact columns come from the oracle-pinned
    discrete-quantile machinery, and
    tests/test_workloads.py::test_approx_quantiles_rank_bound
    asserts each estimate's rank error is within the configured
    1/accuracy guarantee against the exact data.
    """
    from mspr2_back_spark.plans.extensions import percentile_prices

    o = load_table(spark, sf_dir, "orders")
    approx = o.groupBy("o_orderpriority").agg(
        F.percentile_approx(
            "o_totalprice", [0.25, 0.50, 0.75], APPROX_Q_ACCURACY
        ).alias("aps")
    )
    exact = percentile_prices(spark, sf_dir).select(
        "o_orderpriority",
        F.col("p25").alias("p25_exact"),
        F.col("p50").alias("p50_exact"),
        F.col("p75").alias("p75_exact"),
        "n_orders",
    )
    return (
        approx.join(F.broadcast(exact), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.element_at("aps", 1).alias("p25_approx"),
            F.element_at("aps", 2).alias("p50_approx"),
            F.element_at("aps", 3).alias("p75_approx"),
            "p25_exact",
            "p50_exact",
            "p75_exact",
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


ANN_QUANT_QUERY_ID = 0
ANN_QUANT_K = 10


def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 over the int8-dequantized embedding column —
    the compressed serving path next to `ann_topk`'s fp32 baseline
    (operators/quantize.quantized_topk). Recall vs fp32 is pinned in
    pytest; the reconstruction expression is the audit's template,
    so the driver verdict here certifies the exact codes the
    quantize audit measures."""
    from mspr2_back_spark.operators.quantize import quantized_topk

    return quantized_topk(
        load_table(spark, sf_dir, "embeddings"),
        ANN_QUANT_QUERY_ID,
        k=ANN_QUANT_K,
    )


SCD2_BASE_FROM = "1995-01-01"
SCD2_EFFECTIVE = "1998-06-01"
SCD2_NEW_SEGMENT = "COLLECTIONS"


def scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History-preserving (SCD type 2) segment update: every
    negative-balance customer moves to the COLLECTIONS segment as of
    SCD2_EFFECTIVE — their current version closes, a new open
    version appears; everyone else keeps one open version. The
    update batch derives deterministically from the dimension so the
    oracle can reproduce it exactly (operators/crud.scd2_merge)."""
    from mspr2_back_spark.operators.crud import scd2_merge

    c = load_table(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_acctbal") < 0).select(
        "c_custkey", F.lit(SCD2_NEW_SEGMENT).alias("new_c_mktsegment")
    )
    return scd2_merge(
        c, updates, "c_custkey", "c_mktsegment", SCD2_BASE_FROM, SCD2_EFFECTIVE
    ).orderBy("c_custkey", "valid_from")


SLIDE_WIDTH_MIN = 60
SLIDE_STEP_MIN = 15


def sliding_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window event rates: 1-hour windows advancing every 15
    minutes — the smoothed-rate view a monitoring dashboard draws
    (tumbling hourly_events is the coarse twin; the streaming module
    runs the same windows live).

    Spark's F.window(ts, width, step) explodes each event into
    width/step = 4 overlapping windows scan-side, then one hash
    aggregation on (window, event_type). Shuffle volume is 4× the
    tumbling form's — the price of overlap, paid in the exchange,
    not in any per-group state. Value sums go through DECIMAL
    (money6) per the engine-wide determinism contract. Rows outside
    the timestamp operating window are excluded scan-side (r18,
    timeseries.ts_operating_window_sql rationale: hop-window starts
    for a day-one year-1 event land in year ZERO, unrepresentable
    at the driver's collect boundary — measured `ValueError: year 0
    is out of range`). Oracle mirrors the same predicate template.
    """
    from mspr2_back_spark.functions.numeric import money6
    from mspr2_back_spark.plans.timeseries import ts_operating_window_sql

    ev = load_table(spark, sf_dir, "events").filter(
        F.expr(ts_operating_window_sql("ts"))
    )
    return (
        ev.groupBy(
            F.window(
                "ts", f"{SLIDE_WIDTH_MIN} minutes", f"{SLIDE_STEP_MIN} minutes"
            ).alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money6("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


CORR_COLS = (("q", "l_quantity"), ("p", "l_extendedprice"), ("d", "l_discount"))
CORR_SCALE = "DECIMAL(28,6)"


def corr_sql(a: str, b: str) -> str:
    """Pearson correlation from exact-decimal moment sums —
    engine-portable SQL text over columns n / s_{a} / s_{b} /
    ss_{a}{b} etc. Fixed operation order ⇒ identical IEEE doubles
    on both engines.

    NULLIF on the denominator (r15, same class as trend_slope_sql):
    a group where either column is constant has zero variance, and
    correlation against a constant is undefined → NULL instead of
    an ANSI divide-by-zero abort; both engines share this text."""
    return (
        f"ROUND((CAST(n AS DOUBLE) * ss_{a}{b} - s_{a} * s_{b})"
        f" / NULLIF(sqrt((CAST(n AS DOUBLE) * ss_{a}{a} - s_{a} * s_{a})"
        f" * (CAST(n AS DOUBLE) * ss_{b}{b} - s_{b} * s_{b})), 0), 6)"
    )


def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations (quantity, price, discount) per
    return flag — single-pass statistical profiling.

    Plain double moment sums are summation-order-dependent (breaks
    reruns and the oracle hash), so every sum aggregates in
    DECIMAL(28,6) — exact, associative — and converts to double only
    at the output boundary; the correlation formula itself is one
    shared SQL template (corr_sql) so both engines evaluate the
    identical expression tree. One map-side-partial aggregation;
    3-group output.
    """
    li = load_table(spark, sf_dir, "lineitem")

    def dsum6(expr: F.Column, name: str) -> F.Column:
        return F.sum(expr.cast(CORR_SCALE)).cast("double").alias(name)

    cols = {k: F.col(c) for k, c in CORR_COLS}
    aggs = [F.count(F.lit(1)).alias("n")]
    keys = list(cols)
    for i, a in enumerate(keys):
        aggs.append(dsum6(cols[a], f"s_{a}"))
        for b in keys[i:]:
            aggs.append(dsum6(cols[a] * cols[b], f"ss_{a}{b}"))
    moments = li.groupBy("l_returnflag").agg(*aggs)
    out_cols = [F.col("l_returnflag"), F.col("n")]
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            out_cols.append(F.expr(corr_sql(a, b)).alias(f"corr_{a}{b}"))
    return moments.select(*out_cols).orderBy("l_returnflag")


# (child table, fk col, parent table, pk col) — the star schema's
# edges; the oracle mirrors this list in order.
FK_EDGES = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every star-schema edge: row
    count, orphan count (child keys with no parent), and orphan rate
    per relationship.

    The constraint-validation pass a warehouse runs after every
    load. Each edge is a LEFT join on the key (parents deduped
    first) reduced to one scalar row — partial aggregation map-side,
    so each edge contributes one row to its final exchange (6
    Exchange SinglePartition total, one per relationship, all
    shape (a)). Parent sides broadcast when small; at 100 TB the
    lineitem→orders edge shuffles on the key, which is the honest
    cost of validating a fact-to-fact constraint.
    """
    rows = []
    for child, fk, parent, pk in FK_EDGES:
        c = load_table(spark, sf_dir, child).select(fk)
        p = load_table(spark, sf_dir, parent).select(pk).distinct()
        joined = c.join(p, c[fk] == p[pk], "left")
        rows.append(
            joined.agg(
                F.lit(f"{child}->{parent}").alias("relationship"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.when(F.col(pk).isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.withColumn(
        "orphan_rate",
        F.round(F.col("n_orphans").cast("double") / F.col("n_rows"), 6),
    ).orderBy("relationship")


WORKLOAD_QUERIES = {
    "bm25_topk": bm25_topk,
    "ann_batch_topk": ann_batch_topk,
    "retention_cohorts": retention_cohorts,
    "event_funnel": event_funnel,
    "quality_weighted_sample": quality_weighted_sample,
    "equidepth_price_bands": equidepth_price_bands,
    "embedding_quantize_stats": embedding_quantize_stats,
    "fk_integrity_audit": fk_integrity_audit,
    "lineitem_corr_matrix": lineitem_corr_matrix,
    "sliding_event_rates": sliding_event_rates,
    "scd2_customer_merge": scd2_customer_merge,
    "ann_quantized_topk": ann_quantized_topk,
    "approx_price_quantiles": approx_price_quantiles,
    "hybrid_search_rrf": hybrid_search_rrf,
}
