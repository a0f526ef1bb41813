"""Extension queries — engine surface beyond the reference's own ops.

SURVEY §2.4 notes the reference uses no grouping sets / cube / rollup,
no exact percentiles, and no approximate aggregates; Spark provides
all of them natively, so the engine exposes them as first-class
queries. Also here: sessionization (gap-based, the batch twin of the
streaming stateful operator) and the CRUD surface from operators/crud
(MERGE-style upsert, DELETE-WHERE, point lookup — ref
api/api_crud.py:69-383 re-expressed for immutable storage).

Determinism contract (same as plans/queries.py): money sums aggregate
in DECIMAL, ratios divide identical exact intermediates, percentiles
use the discrete (value-picking, no interpolation) definition
hand-rolled identically on both engines — every output double is
bit-identical between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mspr2_back_spark.functions.numeric import METRIC, dsum
from mspr2_back_spark.operators.crud import delete_where, point_lookup, upsert
from mspr2_back_spark.sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Multi-dimensional aggregates (rollup / cube / grouping sets)
# ---------------------------------------------------------------------------


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region → nation revenue with subtotals and a grand total in one
    pass (``rollup``). One scan feeds every grouping level — at scale
    this replaces three separate jobs over the fact table; the dims
    broadcast so only the partial aggregates shuffle."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().alias("lvl"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations of (status, priority) in one scan
    (``cube``); ``lvl`` (grouping_id) disambiguates real NULLs from
    subtotal rows."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("lvl"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — per-year totals, per-priority totals,
    and the grand total, skipping the (year, priority) cross level a
    cube would also compute."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("o_year"), "o_orderpriority", "o_totalprice"
    )
    return o.groupingSets(
        [["o_year"], ["o_orderpriority"], []], "o_year", "o_orderpriority"
    ).agg(
        F.grouping_id().alias("lvl"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (discrete definition, bit-identical across engines)
# ---------------------------------------------------------------------------


def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles (p25/p50/p75) of order price per
    priority: the k-th smallest value with k = ceil(p·n), hand-rolled
    with row_number + a conditional min so the definition (and every
    bit of the result) is engine-independent — built-in
    ``percentile_cont`` interpolates and differs in ulps across
    engines. Single shuffle on the group key; the rank window and the
    aggregate share that partitioning."""
    o = _t(spark, sf_dir, "orders")
    win = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("o_orderpriority")).alias("n"),
    )

    def pick(p: float) -> F.Column:
        return F.min(
            F.when(F.col("rn") >= F.ceil(F.lit(p) * F.col("n")), F.col("o_totalprice"))
        )

    return ranked.groupBy("o_orderpriority").agg(
        pick(0.25).alias("p25"),
        pick(0.50).alias("p50"),
        pick(0.75).alias("p75"),
        F.max("n").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Sessionization (batch twin of streaming/events.py's stateful op)
# ---------------------------------------------------------------------------


def percentile_prices_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME exact discrete quantiles as percentile_prices, via the
    scale path: binned two-phase refinement
    (operators/quantiles.py::binned_quantiles). The rank-window form
    shuffles every row to one task per group (5 groups ⇒ 5 sort tasks
    at any scale); this one shuffles (group, bin) counts and bin-sized
    row subsets. Shares percentile_prices' oracle — bit-identical
    output is the point."""
    from mspr2_back_spark.operators.quantiles import binned_quantiles

    o = _t(spark, sf_dir, "orders")
    out = binned_quantiles(o, "o_orderpriority", "o_totalprice")
    return out.withColumnRenamed("grp", "o_orderpriority")


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-minute silence starts a new
    session. Classic lag-flag-cumsum formulation — one shuffle on
    user_id serves the lag window and the per-user aggregate. The
    interval comparison stays in timestamp space (no epoch casts), so
    sub-second precision is handled identically by both engines."""
    e = _t(spark, sf_dir, "events")
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(win)
    flagged = e.select(
        "user_id",
        F.when(prev.isNull(), 1)
        .when(F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES"), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    grouped = flagged.groupBy("user_id").agg(
        F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )
    return grouped.select(
        "user_id",
        "n_sessions",
        "n_events",
        (F.col("n_events") / F.col("n_sessions")).alias("events_per_session"),
    )


def asof_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time self as-of join: each event (per-user, per-ts
    pre-aggregated for determinism) is tagged with the user's latest
    event value from AT LEAST 30 minutes earlier — "state as of half
    an hour ago". DuckDB's native ASOF JOIN is the oracle; Spark-side
    it's the union + ordered-carry composition in operators/asof.py.
    Decimal-exact value sums keep both engines bit-identical.
    Rows outside the timestamp operating window are excluded
    scan-side (r18, timeseries.ts_operating_window_sql rationale:
    the output carries raw timestamps, and a day-one year-1 value is
    unrepresentable at the driver's collect boundary). Oracle
    mirrors the same predicate template."""
    from mspr2_back_spark.operators.asof import asof_join
    from mspr2_back_spark.plans.timeseries import ts_operating_window_sql

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.expr(ts_operating_window_sql("ts")))
        .groupBy("user_id", "ts")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value"))
    )
    return asof_join(
        e, e, key="user_id", ts="ts", value_col="value", tolerance="30 minutes"
    ).select("user_id", "ts", "value", "asof_value")


def events_in_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events against 45-minute observation windows spaced
    every 4 hours over the event month, aggregated per window. The
    Spark plan is the bucketed equi-join (operators/rangejoin.py);
    the oracle is DuckDB's inequality join over the same generated
    windows — same derivation on both engines."""
    from mspr2_back_spark.operators.rangejoin import bucketed_range_join

    e = _t(spark, sf_dir, "events")
    windows = spark.range(0, 180).select(
        F.col("id").alias("window_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.col("id") * F.expr("INTERVAL 4 HOURS")
        ).alias("w_start"),
        (
            F.lit("2024-01-01 00:45:00").cast("timestamp")
            + F.col("id") * F.expr("INTERVAL 4 HOURS")
        ).alias("w_end"),
    )
    joined = bucketed_range_join(e, windows, ts="ts", bucket="1 hour")
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 (3-of-8 probe cells) — the train-an-index scale
    path next to ann_lsh_topk's hash-based one. Uses the
    deterministic index build (hash-shard seed + one decimal-mean
    Lloyd step, `similarity.ivf_topk_deterministic`) so the probe set
    and scores are bit-reproducible in the DuckDB oracle; the MLlib
    KMeans variant (`similarity.ivf_topk`) remains the adaptive-index
    operator, bounded by the recall test."""
    from mspr2_back_spark.operators.similarity import ivf_topk_deterministic

    return ivf_topk_deterministic(
        load_table(spark, sf_dir, "embeddings"), query_id=7, k=10
    )


def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence materialization: each user's events as ONE
    ordered row — the export shape sequence models train on (and the
    batch twin of the streaming session state). One shuffle on the
    group key; the sequence is assembled with sort_array(collect_list)
    so the order is data-defined, not partition-defined. Serialized
    as a delimited string (engine-portable; an array column would
    pin the comparator to array formatting). Rows outside the
    timestamp operating window are excluded scan-side (r18,
    timeseries.ts_operating_window_sql rationale: first_ts/last_ts
    are raw timestamps, and a day-one year-1 value is
    unrepresentable at the driver's collect boundary). Oracle
    mirrors the same predicate template."""
    from mspr2_back_spark.plans.timeseries import ts_operating_window_sql

    e = _t(spark, sf_dir, "events").filter(
        F.expr(ts_operating_window_sql("ts"))
    )
    seq = F.expr(
        "concat_ws('|', transform(sort_array(collect_list("
        "struct(ts, event_id, event_type))), s -> s.event_type))"
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            seq.alias("event_type_seq"),
        )
    )


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document split into fixed-size
    token windows (32 tokens, stride 24 — 8-token overlap), the
    pretraining/RAG preprocessing twin of pack_documents (which packs
    whole docs; this splits them). Pure per-row explode — no shuffle,
    scan-parallel. Output: one row per (doc, chunk) with the chunk's
    token count and content hash."""
    size, stride = 32, 24
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.expr("array_remove(split(text, ' '), '')").alias("w")
    )
    # number of windows: 1 + ceil(max(n - size, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.size("w") - size, F.lit(0)) / stride
    ).cast("int")
    chunked = toks.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk_words = F.expr(f"slice(w, chunk_idx * {stride} + 1, {size})")
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk_words).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk_words)).alias("chunk_hash"),
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type
    (``approx_count_distinct``, rsd 1%) next to the exact count.

    The approximate path is the 100 TB answer: HLL sketches merge
    map-side, so the shuffle carries one ~kB sketch per (partition,
    group) instead of every distinct user id crossing the wire the way
    the exact expand-based plan requires. No SQL oracle — estimates
    are implementation-defined; the driver's rows-only check applies,
    and the accompanying test bounds the estimate against the exact
    count."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


# ---------------------------------------------------------------------------
# Set algebra + outer/anti joins (beyond the reference's single UNION)
# ---------------------------------------------------------------------------


def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over two derived key sets (nations
    with negative-balance customers vs suppliers) — one labeled row
    per set operation. Spark plans intersect/except as hash
    joins (left-semi / left-anti over distincts): no row expansion."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_nationkey").cast("int").alias("nk"))
        .distinct()
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_nationkey").cast("int").alias("nk"))
        .distinct()
    )

    def one(label: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_nations")).select(
            F.lit(label).alias("set_op"), "n_nations"
        )

    return (
        one("intersect", c.intersect(s))
        .unionByName(one("except", c.subtract(s)))
        .unionByName(one("union", c.union(s).distinct()))
    )


def customer_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN of two period aggregates per customer — rows
    survive when either side is missing; presence is tagged so the
    outer-join semantics are visible in the output."""
    o = _t(spark, sf_dir, "orders")
    early = (
        o.filter(F.year("o_orderdate") <= 1997)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(dsum("o_totalprice").alias("early_total"))
    )
    late = (
        o.filter(F.year("o_orderdate") >= 2001)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(dsum("o_totalprice").alias("late_total"))
    )
    joined = early.join(late, on="custkey", how="full_outer")
    return joined.select(
        "custkey",
        "early_total",
        "late_total",
        F.when(F.col("early_total").isNull(), "late_only")
        .when(F.col("late_total").isNull(), "early_only")
        .otherwise("both")
        .alias("presence"),
    )


def customers_no_jumbo_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no order above 400k,
    counted per segment. Broadcast left-anti — the probe side streams,
    nothing expands."""
    c = _t(spark, sf_dir, "customer")
    jumbo = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(jumbo, c.c_custkey == jumbo.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def order_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one window (rank,
    dense_rank, ntile, percent_rank, cume_dist) — deterministic via a
    unique (price, key) ordering. One shuffle on the partition key
    serves all five functions."""
    o = _t(spark, sf_dir, "orders")
    win = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.filter(F.col("o_totalprice") > 350000).select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(win).alias("rnk"),
        F.dense_rank().over(win).alias("drnk"),
        F.ntile(4).over(win).alias("quartile"),
        F.round(F.percent_rank().over(win), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(win), 9).alias("cume"),
    )


def status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority with one column per status
    (groupBy().pivot() — Spark plans it as conditional aggregation,
    exactly what the ANSI oracle spells out). Pairs with the stack()
    unpivot in profile_orders."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
    )


def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per market segment: rank window +
    rank <= k filter. Spark's rank-limit pushdown (WindowGroupLimit)
    prunes to <= k rows per group on BOTH sides of the shuffle, so the
    exchange never carries full groups — the per-group twin of
    TakeOrderedAndProject."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    win = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 per order for one
    market segment — a 3-way fact join narrowed by selective filters
    on both fact sides before the join (pushdown does the narrowing
    scan-side), then TakeOrderedAndProject for the top-k."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    disc = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate")
        )
        .agg(F.sum(disc).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where the supplier and the customer
    share a nation, per nation for one year — the 6-way star-plus-fact
    join. Dims broadcast; the only shuffles are the two fact-fact
    joins and the final group-by."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    disc = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(disc).cast("double").alias("revenue"))
    )


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their own customer's average price, counted per
    status. DataFrame side: one window average + filter (single
    shuffle). Oracle side: a correlated scalar subquery — proving the
    window formulation IS the decorrelated plan Catalyst would build.
    DECIMAL averages keep the boundary comparison identical on both
    engines (double averages differ in ulps and can flip rows)."""
    o = _t(spark, sf_dir, "orders")
    cust_avg = F.avg(F.col("o_totalprice").cast("decimal(18,2)")).over(
        W.partitionBy("o_custkey")
    )
    return (
        o.withColumn("_avg", cust_avg)
        .filter(F.col("o_totalprice").cast("decimal(18,2)") > F.col("_avg"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


def window_frame_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-window family over yearly totals: lead, lag,
    first_value, last_value, nth_value on an explicit
    unbounded-unbounded frame — the frame spec the reference never
    uses (SURVEY §2.5 'only default frames')."""
    o = _t(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        dsum("o_totalprice").alias("total")
    )
    ordered = W.orderBy("o_year")
    full = W.orderBy("o_year").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return yearly.select(
        "o_year",
        "total",
        F.lag("total").over(ordered).alias("prev_total"),
        F.lead("total").over(ordered).alias("next_total"),
        F.first_value("total").over(full).alias("first_year_total"),
        F.last_value("total").over(full).alias("last_year_total"),
        F.nth_value("total", 2).over(full).alias("second_year_total"),
    )


def pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: documents are assigned
    to fixed-budget chunks (8192 whitespace tokens) by prefix-sum
    bucketing — chunk id = floor(preceding-cumulative / budget) over a
    deterministic doc order. Chunks overfill by at most one document.

    The global prefix sum is computed scale-safely in two phases
    instead of one all-rows `Window.orderBy` (which would funnel the
    corpus through a single task — SURVEY's X4 anti-pattern):

    1. range-partition on doc_id, so ascending partition ids hold
       ascending disjoint doc_id ranges;
    2. per-partition token totals (one row per partition) are turned
       into exclusive per-partition offsets with a window over that
       tiny totals relation, and broadcast-joined back;
    3. the within-partition cumsum (window partitioned by the range
       partition id) plus the partition offset is the exact global
       cumsum — every stage is distributed over all partitions.

    The result is invariant to the partition count: range bounds only
    decide where the local/global split happens, never the order.
    Output: per-chunk document count and token total."""
    from pyspark import StorageLevel

    d = _t(spark, sf_dir, "documents")
    # Persisted: the (doc_id, n_tokens, pid) projection feeds both the
    # totals and the cumsum subtree, and the pid assignment (sampled
    # range bounds + spark_partition_id) must be IDENTICAL in both —
    # persisting pins one materialization rather than trusting
    # ReuseExchange across the two branches.
    toks = (
        d.select(
            "doc_id",
            F.expr("size(array_remove(split(text, ' '), ''))").alias("n_tokens"),
        )
        .repartitionByRange("doc_id")
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = toks.groupBy("pid").agg(F.sum("n_tokens").alias("pid_total"))
    # One row per partition: this window is single-partition but over
    # a partition-count-sized relation, not the corpus.
    off_win = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "pid",
        F.coalesce(F.sum("pid_total").over(off_win), F.lit(0)).alias("pid_offset"),
    )
    local_win = (
        W.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_chunk = toks.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_tokens",
        F.floor(
            (
                F.col("pid_offset")
                + F.sum("n_tokens").over(local_win)
                - F.col("n_tokens")
            )
            / F.lit(8192)
        ).alias("chunk_id"),
    )
    return with_chunk.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )


def scaled_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MinMax feature scaling as pure window algebra
    (SURVEY M1's per-country fit, relationally): scaled =
    (x - min_g) / (max_g - min_g) with a nullif guard for constant
    groups. No pandas, no fitted state — one shuffle on the group key
    computes every group's scaler and applies it in the same pass.
    Summed per user for a compact oracle-checked output."""
    e = _t(spark, sf_dir, "events")
    g = W.partitionBy("user_id")
    mn = F.min("value").over(g)
    mx = F.max("value").over(g)
    scaled = (F.col("value") - mn) / F.nullif(mx - mn, F.lit(0.0))
    per_row = e.select(
        "user_id", F.round(scaled, 9).alias("scaled")
    )
    # Sum in DECIMAL: double addition is order-dependent in the last
    # ulps and the oracle gate is bit-exact.
    return per_row.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("scaled").cast("decimal(18,9)")).cast("double").alias("scaled_sum"),
        F.min("scaled").alias("scaled_min"),
        F.max("scaled").alias("scaled_max"),
    )


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (50k buckets over order price) —
    one scan, one small-key aggregate; the distribution-profiling
    twin of percentile_prices."""
    o = _t(spark, sf_dir, "orders")
    # long, not int (r17 money-extremes probe): the DECIMAL(18,2)
    # money contract admits prices up to ~1e16, whose bin id
    # (price/50000 ≈ 2e11) overflows INT under ANSI — a crash on
    # contract-VALID data. Out-of-contract prices still fail loudly
    # at the DECIMAL cast in bucket_total, which is the money
    # contract's documented behavior.
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        o.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("bucket_total"),
        )
    )


def hot_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-phrase analytics: word 3-grams appearing
    in ≥5 distinct documents, by document frequency — the boilerplate/
    template detector (and the distribution the Jaccard index's
    df-cap is sized from). One explode + one aggregate; shuffle
    carries (shingle, partial count)."""
    from mspr2_back_spark.operators.dedup import shingles_exploded

    ex = shingles_exploded(_t(spark, sf_dir, "documents"))
    return (
        ex.groupBy("shingle")
        .agg(F.countDistinct("doc").alias("doc_freq"))
        .filter(F.col("doc_freq") >= 5)
        .orderBy(F.desc("doc_freq"), F.asc("shingle"))
        .limit(20)
    )


def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path via Spark 4's VARIANT type: parse the JSON
    props column once (`parse_json`), extract typed fields with
    `variant_get`, aggregate. VARIANT stores a parsed binary form, so
    repeated field access skips re-parsing — the modern replacement
    for per-access get_json_object string parsing (which
    props_extract keeps for comparison). Oracle: DuckDB JSON
    extraction of the same field."""
    e = _t(spark, sf_dir, "events")
    # try_parse_json: parse_json ABORTS the scan on the first
    # malformed payload (r15 dirty-events sweep); NULL variant →
    # NULL k → drops out of the aggregates, n_events still counts.
    # try_variant_get (r17): a VALID payload whose k does not fit
    # the target type (e.g. a 20-digit integer) made the strict
    # variant_get abort the scan after parsing succeeded — the same
    # one-bad-row class one level deeper. NULL instead; the oracle
    # mirrors with TRY_CAST.
    parsed = e.select(
        "event_type",
        F.try_parse_json("props").alias("v"),
    ).select(
        "event_type",
        F.expr("try_variant_get(v, '$.k', 'int')").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data profiling: null count, distinct count, and
    min/max (as strings, decimal-normalized for floats) per profiled
    column, unpivoted to one row per column via ``stack``. One scan +
    one aggregate produces every column's stats — the shape that
    profiles a 100 TB table in one job instead of one job per column."""
    o = _t(spark, sf_dir, "orders")
    def render(c: str, agg) -> F.Column:
        # min/max aggregate on the NATIVE type (string min over numbers
        # would be lexicographic), rendered to string after — doubles
        # through DECIMAL so both engines format identically.
        if c == "o_totalprice":
            return agg(F.col(c)).cast("decimal(18,2)").cast("string")
        return agg(F.col(c)).cast("string")

    stats = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            x
            for c in ["o_custkey", "o_orderstatus", "o_totalprice"]
            for x in (
                F.count(c).alias(f"{c}__nn"),
                F.countDistinct(c).alias(f"{c}__nd"),
                render(c, F.min).alias(f"{c}__min"),
                render(c, F.max).alias(f"{c}__max"),
            )
        ],
    )
    cols = ["o_custkey", "o_orderstatus", "o_totalprice"]
    stack_expr = "stack({n}, {args}) as (col_name, n_nulls, n_distinct, min_value, max_value)".format(
        n=len(cols),
        args=", ".join(
            f"'{c}', n_rows - {c}__nn, {c}__nd, {c}__min, {c}__max" for c in cols
        ),
    )
    return stats.select(F.expr(stack_expr))


# ---------------------------------------------------------------------------
# CRUD surface (operators/crud.py) as oracle-checked queries
# ---------------------------------------------------------------------------


def crud_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics: reprioritize every 2001+ order via
    ``upsert`` (anti-join + union), then summarize — the summary keys
    on the updated column, so a wrong merge (dropped, duplicated, or
    unreplaced rows) changes the output."""
    o = _t(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderdate") >= F.lit("2001-01-01")).withColumn(
        "o_orderpriority", F.lit("0-UPDATED")
    )
    merged = upsert(o, updates, keys=["o_orderkey"])
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price")
    )


def crud_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE WHERE status = 'F' via predicate complement
    (three-valued logic preserved), then a survivors summary."""
    o = _t(spark, sf_dir, "orders")
    remaining = delete_where(o, F.col("o_orderstatus") == "F")
    return remaining.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price")
    )


def crud_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORM ``get(pk)`` parity: single-key read. The key predicate
    reaches the parquet scan, so row groups whose min/max statistics
    exclude the key are skipped entirely."""
    o = _t(spark, sf_dir, "orders")
    return point_lookup(o, "o_orderkey", 42).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )


# ---------------------------------------------------------------------------
# Skew handling (operators/skew.py) as an oracle-checked query
# ---------------------------------------------------------------------------

# ~70% of events collapse onto seg_id 0 — the deliberately hot key
SKEW_SEGMENTS = ((0, "organic"), (1, "paid"), (2, "referral"), (3, "social"))


def skewed_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient fact–dim join + hot-group distinct count, ranked
    by revenue (r7 — the driver-checked demonstration for
    operators/skew.py). seg_id = pmod(user_id, 10) folded so ~70% of
    events land on segment 0: the canonical hot key that stalls one
    shuffle partition at 100 TB. The segment-name attach goes through
    ``salted_join`` (dim hinted to MERGE so the salted exchange is
    real, not a broadcast that hides the skew — at scale the dim that
    needs salting is the one too big to broadcast), and per-segment
    distinct users go through ``salted_count_distinct`` (two-phase:
    salt-spread partial dedup, then merge). Both outputs must equal
    plain unsalted join/aggregate semantics — which is exactly what
    the DuckDB oracle computes. Revenue sums in DECIMAL
    (order-independent) per the money contract.
    """
    from mspr2_back_spark.operators.skew import (
        salted_count_distinct,
        salted_join,
    )

    ev = _t(spark, sf_dir, "events")
    seg = ev.select(
        F.when(F.pmod(F.col("user_id"), F.lit(10)) < 7, F.lit(0))
        .otherwise(F.pmod(F.col("user_id"), F.lit(10)) - 6)
        .cast("int")
        .alias("seg_id"),
        "user_id",
        "value",
    )
    dim = spark.createDataFrame(
        list(SKEW_SEGMENTS), "seg_id int, seg_name string"
    )
    named = salted_join(seg, dim.hint("merge"), on=["seg_id"], n_salt=8)
    rev = named.groupBy("seg_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", METRIC).alias("total_value"),
    )
    users = salted_count_distinct(seg, "seg_id", "user_id", n_salt=8)
    users_named = users.join(F.broadcast(dim), on="seg_id").drop("seg_id")
    return (
        rev.join(F.broadcast(users_named), on="seg_name")
        .select(
            "seg_name",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
            F.col("n_distinct").alias("n_users"),
        )
        .orderBy(F.desc("total_value"), "seg_name")
    )


# ---------------------------------------------------------------------------
# Z-order layout (sources/zorder.py) as an oracle-checked query
# ---------------------------------------------------------------------------

ZAUDIT_BITS = 16  # 2 cols × 16 bits = 32-bit z-code
ZAUDIT_SEG_SHIFT = 2 * ZAUDIT_BITS - 6  # top 6 bits → 64 curve segments


def zorder_locality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked proof of the Morton interleave (r7 — the
    Z-order module's first oracle-gated query). Events are gridded on
    (user_id, value) against global min/max exactly as
    ``sources/zorder.zorder_write`` does (same ``_grid`` /
    ``morton_code`` expressions — pure codegen bit shuffling, no
    UDF), the 32-bit z-code's top 6 bits bucket rows into 64 curve
    segments, and each segment reports its row count plus its
    bounding box as a fraction of each column's full range. The
    box fractions ARE the layout property Z-order exists for: a
    curve segment covering a small (user × value) rectangle is what
    makes per-file footer stats tight on BOTH columns. The oracle
    recomputes the identical grid + a 32-term unrolled shift/mask
    interleave in DuckDB — one bit position wrong anywhere and the
    segment populations change. One scan + one 1-row broadcast +
    one 64-group aggregate; the 100 TB shape of a layout audit."""
    from mspr2_back_spark.sources.zorder import _grid, morton_code

    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    stats = ev.agg(
        F.min(F.col("user_id").cast("double")).alias("mn_u"),
        F.max(F.col("user_id").cast("double")).alias("mx_u"),
        F.min(F.col("value").cast("double")).alias("mn_v"),
        F.max(F.col("value").cast("double")).alias("mx_v"),
    )
    key = F.spark_partition_id() * 0 + 1  # non-foldable constant key
    joined = ev.withColumn("_k", key).join(
        F.broadcast(stats.withColumn("_k", key)), "_k"
    )
    gu = _grid(F.col("user_id"), F.col("mn_u"), F.col("mx_u"), ZAUDIT_BITS)
    gv = _grid(F.col("value"), F.col("mn_v"), F.col("mx_v"), ZAUDIT_BITS)
    zed = joined.select(
        "user_id",
        "value",
        "mn_u",
        "mx_u",
        "mn_v",
        "mx_v",
        F.shiftright(morton_code([gu, gv], ZAUDIT_BITS), ZAUDIT_SEG_SHIFT)
        .cast("int")
        .alias("z_segment"),
    )
    # F.first over mn_u/mx_u/mn_v/mx_v is deterministic here: the
    # broadcast attach gave every row the SAME 1-row stats values
    return (
        zed.groupBy("z_segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                (
                    (F.max("user_id") - F.min("user_id")).cast("double")
                    / F.nullif(F.first("mx_u") - F.first("mn_u"), F.lit(0.0))
                ),
                6,
            ).alias("user_box_frac"),
            F.round(
                (
                    (F.max("value") - F.min("value"))
                    / F.nullif(F.first("mx_v") - F.first("mn_v"), F.lit(0.0))
                ),
                6,
            ).alias("value_box_frac"),
        )
        .orderBy("z_segment")
    )


EXTENSION_QUERIES = {
    "rollup_revenue": rollup_revenue,
    "cube_order_stats": cube_order_stats,
    "grouping_sets_sales": grouping_sets_sales,
    "percentile_prices": percentile_prices,
    "sessionize_events": sessionize_events,
    "ann_ivf_topk": ann_ivf_topk,
    "user_event_sequences": user_event_sequences,
    "percentile_prices_refined": percentile_prices_refined,
    "chunk_documents": chunk_documents,
    "approx_distinct_users": approx_distinct_users,
    "asof_event_value": asof_event_value,
    "events_in_windows": events_in_windows,
    "top3_orders_per_segment": top3_orders_per_segment,
    "shipping_priority": shipping_priority,
    "local_supplier_volume": local_supplier_volume,
    "above_avg_orders": above_avg_orders,
    "window_frame_metrics": window_frame_metrics,
    "order_rank_metrics": order_rank_metrics,
    "status_pivot": status_pivot,
    "pack_documents": pack_documents,
    "scaled_user_values": scaled_user_values,
    "price_histogram": price_histogram,
    "hot_shingles": hot_shingles,
    "props_variant_stats": props_variant_stats,
    "profile_orders": profile_orders,
    "set_ops_nations": set_ops_nations,
    "customer_order_coverage": customer_order_coverage,
    "customers_no_jumbo_order": customers_no_jumbo_order,
    "crud_upsert": crud_upsert,
    "crud_delete": crud_delete,
    "crud_point_lookup": crud_point_lookup,
    "skewed_join_topk": skewed_join_topk,
    "zorder_locality_audit": zorder_locality_audit,
}
