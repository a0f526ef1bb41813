"""Round-2 analytics batch: the TPC-H-grade relational shapes the
round-1 surface didn't yet exercise, plus four corpus/embedding
operators a training-data pipeline needs.

Relational additions (each a distinct plan shape, cited to the
benchmark query that canonicalized it):
- customer_order_histogram  — outer join + count-of-counts (Q13)
- min_cost_supplier_per_part — per-group min + tie-break join (Q2)
- revenue_share_by_nation   — group total vs broadcast global scalar (Q11)
- brand_supplier_counts     — count-distinct + anti-join exclusion (Q16)
- or_of_ands_revenue        — disjunctive predicate pushdown (Q19)
- waiting_orders_by_supplier — fact self-analysis, unique-latest (Q21)
- idle_customers_avg_bal    — scalar subquery + anti join (Q22)

Pipeline additions:
- corpus_shuffle       — deterministic shard+order training export
- ivf_cell_stats       — cluster-balance audit over the IVF index
- bigram_pmi           — adjacent-token association (PMI lift)
- embedding_norm_stats — higher-order array folds per label

Same contract as plans/queries.py: ``(spark, sf_dir) -> DataFrame``,
every computed column aliased identically to the oracle; money/metric
sums go through DECIMAL (functions/numeric.py) so results are
partition-count-invariant; scalar aggregates are attached with a
1-row BroadcastHashJoin on a literal key (not a cross join) so the
whole-surface plan-hygiene net stays strict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mspr2_back_spark.functions.numeric import dsum, money
from mspr2_back_spark.operators.sampling import portable_hash_bucket
from mspr2_back_spark.sources.readers import load_table

N_SHUFFLE_SHARDS = 16
PMI_MIN_COUNT = 5
PMI_TOP_K = 50
# idle_customers_avg_bal: "idle" = no order on/after this date
# (formatted into the DuckDB oracle too — one source of truth)
IDLE_CUTOFF_DATE = "1999-01-01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _with_scalar(df: DataFrame, scalar: DataFrame) -> DataFrame:
    """Attach a 1-row aggregate to every row of ``df``.

    Joining on a constant key plans as a BroadcastHashJoin with a
    1-row build side — same cost as a broadcast nested loop, but it
    keeps BNLJ out of every plan so the hygiene net can flag real
    accidents. A bare ``lit(1)`` key does NOT survive: Catalyst's
    FoldablePropagation folds the equi-condition to ``1 = 1`` and the
    join degenerates to BNLJ, so the key is built from a
    non-foldable-but-constant expression (``spark_partition_id() * 0
    + 1``). The scalar side stays an aggregate (never collected): on
    a cluster the driver only moves the single aggregated row.
    """
    k = F.spark_partition_id() * 0 + 1
    return (
        df.withColumn("_k", k)
        .join(F.broadcast(scalar.withColumn("_k", k)), "_k")
        .drop("_k")
    )


# ---------------------------------------------------------------------------
# Relational shapes (TPC-H-grade)
# ---------------------------------------------------------------------------


def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count distribution over customers (TPC-H Q13 shape).

    LEFT join keeps zero-order customers (their count is 0), then the
    count-of-counts re-aggregation. Two key-partitioned shuffles —
    custkey then n_orders — both scale-free in group count. The
    non-urgent filter lives on the orders side of the join (Q13's
    ON-clause placement): it must not drop customers.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest observed supplier per small part (TPC-H Q2 shape).

    The correlated-aggregate subquery (price = MIN(price) per part)
    becomes a per-key MIN aggregate re-joined to the fact; ties on
    price resolve to the lowest suppkey so the result is a function
    of the data alone. Both shuffles hash on l_partkey — AQE reuses
    the exchange. part/supplier are sf-SCALED relations (~10^9 rows
    at 100 TB TPC-H geometry), so they carry NO broadcast hint — a
    hint never flips, while AQE broadcasts them at every scale where
    that is safe and falls back to a shuffle join past the threshold
    (r11; plan-pinned by tests/test_extensions.py::
    test_analytics_dim_joins_flip_to_shuffle_without_hints).
    Top-100 by price is TakeOrderedAndProject, never a global sort.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    s = _t(spark, sf_dir, "supplier")
    li_small = li.join(
        p.select("p_partkey", "p_name"),
        li["l_partkey"] == p["p_partkey"],
    )
    # Aliased group key: joining the aggregate back to its own source
    # on the raw column would resolve both sides to the SAME attribute
    # (trivially-true predicate), so the re-join key gets a fresh name.
    min_price = li_small.groupBy(
        F.col("l_partkey").alias("mp_partkey")
    ).agg(F.min("l_extendedprice").alias("min_price"))
    best = (
        li_small.join(
            min_price,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"), "p_name", "min_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    return (
        best.join(
            s.select("s_suppkey", "s_name"),
            best["best_suppkey"] == s["s_suppkey"],
        )
        .select("p_partkey", "p_name", "min_price", "best_suppkey", "s_name")
        .orderBy("min_price", "p_partkey")
        .limit(100)
    )


def revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue share of the global total, kept where the share
    clears 2% (TPC-H Q11's group-vs-global HAVING shape).

    One scan feeds both the per-nation aggregate and the global
    scalar; the scalar re-attaches by 1-row broadcast. Decimal sums
    make numerator and denominator exact, so the double division is
    bit-identical on any partitioning. supplier is sf-scaled so its
    join carries NO broadcast hint (AQE decides — r11, plan-pinned);
    nation keeps its hint: 25 rows bounded by schema forever.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    disc = money("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - money("l_discount")
    )
    rev = (
        li.join(s.select("s_suppkey", "s_nationkey"),
                li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", disc.alias("d"))
    )
    per_nation = rev.groupBy("n_name").agg(
        F.sum("d").cast("double").alias("nation_revenue")
    )
    total = rev.agg(F.sum("d").cast("double").alias("total_revenue"))
    return (
        _with_scalar(per_nation, total)
        .select(
            "n_name",
            "nation_revenue",
            F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias(
                "revenue_share"
            ),
        )
        .filter(F.col("nation_revenue") / F.col("total_revenue") >= 0.02)
        .orderBy(F.desc("nation_revenue"), "n_name")
    )


def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type) excluding flagged
    suppliers (TPC-H Q16 shape: COUNT(DISTINCT) + NOT-IN exclusion).

    Constants are adapted to the driver testdata: its brand domain is
    Brand#1..Brand#25, so Q16's canonical Brand#45 would make the
    exclusion vacuous — Brand#15 keeps the predicate selective.

    The NOT IN is an anti join against the flagged-supplier set; the
    distinct count is Spark's two-phase expand — partials shrink
    map-side, the shuffle carries (group, suppkey) pairs, never raw
    rows. part and the flagged-supplier subset are both sf-SCALED
    (constant fractions of relations that grow with data volume), so
    neither join carries a broadcast hint — AQE broadcasts them at
    every scale where that is safe and flips to a shuffle join past
    the threshold (r11, plan-pinned).
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15") & (F.col("p_size") <= 25)
    )
    flagged = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(p.select("p_partkey", "p_brand", "p_type"),
                li["l_partkey"] == p["p_partkey"])
        .join(flagged, li["l_suppkey"] == flagged["s_suppkey"],
              "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


def or_of_ands_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR-of-ANDs predicate across joined tables
    (TPC-H Q19 shape). Catalyst extracts the common l_quantity bound
    and the p_size/p_brand conjuncts into pushed-down scan filters;
    the residual disjunction evaluates post-join. Single row out.

    Constants are adapted to the driver testdata: its brand domain is
    Brand#1..Brand#25, so Q19's canonical Brand#34 branch would never
    match — Brand#24 keeps all three disjuncts live.

    part is sf-scaled, so its join carries NO broadcast hint (AQE
    decides — r11, plan-pinned; same principle as the r10 n-gram
    hint removal: a hint never flips).
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p.select("p_partkey", "p_brand", "p_size"),
                li["l_partkey"] == p["p_partkey"])
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    disc = money("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - money("l_discount")
    )
    return j.filter(band).agg(
        F.sum(disc).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def waiting_orders_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who uniquely shipped LAST on finished multi-supplier
    orders (TPC-H Q21's kept-the-order-waiting shape, re-expressed on
    the columns this fact table carries).

    Q21's EXISTS(other supplier) / NOT EXISTS(later ship) pair is an
    order-local property — and every per-order fact it needs reduces
    in ONE groupBy(l_orderkey) pass (round-5 rework; the first form
    aggregated then re-joined the fact to find max-date rows, paying
    a second corpus shuffle + join):

    - max(struct(shipdate, suppkey))   → the HIGHEST suppkey that
      shipped on the last date (struct ordering is lexicographic);
    - max(struct(shipdate, -suppkey))  → the LOWEST such suppkey
      (negation flips the tiebreak while keeping shipdate primary);
    - min/max(suppkey)                 → "≥ 2 distinct suppliers"
      as smin != smax (exact, no countDistinct expansion).

    "Uniquely shipped last" is then hi.k == -(lo.nk) — ties
    (several suppliers at the max shipdate) disagree and are
    excluded exactly like Q21's NOT EXISTS excludes them. Top 20 is
    TakeOrderedAndProject.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    finished = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    # finished is ~half of orders — the most sf-scaled relation this
    # module ever hinted.  No broadcast hint (r11): AQE broadcasts it
    # only while it fits, and the fallback semi-join hashes on
    # l_orderkey, the same key the groupBy below needs, so the flip
    # reuses the exchange.
    fli = li.join(finished, li["l_orderkey"] == F.col("o_orderkey"),
                  "left_semi")
    per_order = fli.groupBy("l_orderkey").agg(
        F.max(
            F.struct(F.col("l_shipdate").alias("d"), F.col("l_suppkey").alias("k"))
        ).alias("hi"),
        F.max(
            F.struct(F.col("l_shipdate").alias("d"), (-F.col("l_suppkey")).alias("nk"))
        ).alias("lo"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    unique_last = per_order.filter(
        (F.col("smin") != F.col("smax")) & (F.col("hi.k") == -F.col("lo.nk"))
    ).select(F.col("hi.k").alias("s_suppkey"))
    return (
        unique_last.groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(s.select("s_suppkey", "s_name"), "s_suppkey")
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def idle_customers_avg_bal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-funded customers with no RECENT order (none since
    IDLE_CUTOFF_DATE), rolled up by nation (TPC-H Q22 shape: scalar
    AVG subquery + NOT EXISTS anti join; Q22's "no orders at all"
    form is vacuous on this corpus — every above-average-balance
    customer has SOME order — so the anti-join side is
    date-restricted, which keeps the shape and makes the verdict
    non-trivial: 14 customers / 10 nations at sf0.01).

    The scalar threshold (mean positive balance) attaches by 1-row
    broadcast; NOT EXISTS is a broadcast-able anti join on custkey.
    Decimal sum / count keeps the threshold bit-identical across
    engines, so the filter boundary is deterministic.
    """
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(IDLE_CUTOFF_DATE).cast("date"))
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))
            ).alias("avg_pos_bal")
        )
    )
    idle = (
        _with_scalar(c, avg_bal)
        .filter(F.col("c_acctbal") > F.col("avg_pos_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Corpus / embedding operators
# ---------------------------------------------------------------------------


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training export: every doc
    lands in a content-keyed shard with a stable position — the
    "locally shuffled, globally sharded" layout sequence trainers
    read (shard files written independently, rows pre-shuffled
    within each).

    The shard is the engine-portable md5 bucket (reproducible after
    an engine swap, like every split in operators/sampling.py); the
    in-shard order is the md5 itself, so the permutation is fully
    data-defined. The only window is partitioned BY SHARD — shard
    count scales with the cluster (16 here; thousands at 100 TB), so
    no single task ever sees the whole corpus.
    """
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|shuffle42")))
    sharded = d.select(
        "doc_id",
        h.alias("h"),
        portable_hash_bucket(
            F.col("doc_id"), salt="shuffle42", buckets=N_SHUFFLE_SHARDS
        ).alias("shard"),
    )
    pos = F.row_number().over(W.partitionBy("shard").orderBy("h", "doc_id"))
    return sharded.select(
        "doc_id", "shard", pos.alias("pos")
    )


def ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balance audit of the deterministic IVF index: per
    final cell, the member count, its share of the corpus, and the
    mean squared distance to the centroid — the numbers that tell
    you whether the ANN index is skewed (hot cells → slow probes)
    before you ship it.

    Reuses the bit-reproducible index build behind ann_ivf_topk
    (operators/similarity.py::ivf_assignments): decimal-mean
    centroids, left-fold distances. Mean distance decimal-sums the
    per-vector doubles so the audit itself is partition-invariant.
    """
    from mspr2_back_spark.operators.similarity import ivf_assignments

    assigned = ivf_assignments(
        _t(spark, sf_dir, "embeddings"), n_cells=8
    )
    cells = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (
            F.sum(F.col("dist").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_sq_dist"),
    )
    total = assigned.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        _with_scalar(cells, total)
        .select(
            "cell",
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("n_total"), 6).alias("share"),
            F.round("avg_sq_dist", 6).alias("avg_sq_dist"),
        )
        .orderBy("cell")
    )


def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token association mining: top bigrams by PMI lift
    P(xy) / (P(x)·P(y)) — the collocation signal tokenizer builders
    and phrase-vocab miners compute over a corpus.

    Bigrams come from zipping each token array with its own tail —
    pure per-row explode, scan-parallel, no shuffle until the count
    aggregations. The two unigram marginals re-attach WITHOUT a
    broadcast hint (r11, same fix as the r10 n-gram count joins in
    plans/sketches.py: the distinct-unigram relation is open-vocab —
    a hinted broadcast of it is a driver OOM at 100 TB; AQE
    broadcasts while it fits and otherwise plans a shuffle join
    keyed on the word, reusing the count aggregation's own
    exchange). All counts are exact BIGINTs; the lift is computed as
    (c_xy/T) / ((c_x/U)·(c_y/U)) with each step an IEEE double op,
    so both engines emit identical bits. Rare pairs (< 5) are
    dropped before ranking.
    """
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.expr("array_remove(split(text, ' '), '')").alias("w")
    )
    bigrams = toks.select(
        F.explode(
            F.expr(
                "arrays_zip(slice(w, 1, greatest(size(w) - 1, 0)),"
                " slice(w, 2, greatest(size(w) - 1, 0)))"
            )
        ).alias("b")
    ).select(F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))
    unigrams = toks.select(F.explode("w").alias("tok"))
    # r19 NOTE (VERDICT r18 task 3): single-materialization was
    # MEASURED AND REJECTED on this query, twice. Persisting BOTH
    # count relations (5 corpus explodes → 2 fills): 0.73x local,
    # 0.93x at the 64x scaled corpus. Persisting only uni_counts (its
    # 3 consumers are the heaviest duplication): 0.79x local, 0.84x
    # at 64x. The marginals here are small concurrent AQE stages —
    # idle cores absorb the duplicate explodes, while a persist puts
    # the fill + cache roundtrip on the critical path. Contrast
    # bigram_surprisal (3.79x at 64x) and tfidf (1.51x), where the
    # persisted relation removes a corpus-grain aggregation from the
    # serial path; plans/sketches.py carries the adopted pattern.
    uni_counts = unigrams.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    bi_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    totals = _with_scalar(
        uni_counts.agg(F.sum("c").alias("n_unigrams")),
        bigrams.agg(F.count(F.lit(1)).alias("n_bigrams")),
    )
    u1 = uni_counts.select(F.col("tok").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni_counts.select(F.col("tok").alias("w2"), F.col("c").alias("c_y"))
    scored = (
        bi_counts.filter(F.col("c_xy") >= PMI_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
    )
    px = F.col("c_x") / F.col("n_unigrams")
    py = F.col("c_y") / F.col("n_unigrams")
    pxy = F.col("c_xy") / F.col("n_bigrams")
    return (
        _with_scalar(scored, totals)
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(pxy / (px * py), 6).alias("pmi_lift"),
        )
        .orderBy(F.desc("pmi_lift"), "w1", "w2")
        .limit(PMI_TOP_K)
    )


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile of the embedding corpus — the sanity
    audit run before similarity search (a label whose norms collapse
    or explode poisons cosine thresholds).

    The norm is a left-fold over the array (higher-order function,
    JVM-side codegen, no UDF), identical to DuckDB's list_reduce
    fold order, so each per-vector double matches bit-for-bit; the
    per-label mean decimal-sums those doubles to stay
    partition-invariant. One scan, one tiny shuffle (label count).
    """
    e = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        e.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.sum(F.col("nrm").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


ANALYTICS_QUERIES = {
    "customer_order_histogram": customer_order_histogram,
    "min_cost_supplier_per_part": min_cost_supplier_per_part,
    "revenue_share_by_nation": revenue_share_by_nation,
    "brand_supplier_counts": brand_supplier_counts,
    "or_of_ands_revenue": or_of_ands_revenue,
    "waiting_orders_by_supplier": waiting_orders_by_supplier,
    "idle_customers_avg_bal": idle_customers_avg_bal,
    "corpus_shuffle": corpus_shuffle,
    "ivf_cell_stats": ivf_cell_stats,
    "bigram_pmi": bigram_pmi,
    "embedding_norm_stats": embedding_norm_stats,
}
