"""Exact distributed quantiles via binned refinement.

The straightforward exact form (rank window per group, see
plans/extensions.py::percentile_prices) is correct but its shuffle
key is the GROUP: with a handful of groups, a 100 TB input funnels
through a handful of sort tasks. This module computes the SAME exact
discrete quantile (k-th smallest, k = ceil(p·n)) in two distributed
phases:

1. **Bin pass** — rows are bucketed into fixed-width value bins;
   (group, bin) counts + a running count over the (small) bin
   relation locate, for each target rank k, the single bin holding
   the k-th value and how many values precede that bin.
2. **Refine pass** — only the rows of the located bins are ranked
   (per (group, percentile) — each a bin-sized sort, thousands of
   times smaller than the group), and the (k - preceding)-th smallest
   within the bin is the exact answer.

The corpus is scanned exactly twice (bin pass + refine pass); the
per-percentile work happens on the (group, bin) count relation,
which is bins-sized, not rows-sized — consumed once, so it is not
persisted (r18). Shuffles carry those counts and bin-sized row
subsets — never a full per-group sort.
Results are bit-identical to the rank-window form (same discrete
definition), which is what lets the two share an oracle.

NULL values are excluded up front: the rank-window twin's NULL
placement is engine-divergent anyway (Spark sorts NULLS FIRST, most
SQL engines NULLS LAST), so the shared exact-quantile contract is
defined over non-null values only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def binned_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: Sequence[float] = (0.25, 0.50, 0.75),
    bin_width: float = 50_000.0,
    bin_width_by_group: dict[str, float] | None = None,
) -> DataFrame:
    """Exact discrete quantiles per group, one output column per p
    (``p25``/``p50``/``p75`` style), plus ``n_orders`` — matching the
    rank-window formulation's output bit-for-bit on non-null data.

    ``bin_width_by_group`` (r6) lets one call serve groups with
    different value scales (e.g. an unpivoted metrics relation:
    recency in days, spend in currency) — the bin width becomes a
    per-group CASE expression while the refine pass still ranks RAW
    values, so results stay exact regardless of width choice (width
    only steers bin-pass selectivity). This is what lets a caller
    replace N quantile passes with one pass over N× stacked rows.
    """
    names = [f"p{round(p * 100)}" for p in ps]
    if len(set(names)) != len(ps):
        raise ValueError(f"ps map to colliding column names: {names}")

    if bin_width_by_group:
        width = F.lit(bin_width)
        for g, w in bin_width_by_group.items():
            width = F.when(F.col(group_col) == g, F.lit(w)).otherwise(width)
    else:
        width = F.lit(bin_width)
    binned = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        F.floor(F.col(value_col) / width).cast("long").alias("bin"),
    ).filter(F.col("v").isNotNull())
    # Bin pass: the (group, bin) count relation plus, riding the SAME
    # hash(grp) exchange, the per-group total n as an unordered
    # sibling window — no separate totals aggregation, no broadcast
    # join to re-attach it (r18 optimization: the old shape computed
    # `counts` as its own aggregation and joined it back TWICE; the
    # window form removes one aggregation, two broadcast joins and
    # the final n_orders join, and with a single consumer the
    # bin_counts persist became dead weight and is gone too).
    grp_w = W.partitionBy("grp")
    cum_w = grp_w.orderBy("bin")
    cum = (
        binned.groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "grp",
            "bin",
            (F.sum("c").over(cum_w) - F.col("c")).alias("preceding"),
            F.sum("c").over(cum_w).alias("cum"),
            F.sum("c").over(grp_w).alias("n"),
        )
    )

    # All percentiles in one pass over the bin relation: explode the
    # ps literals next to each (tiny) cum row — pure codegen, no
    # broadcast relation (r18: replaces createDataFrame +
    # crossJoin(broadcast), dropping the BroadcastNestedLoopJoin and
    # its build job). The k-th smallest lives in the first bin whose
    # running count reaches k, and min(struct) keeps that bin's row;
    # `preceding` and `n` are functions of (grp, bin) / (grp), so the
    # struct-min picks exactly the rows the join form picked.
    k = F.ceil(F.col("p") * F.col("n"))
    picks = (
        cum.select(
            "*",
            F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"),
        )
        .filter(F.col("cum") >= k)
        .groupBy("grp", "p")
        .agg(F.min(F.struct("bin", "preceding", "n")).alias("t"))
        .select(
            "grp",
            "p",
            F.col("t.bin").alias("bin"),
            F.col("t.preceding").alias("preceding"),
            F.col("t.n").alias("n"),
        )
    )

    # Refine: rank only the rows of located bins. The join fans each
    # row out once per percentile that lands in its bin (≤ len(ps));
    # the picks relation carries n, so no per-group totals join.
    in_bins = binned.join(F.broadcast(picks), ["grp", "bin"])
    rank_w = W.partitionBy("grp", "p").orderBy("v")
    k_in_bin = (
        F.ceil(F.col("p") * F.col("n")).cast("long") - F.col("preceding")
    )
    picked = (
        in_bins.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == k_in_bin)
        .select("grp", "p", "v", "n")
    )
    # n is constant per grp, so keying the pivot on (grp, n) yields
    # the same groups and lets n_orders ride the pivot instead of a
    # final join against a totals relation.
    wide = (
        picked.groupBy("grp", "n")
        .pivot("p", [float(p) for p in ps])
        .agg(F.first("v"))
    )
    return wide.select(
        F.col("grp"),
        # backticks: the pivot names contain a dot ("0.25")
        *[
            F.col(f"`{float(p)}`").alias(name)
            for p, name in zip(ps, names)
        ],
        F.col("n").alias("n_orders"),
    )
