"""As-of (point-in-time) join — an operator Spark lacks natively,
composed from union + ordered window carry.

Semantics: for each left row, attach the value of the LATEST right
row of the same key with ``right.ts <= left.ts - tolerance`` (the
standard trades/quotes, state-as-of-then lookup; DuckDB spells it
``ASOF JOIN``, which is the test oracle).

Why this shape and not join-then-rank: the naive
``left.join(right, key).filter(r.ts <= l.ts - tol)`` materializes
every (left, right-history) pair before ranking — quadratic per key.
This composition is linear: tag both sides, shift the right side's
timestamp forward by the tolerance (b.ts <= a.ts - tol ⇔
b.ts + tol <= a.ts), union, and carry the last non-null right value
down an ordered window per key. One shuffle per side (on the key),
no row expansion, and the window sort is the same sort a merge-based
as-of would do.

Determinism: right rows must be unique per (key, ts) — duplicate
timestamps make "the latest row" ambiguous in ANY engine (DuckDB
picks arbitrarily too). Pre-aggregate the right side if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    tolerance: str = "0 seconds",
    out_col: str = "asof_value",
) -> DataFrame:
    """Left as-of join: every left row, plus ``out_col`` holding the
    latest right ``value_col`` with ``right.ts + tolerance <= left.ts``
    (NULL when no right row qualifies).

    The carried value is wrapped in a one-field struct: the struct is
    NULL exactly on left placeholder rows, so ``last(ignorenulls)``
    skips those but still carries a right row whose value is
    legitimately NULL — matching DuckDB ASOF JOIN, which returns that
    row's NULL rather than an older non-null value."""
    rv_type = f"struct<v:{right.schema[value_col].dataType.simpleString()}>"
    l_tag = left.withColumn("_is_l", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(rv_type)
    )
    r_tag = (
        right.select(
            F.col(key),
            (F.col(ts) + F.expr(f"INTERVAL {tolerance}")).alias(ts),
            F.struct(F.col(value_col).alias("v")).alias("_rv"),
        )
        .withColumn("_is_l", F.lit(0))
    )
    # Align schemas: right rows carry NULL for the left-only columns.
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    # Rights sort before lefts at equal timestamps (<= semantics).
    win = (
        W.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_l").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn(
        out_col, F.last("_rv", ignorenulls=True).over(win).getField("v")
    )
    return carried.filter(F.col("_is_l") == 1).drop("_is_l", "_rv")
