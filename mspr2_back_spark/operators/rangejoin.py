"""Range (interval) join: events ⋈ [start, end) windows, bucketed.

Spark plans a naive ``l.join(r, (r.start <= l.ts) & (l.ts < r.end))``
as BroadcastNestedLoopJoin (if one side is small) or a cartesian
product — quadratic and cluster-killing at scale. The standard fix is
**bucketing the time axis**: pick a bucket width ≥ the longest
interval, explode each interval to the buckets it overlaps (≤ 2 when
width ≥ interval length), bucket each event by its timestamp, then
EQUI-join on the bucket and post-filter the exact containment. The
join becomes a hash join on bucket ids — shuffle proportional to
input sizes, not their product.

DuckDB executes the naive inequality join efficiently (IEJoin), which
makes it the value oracle for the bucketed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    events: DataFrame,
    windows: DataFrame,
    ts: str = "ts",
    start: str = "w_start",
    end: str = "w_end",
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join event rows to every window with ``start <= ts < end``.

    ``bucket`` must be at least the longest window length — each
    window then overlaps ≤ 2 buckets, bounding the explode factor.
    Returns events columns + windows columns (inner or left_semi).
    """
    bucket_s = F.expr(f"INTERVAL {bucket}")
    ev = events.withColumn(
        "_b", F.date_trunc("hour", F.col(ts))  # bucket floor for the event
    )
    # Window → the (≤2) hour buckets it overlaps.
    win = windows.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col(start)),
                # end is exclusive: a window ending exactly on a bucket
                # boundary does not reach into that bucket.
                F.date_trunc("hour", F.col(end) - F.expr("INTERVAL 1 microsecond")),
                bucket_s,
            )
        ),
    )
    joined = ev.join(win, on="_b", how=how)
    return joined.filter(
        (F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end))
    ).drop("_b")
