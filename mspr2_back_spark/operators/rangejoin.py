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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNIT_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
}


def _bucket_micros(bucket: str) -> int:
    """Parse '<n> <unit>[s]' (e.g. '2 hours') into microseconds."""
    try:
        n_str, unit = bucket.strip().split()
        n = int(n_str)
        return n * _UNIT_US[unit.lower().rstrip("s")]
    except (ValueError, KeyError):
        raise ValueError(
            f"bucketed_range_join: unsupported bucket {bucket!r}; "
            f"expected '<n> <second|minute|hour|day>[s]'"
        ) from None


def _floor_to_bucket(col: Column, bucket_us: int) -> Column:
    """Floor a timestamp to its bucket start (epoch-aligned).

    The input is cast to TIMESTAMP first: ``unix_micros`` rejects
    TIMESTAMP_NTZ, and sources that bypass the reader-boundary
    normalization (sources/readers.py::normalize_ntz) may still hand
    us NTZ event times. The cast is value-identity under the UTC
    session timezone and a no-op on TIMESTAMP input.
    """
    return F.timestamp_micros(
        (F.floor(F.unix_micros(col.cast("timestamp")) / bucket_us) * bucket_us).cast(
            "long"
        )
    )


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
    Bucket assignment is derived from the bucket WIDTH (epoch-aligned
    floor), so any width ('2 hours', '30 minutes', ...) keeps event
    buckets aligned with the window bucket set.
    Returns events columns + windows columns (inner or left_semi).
    """
    bucket_us = _bucket_micros(bucket)
    bucket_s = F.expr(f"INTERVAL {bucket}")
    # Normalize all three time columns to TIMESTAMP so the containment
    # filter never compares NTZ vs LTZ (a type error, not a coercion).
    if dict(events.dtypes).get(ts) == "timestamp_ntz":
        events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    for c in (start, end):
        if dict(windows.dtypes).get(c) == "timestamp_ntz":
            windows = windows.withColumn(c, F.col(c).cast("timestamp"))
    ev = events.withColumn("_b", _floor_to_bucket(F.col(ts), bucket_us))
    # Window → the (≤2) buckets it overlaps.
    win = windows.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _floor_to_bucket(F.col(start), bucket_us),
                # end is exclusive: a window ending exactly on a bucket
                # boundary does not reach into that bucket.
                _floor_to_bucket(
                    F.col(end) - F.expr("INTERVAL 1 microsecond"), bucket_us
                ),
                bucket_s,
            )
        ),
    )
    joined = ev.join(win, on="_b", how=how)
    return joined.filter(
        (F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end))
    ).drop("_b")
