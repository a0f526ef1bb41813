"""Cross-engine-deterministic numeric helpers.

Float SUMs are order-dependent: a parallel Spark aggregation and a
DuckDB oracle can disagree in the last ulps, which breaks value-hash
comparison (and, at 100 TB, makes reruns non-reproducible). The test
data carries fixed-point money (2 dp) and metric (6 dp) values, so we
aggregate in DECIMAL — exact, associative, order-independent — and
cast to DOUBLE only at the output boundary. The final decimal→double
conversion is deterministic (IEEE round-to-nearest), so both engines
emit bit-identical doubles.

Reference parity: the reference rounds serving-side rates with
``ROUND(x::DECIMAL, 2)`` (ref app/routes/data.py:357-358); this module
is the engine-wide generalization of that discipline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
METRIC = "decimal(18,6)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c: Column | str) -> Column:
    """Exact 2-dp fixed-point view of a money column."""
    return _col(c).cast(MONEY)


def money6(c: Column | str) -> Column:
    """Exact 6-dp fixed-point view of a metric column."""
    return _col(c).cast(METRIC)


def dsum(c: Column | str, scale: str = MONEY) -> Column:
    """Order-independent SUM: decimal-exact partial+final agg, double out."""
    return F.sum(_col(c).cast(scale)).cast("double")


def avg_of(c: Column | str, scale: str = MONEY) -> Column:
    """Deterministic mean: exact decimal sum, one double division."""
    return F.sum(_col(c).cast(scale)).cast("double") / F.count(F.lit(1))
