"""Skew-resilient joins and aggregations.

At 100 TB a handful of hot keys (the null user, the default country,
the viral document) can put 10% of a fact table into one shuffle
partition and stall the stage on a single straggler task. Two
remedies, in preference order:

1. **AQE skew-join splitting** (on in session.py:
   ``spark.sql.adaptive.skewJoin.enabled``): Spark detects oversized
   partitions at runtime and splits them, replicating the matching
   build side. Zero code — the default answer.
2. **Explicit salting** (this module): when AQE can't help — skewed
   ``groupBy`` with order-sensitive aggregation buffers, skewed keys
   known in advance, or engines/versions without AQE — spread the hot
   key across ``n_salt`` sub-keys and replicate the small side to
   match.

Salting trades a ``n_salt``-fold replication of the small side for an
``n_salt``-fold fan-out of the hot partitions; correctness is
invariant to the salt values, so the salt can be anything uniform.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: each skewed row gets a
    uniform salt, ``small`` is exploded ``n_salt``-fold, and the join
    key becomes (key..., salt) — hot keys now spread over ``n_salt``
    shuffle partitions instead of one.

    ``small`` must be the dimension side (its replication factor is
    n_salt). Output equals the unsalted join exactly — which is why
    ``how`` is restricted to modes whose output is driven by the
    (uniquely-salted) big side: a right/full outer join would emit
    every unmatched ``small`` row once per replica (n_salt times).
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            f"rows n_salt times; use one of {sorted(allowed)}"
        )
    keys = list(on)
    big = skewed.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int")
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return big.join(replicated, on=keys + [_SALT], how=how).drop(_SALT)


def salted_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str, n_salt: int = 8
) -> DataFrame:
    """COUNT(DISTINCT x) per group with a salted two-phase plan for
    hot groups: phase 1 dedups (group, salt-spread x) partitions,
    phase 2 merges per group. Spark's built-in distinct aggregate
    already expands two-phase; this explicit form is for the case
    where one group's distinct set alone overflows a partition."""
    phase1 = (
        df.select(group_col, distinct_col)
        .withColumn(_SALT, F.pmod(F.xxhash64(distinct_col), F.lit(n_salt)).cast("int"))
        .groupBy(group_col, _SALT)
        .agg(F.countDistinct(distinct_col).alias("_partial"))
    )
    return phase1.groupBy(group_col).agg(F.sum("_partial").alias("n_distinct"))
