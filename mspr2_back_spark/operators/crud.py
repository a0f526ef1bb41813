"""Row-level CRUD re-expressed for immutable columnar storage.

Reference parity (SURVEY §2.1 S7): the reference serves point reads
and row mutations through a SQLAlchemy ORM over PostgreSQL
(ref api/api_crud.py:69,92,136-138,171-182,204-206,252,301-303,
342-353,381-383). A Spark-native engine has no mutable row store;
the idiomatic equivalents are:

- point reads  → key-equality filters (predicate pushdown turns them
  into parquet row-group skips via min/max statistics; at 100 TB, a
  point lookup over a table partitioned/sorted by key touches one
  file, not the corpus);
- UPDATE/INSERT → ``upsert`` (MERGE INTO semantics): anti-join the
  base on the update keys, then union the update rows. On a real
  deployment this is a Delta/Iceberg ``MERGE INTO``; the relational
  algebra below is exactly what those engines execute, minus the
  transaction log;
- DELETE → predicate complement with SQL three-valued logic (a SQL
  ``DELETE WHERE c`` removes rows where ``c`` is TRUE; rows where
  ``c`` is NULL survive).

All three are pure DataFrame→DataFrame transforms: they compose with
the rest of the plan and Catalyst optimizes through them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_lookup(df: DataFrame, key_col: str, value: object) -> DataFrame:
    """Key-equality read (ORM ``get(pk)``, ref api/api_crud.py:69).

    The equality predicate is pushed into the parquet scan: row groups
    whose [min, max] statistics exclude the key are never read.
    """
    return df.filter(F.col(key_col) == F.lit(value))


def upsert(base: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE INTO semantics: rows of ``base`` whose key appears in
    ``updates`` are replaced; new keys are inserted.

    (ORM insert/update, ref api/api_crud.py:92,136-138.) The anti-join
    strategy is left to the optimizer: when the distinct update-key
    side is small, AQE converts it to a broadcast join at runtime; a
    forced broadcast hint here would OOM on a large update batch
    (millions of keys) at the scale this module targets.
    """
    update_keys = updates.select(*keys).distinct()
    survivors = base.join(update_keys, on=list(keys), how="left_anti")
    return survivors.unionByName(updates.select(*base.columns))


def delete_where(df: DataFrame, cond: Column) -> DataFrame:
    """DELETE WHERE semantics (ORM delete, ref api/api_crud.py:171-182):
    remove rows where ``cond`` is TRUE; keep FALSE **and** NULL rows —
    SQL's three-valued logic, which a naive ``filter(~cond)`` gets
    wrong on NULL."""
    return df.filter(~cond.eqNullSafe(F.lit(True)))


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attr: str,
    base_from: str,
    effective: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: history-preserving
    attribute updates.

    `upsert` (above) is SCD1 — it overwrites. Type 2 instead CLOSES
    the current version of every updated key (valid_to = effective
    date) and opens a new current version carrying the new attribute
    value; unchanged keys keep their open version. This is the
    dimension-history pattern every warehouse load runs (and what
    Delta/Iceberg MERGE WHEN MATCHED THEN UPDATE/INSERT pairs
    express); algebraically it is one LEFT join of the dimension to
    the update batch plus a projection union — the join shuffles on
    the dimension key at scale (AQE broadcasts small batches), and
    nothing else is corpus-sized.

    ``updates`` must carry (key, new_<attr>); output =
    (key, attr, valid_from, valid_to, is_current), one row per
    version, deterministic.
    """
    upd = updates.select(
        F.col(key), F.col(f"new_{attr}")
    )
    joined = dim.select(key, attr).join(upd, key, "left")
    changed = F.col(f"new_{attr}").isNotNull()
    old_rows = joined.select(
        F.col(key),
        F.col(attr),
        F.lit(base_from).cast("date").alias("valid_from"),
        F.when(changed, F.lit(effective).cast("date")).alias("valid_to"),
        (~changed).alias("is_current"),
    )
    new_rows = joined.filter(changed).select(
        F.col(key),
        F.col(f"new_{attr}").alias(attr),
        F.lit(effective).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return old_rows.unionByName(new_rows)
