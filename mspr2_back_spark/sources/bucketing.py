"""Bucketed storage: shuffle-free co-located joins and aggregations.

The 100 TB join problem: a fact-fact equi-join (orders ⋈ lineitem,
events ⋈ sessions) shuffles BOTH sides on the key — at scale that
exchange dominates the job. Bucketing pre-partitions the data on disk:
``bucketBy(n, key)`` hash-splits rows into ``n`` files per write task
with the same hash function every Spark job uses for shuffle
partitioning, so a later join of two tables bucketed on the same key
with the same bucket count needs NO exchange on either side — each
task zips bucket i with bucket i. ``sortBy`` additionally pre-sorts
within buckets so the sort-merge join skips its sort.

This is the write-once/join-many trade: pay one shuffle at ingest,
then every downstream join/groupBy on the bucket key is exchange-free.
The tests assert the physical plan contains no Exchange — the
property that holds identically on a 1000-executor cluster.

(Reference parity: the reference's warehouse is PostgreSQL with FK
indexes, ref app/sql/mcd.puml:50-55; bucketed parquet tables are the
Spark-native analogue of "the warehouse lays data out for its joins".)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    parquet table registered in the catalog.

    Bucket count rule of thumb at scale: total_size / num_buckets
    should land in the 128 MB–1 GB per-file range; bucket counts must
    MATCH across tables that will be joined (Spark only elides the
    exchange for equal counts).
    """
    writer = df.write.format("parquet").mode("overwrite")
    writer = writer.bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
    force_merge: bool = False,
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys. With
    matching bucket specs this plans a sort-merge join with no
    shuffle on either side (and no per-task sort if the tables are
    sortBy'd).

    ``force_merge`` adds a merge-join hint: at bench scale factors
    Catalyst prefers broadcasting the small side (also shuffle-free,
    but not the plan that survives two 10 TB sides); the hint pins the
    sort-merge shape the bucketing exists for.
    """
    left = spark.table(left_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on=list(on), how=how)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange. A
    BroadcastExchange does NOT count — broadcasting replicates a
    small side without repartitioning the big one; the property
    bucketing buys is the absence of *shuffle* (hash/range
    repartition) exchanges. Used by tests to pin plan shapes."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        "Exchange" in line and "BroadcastExchange" not in line
        for line in plan.splitlines()
    )
