"""Hive-partitioned gold-table storage with partition pruning.

The other half of the 100 TB layout story (bucketing covers joins;
this covers time/filter locality): gold tables are written
``partitionBy(<low-cardinality key>)`` so a query that filters on the
key never opens the other partitions' files — the planner resolves
the predicate against directory names (PartitionFilters), not data.
A year-partitioned decade of facts serves "this year" queries by
scanning ~10% of files; at 100 TB that's the difference between a
job and a non-starter.

Partition key rules at scale:
- low cardinality (years, regions, dates at worst) — every distinct
  value is a directory; high-cardinality keys (user_id) create
  millions of tiny files and kill the file index;
- align keys with the dominant predicate (reference serving queries
  filter by year/country: ref app/routes/data.py:127-128,210);
- combine with in-file sorting or bucketing for secondary keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Write a parquet table hive-partitioned on ``partition_cols``."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan a partitioned table; partition columns come back as real
    columns, and filters on them prune at plan time."""
    return spark.read.parquet(path)


def scan_plan(df: DataFrame) -> str:
    """Physical-plan string (for pruning/pushdown assertions)."""
    return df._jdf.queryExecution().executedPlan().toString()


def compact_parquet(
    spark: SparkSession, path: str, target_file_mb: int = 256
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files —
    the small-files remedy.

    Streaming sinks and fine-grained ingestion leave thousands of
    KB-sized files; every query then pays file-open + footer-read per
    file and the driver's file index balloons. Compaction reads the
    directory, coalesces to ceil(bytes/target) output files, and
    atomically swaps the directory. Returns the new file count.

    At warehouse scale this runs per partition directory (bounded
    work, partition-parallel); the full-directory form here is the
    single-table case.
    """
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "._compacting"
    df.coalesce(n_files).write.mode("overwrite").parquet(staging)
    backup = path.rstrip("/") + "._precompact"
    shutil.move(path, backup)
    shutil.move(staging, path)
    shutil.rmtree(backup)
    return n_files
