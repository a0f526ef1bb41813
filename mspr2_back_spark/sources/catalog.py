"""Catalog introspection + JDBC connectivity (SURVEY §2.1 S3/S5/S8).

The reference introspects its warehouse (list tables / encodings, ref
app/database/db.py:18-20, app/main.py:27-28) and moves data over JDBC
(read: ref app/routes/data.py:52; append sink: ref app/etl.py:170-172).
Spark-native equivalents:

- introspection → ``spark.catalog`` (works for temp views, managed
  bucketed tables, and external metastores alike);
- JDBC scan → ``spark.read.jdbc`` with explicit partitioning so the
  read parallelizes (a single-connection JDBC scan is the classic
  accidental bottleneck);
- JDBC sink → ``df.write.jdbc``; one connection per partition, so the
  write parallelism = partition count.

No database ships in this container, so the JDBC paths are exercised
only by construction (argument plumbing); the catalog paths are fully
tested against temp views and managed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def list_tables(spark: SparkSession, pattern: str | None = None) -> list[str]:
    """Names of all catalog-visible tables/views (S8)."""
    tables = spark.catalog.listTables()
    names = [t.name for t in tables]
    if pattern is not None:
        names = [n for n in names if pattern in n]
    return sorted(names)


def table_columns(spark: SparkSession, table: str) -> dict[str, str]:
    """column → dataType for one table (the reference's encoding probe
    generalized to schema introspection)."""
    return {c.name: c.dataType for c in spark.catalog.listColumns(table)}


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 16,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC scan (S3): ``num_partitions`` concurrent range
    queries on ``partition_column`` instead of one fat cursor."""
    return spark.read.jdbc(
        url=url,
        table=table,
        column=partition_column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties=properties or {},
    )


def write_jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict[str, str] | None = None
) -> None:
    """JDBC append sink (S5; ref app/etl.py:170-172). Write
    parallelism is the DataFrame's partition count — repartition
    upstream to match what the target database can absorb."""
    df.write.jdbc(url=url, table=table, mode="append", properties=properties or {})
