"""Sources: parquet scan helpers over the driver test tables.

Reference parity (SURVEY §2.1): the reference reads CSVs all-string
with explicit casts (ref app/etl.py:59-61) and JDBC tables
(ref app/routes/data.py:52). Here the canonical storage is parquet —
columnar, splittable, statistics-bearing — which is what you'd run at
100 TB. Scans stay declarative (`spark.read.parquet`) so Catalyst
pushes filters and prunes columns into the reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Plain parquet scan: predicate pushdown,
    column pruning, and partition coalescing all apply.

    The events table carries a nanosecond parquet timestamp, which
    Spark's reader rejects by default; we read it as a long
    (``nanosAsLong``) and truncate to microseconds with exact integer
    division — the same truncation DuckDB applies, so both engines see
    identical timestamps.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf in this session; reader may already handle nanos
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so `spark.sql` queries (the
    serving layer style of the reference, ref app/routes/data.py:123-148)
    can name them directly."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
