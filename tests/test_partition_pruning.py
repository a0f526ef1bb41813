"""Plan-shape tests: partition pruning and predicate pushdown — the
properties that bound scan cost at 100 TB (sources/partitioned.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mspr2_back_spark.sources.partitioned import (
    read_partitioned,
    scan_plan,
    write_partitioned,
)
from mspr2_back_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def year_partitioned_orders(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_year")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_partitioned(orders, path, ["o_year"])
    return path


def test_partition_filter_reaches_plan(spark, year_partitioned_orders):
    df = read_partitioned(spark, year_partitioned_orders).filter(F.col("o_year") == 2001)
    plan = scan_plan(df)
    assert "PartitionFilters" in plan
    # The year predicate must appear as a partition filter (directory
    # pruning), NOT as a data filter evaluated per row.
    pf = next(line for line in plan.splitlines() if "PartitionFilters" in line)
    assert "o_year" in pf.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_pruned_scan_reads_fewer_files(spark, year_partitioned_orders):
    all_years = read_partitioned(spark, year_partitioned_orders)
    one_year = all_years.filter(F.col("o_year") == 2001)
    def n_files(df):
        return df.select(F.input_file_name()).distinct().count()
    assert n_files(one_year) < n_files(all_years)
    # Correctness: pruning loses no rows.
    assert one_year.count() == all_years.filter(F.col("o_year") == 2001).count()


def test_data_filter_pushdown_to_parquet(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderstatus")
    plan = scan_plan(orders)
    assert "PushedFilters" in plan
    pushed = next(line for line in plan.splitlines() if "PushedFilters" in line)
    assert "o_orderstatus" in pushed.split("PushedFilters", 1)[1]


def test_column_pruning_in_read_schema(spark, sf_dir):
    two_cols = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = scan_plan(two_cols)
    rs = next(line for line in plan.splitlines() if "ReadSchema" in line)
    schema_part = rs.split("ReadSchema:", 1)[1]
    assert "l_orderkey" in schema_part and "l_quantity" in schema_part
    # A 16-column table projected to 2 must not read the rest.
    assert "l_extendedprice" not in schema_part and "l_shipdate" not in schema_part


def test_compact_parquet(spark, sf_dir, tmp_path):
    from mspr2_back_spark.sources.partitioned import compact_parquet

    path = str(tmp_path / "fragmented")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(path)  # 64 small files
    import glob
    assert len(glob.glob(f"{path}/part-*.parquet")) == 64
    before = orders.count()

    n = compact_parquet(spark, path, target_file_mb=256)
    files_after = glob.glob(f"{path}/part-*.parquet")
    assert len(files_after) == n == 1  # tiny table -> one file
    after = spark.read.parquet(path)
    assert after.count() == before
    assert sorted(after.columns) == sorted(orders.columns)
