"""Bucketed-table plan-shape tests: the no-Exchange property that
makes fact-fact joins survive 100 TB (sources/bucketing.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mspr2_back_spark.sources.bucketing import (
    bucketed_join,
    plan_has_shuffle,
    write_bucketed,
)
from mspr2_back_spark.sources.readers import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], N_BUCKETS, path=str(base / "orders")
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        N_BUCKETS,
        path=str(base / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, on=["o_orderkey"], force_merge=True)
    assert not plan_has_shuffle(joined), (
        "bucketed equi-join must not shuffle:\n"
        + joined._jdf.queryExecution().executedPlan().toString()
    )


def test_unbucketed_join_does_exchange(spark, sf_dir):
    # Control: the same join over plain parquet shuffles (or
    # broadcasts — either way the bucketed variant's plan is the only
    # one guaranteed exchange-free on two large sides).
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    joined = orders.hint("merge").join(lineitem, on=["o_orderkey"])
    assert plan_has_shuffle(joined)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert not plan_has_shuffle(agg), "groupBy on the bucket key must not shuffle"


def test_bucketed_join_correctness(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, on=["o_orderkey"]).count()
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    expected = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert got == expected
