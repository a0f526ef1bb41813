"""Property-based tests (hypothesis) for the semantic traps in
SURVEY §5.4 / §7.4: lag-diff reconstruction, bucketed totals
preservation, explode cardinality, dedup/upsert algebra.

Each property runs a real Spark plan on generated data — examples are
capped small because every example is a Spark job; the properties,
not the data volume, carry the coverage.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mspr2_back_spark.operators.crud import upsert
from mspr2_back_spark.operators.dedup import exact_duplicates

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

series = st.lists(
    st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30
)


@given(cumulative=series.map(sorted))
@_settings
def test_lag_diff_reconstructs_cumulative(spark, cumulative):
    """W1 (ref app/etl.py:122-131): daily = cum - lag(cum); the sum of
    derived dailies (with the first value as seed) equals the last
    cumulative — no counts invented or lost."""
    rows = [(i, int(c)) for i, c in enumerate(cumulative)]
    df = spark.createDataFrame(rows, "day int, cum long")
    win = W.orderBy("day")
    daily = df.select(
        F.coalesce(F.col("cum") - F.lag("cum").over(win), F.col("cum")).alias("daily")
    )
    total = daily.agg(F.sum("daily")).first()[0]
    assert total == cumulative[-1]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=365 * 3),  # day offset
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=40,
    )
)
@_settings
def test_week_buckets_preserve_grand_total(spark, rows):
    """A2/F2 (ref app/etl.py:111-117): rebucketing by date_trunc(week)
    must preserve the grand total exactly."""
    df = spark.createDataFrame(rows, "day_offset int, v long").select(
        F.date_add(F.lit("2020-01-01").cast("date"), F.col("day_offset")).alias("d"),
        "v",
    )
    weekly = df.groupBy(F.date_trunc("week", "d").alias("w")).agg(
        F.sum("v").alias("wv")
    )
    assert weekly.agg(F.sum("wv")).first()[0] == sum(v for _, v in rows)


@given(
    arrays=st.lists(
        st.lists(st.text(alphabet="abc", max_size=3), max_size=5),
        min_size=1,
        max_size=15,
    )
)
@_settings
def test_explode_preserves_element_count(spark, arrays):
    """F7 (ref app/etl.py:137): explode emits exactly one row per
    array element."""
    df = spark.createDataFrame([(a,) for a in arrays], "arr array<string>")
    n = df.select(F.explode("arr")).count()
    assert n == sum(len(a) for a in arrays)


@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=-(2**62), max_value=2**62),
        max_size=15,
    ),
    updates=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=-(2**62), max_value=2**62),
        max_size=15,
    ),
)
@_settings
def test_upsert_is_dict_merge(spark, base, updates):
    """upsert == dict-merge semantics, and applying the same updates
    twice is idempotent."""
    if not base and not updates:
        return
    bdf = spark.createDataFrame(list(base.items()) or [(None, None)], "k int, v long").filter(
        F.col("k").isNotNull()
    )
    udf_ = spark.createDataFrame(list(updates.items()) or [(None, None)], "k int, v long").filter(
        F.col("k").isNotNull()
    )
    once = upsert(bdf, udf_, ["k"])
    twice = upsert(once, udf_, ["k"])
    expected = {**base, **updates}
    assert {r.k: r.v for r in once.collect()} == expected
    assert {r.k: r.v for r in twice.collect()} == expected


@given(
    texts=st.lists(st.text(alphabet="xy ", min_size=0, max_size=8), min_size=1, max_size=20)
)
@_settings
def test_exact_dedup_partitions_corpus(spark, texts):
    """exact_duplicates: the multiplicity column sums to the corpus
    size and every group's keeper is one of its members."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    groups = exact_duplicates(df).collect()
    assert sum(g.n_copies for g in groups) == len(texts)
    assert len(groups) == len(set(texts))
