"""Oracle-diff correctness suite (SURVEY §5 strategy #2).

Mirrors the driver's t2 gate: run every declared query through both
the Spark engine and DuckDB over identical parquet inputs, then
compare row count, column names, and values (rows sorted, columns
sorted by name). Floats must agree to 1e-9 relative — the decimal
aggregation discipline (functions/numeric.py) makes them bit-equal in
practice.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mspr2_back_spark.plans import ORACLE_SQL, QUERIES
from mspr2_back_spark.sources.readers import TESTDATA_TABLES

SQL_KEYS = sorted(ORACLE_SQL)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(rows, ncols):
    def key(r):
        return tuple("\0" if v is None else str(v) for v in r)

    return sorted((tuple(r) for r in rows), key=key)


def _vals_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(row[c] for c in spark_cols) for row in sdf.collect()
    ]

    con = _duck(sf_dir)
    rel = con.sql(ORACLE_SQL[name])
    duck_cols_orig = list(rel.columns)
    order = sorted(range(len(duck_cols_orig)), key=lambda i: duck_cols_orig[i])
    duck_cols = [duck_cols_orig[i] for i in order]
    duck_rows = [tuple(r[i] for i in order) for r in rel.fetchall()]
    con.close()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s_sorted = _canon(spark_rows, len(spark_cols))
    d_sorted = _canon(duck_rows, len(duck_cols))
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            if not _vals_equal(sv, dv):
                mismatches.append((i, spark_cols[c], sv, dv))
    assert not mismatches, f"{name}: value mismatches (first 10): {mismatches[:10]}"


def test_all_queries_have_entry():
    missing = [k for k in ORACLE_SQL if k not in QUERIES]
    assert not missing, f"oracle without query: {missing}"
