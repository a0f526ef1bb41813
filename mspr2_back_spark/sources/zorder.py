"""Z-order (Morton-interleaved) file layout for multi-column data
skipping.

Hive partitioning prunes on ONE low-cardinality key and bucketing
co-locates ONE join key; neither helps when queries filter on two
independent numeric/date ranges (ts AND value, lat AND lon). Sorting
files by an interleaved-bit Morton code makes every file's parquet
min/max footer stats tight on BOTH columns at once, so predicate
pushdown skips most files/row-groups for either (or both)
predicates — the layout trick Delta OPTIMIZE ZORDER and Iceberg's
sort orders apply at warehouse scale.

Mechanics here:
- each column is affinely scaled to a ``bits``-wide integer grid
  against its GLOBAL min/max (one scalar-aggregate row broadcast
  back on a constant key — no driver collect). Linear scaling is
  skew-sensitive: a heavy-tailed column wastes grid cells (the
  production refinement is equi-depth boundaries, e.g. via
  operators/quantiles.py); the interleave itself is unchanged.
- grid coordinates interleave bit-by-bit into one BIGINT z-code via
  a generated shift/mask expression (pure codegen, no UDF).
- the frame is range-partitioned on the z-code (sampled range
  exchange — balanced output files) and sorted within partitions,
  then written; each output file covers one compact Z-curve segment,
  i.e. a small hyper-rectangle of the value space.

Scale note: the only corpus-sized exchange is the range partition —
exactly the shuffle any explicit re-layout pays; everything else is
scan-side arithmetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def _grid(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Scale ``col`` onto [0, 2^bits) against broadcast min/max.
    Degenerate (constant) columns land on cell 0."""
    levels = (1 << bits) - 1
    span = mx - mn
    scaled = F.floor((col.cast("double") - mn) / span * levels + 0.5)
    return (
        F.when(span == 0, F.lit(0)).otherwise(scaled).cast("bigint")
    )


def morton_code(grids: Sequence[Column], bits: int = ZORDER_BITS) -> Column:
    """Interleave ``len(grids)`` grid coordinates bit-by-bit (column
    j's bit i lands at position i*n+j). Generated shift/mask
    expression — whole-stage codegen, no Python. Total output bits
    = bits * n_cols must fit a BIGINT (<= 62)."""
    n = len(grids)
    if bits * n > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows BIGINT")
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, g in enumerate(grids):
            out = out + F.shiftleft(
                F.shiftright(g, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = ZORDER_BITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``
    (numeric/date/timestamp — anything castable to double)."""
    mins = [F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)]
    maxs = [F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)]
    stats = df.agg(*mins, *maxs)
    key = F.spark_partition_id() * 0 + 1
    gridded = df.withColumn("_k", key).join(
        F.broadcast(stats.withColumn("_k", key)), "_k"
    )
    grids = [
        _grid(F.col(c), F.col(f"mn_{i}"), F.col(f"mx_{i}"), bits)
        for i, c in enumerate(cols)
    ]
    zed = gridded.withColumn("_z", morton_code(grids, bits)).drop(
        "_k", *[f"mn_{i}" for i in range(len(cols))], *[f"mx_{i}" for i in range(len(cols))]
    )
    (
        zed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def files_needed(
    path: str, predicates: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """Count the parquet files a stats-aware reader must open for a
    conjunctive range query: a file can be skipped iff its footer
    [min, max] box misses the predicate box on ANY column — the
    file-level pruning rule Delta/Iceberg/DuckDB apply (and Spark's
    parquet reader applies per row group). Returns (files_needed,
    files_total) from the real footers, no engine in the loop —
    the measurement that closes the Z-order loop: footer-span ratios
    say files are TIGHT, this says how many a query actually READS.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    needed = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin: dict[str, float] = {}
        fmax: dict[str, float] = {}
        # a column whose stats are missing/unusable in ANY row group
        # cannot prune the file — a real reader must open what it
        # cannot rule out, so such columns are excluded from the
        # skip test below (r7, ADVICE fix: the old code counted a
        # stats-less file as skippable, overstating pruning).
        unusable: set[str] = set()
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in predicates:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    unusable.add(name)
                    continue
                v_lo = float(st.min)
                v_hi = float(st.max)
                fmin[name] = min(fmin.get(name, v_lo), v_lo)
                fmax[name] = max(fmax.get(name, v_hi), v_hi)
        # skippable iff SOME predicate column with complete stats has
        # a [min, max] box disjoint from its predicate range
        skippable = any(
            name in fmin
            and name not in unusable
            and (fmax[name] < lo or fmin[name] > hi)
            for name, (lo, hi) in predicates.items()
        )
        needed += 0 if skippable else 1
    return needed, len(files)
