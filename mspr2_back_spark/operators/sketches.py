"""Count-min sketch: sublinear-memory frequency estimation.

The CMS (Cormode & Muthukrishnan 2005) is the streaming/distributed
answer to "how often does key k occur?" when the key space is too
large to count exactly: a depth × width counter grid, each row
indexed by an independent hash of the key; the estimate is the MIN
over rows — always ≥ the true count, and within εN of it with
probability 1-δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

Spark-first shape (the 100 TB design):

- BUILD: each input row explodes into ``depth`` (row, bucket) cells
  scan-side, then ONE hash aggregation whose map-side partial
  combine condenses every partition to at most depth × width rows —
  so the shuffle carries sketch-sized data regardless of corpus
  size. The finished sketch is depth × width rows (4 × 1024 default
  = 4096), a broadcastable relation.
- ESTIMATE: probe keys join the broadcast sketch on (row, bucket)
  and take MIN over rows — corpus never rescanned.
- MERGEABLE: two sketches with the same (depth, width, salts) merge
  by summing cell counts — the property that lets every executor /
  every day / every shard sketch independently (union + re-aggregate
  = merge).

Hashes are the engine-portable md5 nibble buckets
(operators/sampling.portable_hash_bucket) with per-row salts, so a
SQL oracle — or any other engine — reproduces the exact grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mspr2_back_spark.operators.sampling import portable_hash_bucket

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cell_structs(key: Column, depth: int, width: int) -> Column:
    """Array of (h, bucket) structs — one per hash row — for a key."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("h"),
                portable_hash_bucket(key, salt=f"cms{i}", buckets=width).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: (h, bucket, cnt) rows, one per non-empty
    cell (absent cell ≡ 0). One scan + one sketch-sized shuffle."""
    cells = df.select(
        F.explode(_cell_structs(F.col(key_col), depth, width)).alias("e")
    )
    return cells.groupBy(
        F.col("e.h").alias("h"), F.col("e.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimated count per probe key: MIN over the key's ``depth``
    cells. The sketch side broadcasts (≤ depth × width rows); probe
    keys the corpus never saw estimate as the minimum collision mass
    of their cells — 0 only when at least one of their cells is
    empty (the usual CMS one-sided overcount, never an undercount).
    """
    pcells = probes.select(
        key_col,
        F.explode(_cell_structs(F.col(key_col), depth, width)).alias("e"),
    ).select(key_col, F.col("e.h").alias("h"), F.col("e.bucket").alias("bucket"))
    return (
        pcells.join(F.broadcast(sketch), ["h", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
