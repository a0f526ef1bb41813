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

# Deterministic HyperLogLog geometry, shared by the batch query
# (plans/sketches.hll_distinct_users), the streaming twin
# (streaming/events.hll_registers_live), and the DuckDB oracle.
HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_SUFFIX_NIBBLES = 12  # 48-bit rho window after the register byte
HLL_RHO_MAX = 4 * HLL_SUFFIX_NIBBLES + 1
# 2^RHO_MAX scaling turns SUM(2^-M_j) into an exact BIGINT: each
# register contributes 2^(RHO_MAX - M_j), empty ones 2^RHO_MAX.
HLL_SCALE = 1 << HLL_RHO_MAX


def hll_register_cols(key: Column) -> tuple[Column, Column]:
    """(register, rho) columns for the deterministic HLL: md5(key)
    hex nibbles 1–2 pick one of 256 registers; nibbles 3–14 form a
    48-bit window whose leading-zero count (+1) is rho. Engine-
    portable md5 arithmetic — the DuckDB oracle mirrors it with
    strpos nibble decoding, and a streaming MAX over (window, reg)
    is exactly the HLL merge, so per-window register sets drained
    from a stream max-merge into the corpus registers."""
    h = F.md5(key.cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    sfx = F.substring(h, 3, HLL_SUFFIX_NIBBLES)
    lz = F.length(F.regexp_extract(sfx, "^(0*)", 1))
    fnz = F.conv(sfx.substr(lz + F.lit(1), F.lit(1)), 16, 10).cast("int")
    clz = (
        F.when(fnz >= 8, F.lit(0))
        .when(fnz >= 4, F.lit(1))
        .when(fnz >= 2, F.lit(2))
        .otherwise(F.lit(3))
    )
    rho = (
        F.when(lz >= HLL_SUFFIX_NIBBLES, F.lit(HLL_RHO_MAX))
        .otherwise(lz * 4 + clz + 1)
        .cast("int")
    )
    return reg, rho


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

    Non-key probe columns ride along (r18): they join the grouping
    key, so a caller whose probe relation already carries per-key
    facts (e.g. the exact count next to the estimate) gets them back
    without a second join against the probe source. Groups are
    unchanged whenever the extras are functionally dependent on the
    key — the caller's contract, same as any SQL GROUP BY.
    """
    carry = [c for c in probes.columns if c != key_col]
    pcells = probes.select(
        key_col,
        *carry,
        F.explode(_cell_structs(F.col(key_col), depth, width)).alias("e"),
    ).select(
        key_col, *carry, F.col("e.h").alias("h"), F.col("e.bucket").alias("bucket")
    )
    return (
        pcells.join(F.broadcast(sketch), ["h", "bucket"], "left")
        .groupBy(key_col, *carry)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
