"""Engine-portable Bloom filter — scan-side join pruning.

The 100 TB use: before shuffling a fact table into a join, test each
row's key against a Bloom filter built from the (much smaller) other
side and drop non-members at the SCAN — the shuffle then carries
only plausible matches. Spark's own runtime does this opaquely
(`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator
is the EXPLICIT, deterministic, cross-engine-reproducible version:
bit positions are md5-nibble hashes
(operators/sampling.portable_hash_bucket), so a SQL oracle — or a
different engine resuming the pipeline — reproduces the exact same
filter, false positives included.

Representation: the filter is a relation of SET bit positions
(h, pos) — at most n_hashes × n_bits rows, broadcastable — rather
than a packed bitmap. Semantically identical (a key passes iff ALL
its n_hashes positions are present), mergeable by UNION/distinct,
and join-able without any binary-format plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mspr2_back_spark.operators.sampling import portable_hash_bucket

BLOOM_HASHES = 3
BLOOM_BITS = 2048


def _positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    return [
        portable_hash_bucket(key, salt=f"bf{i}", buckets=n_bits)
        for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_hashes: int = BLOOM_HASHES,
    n_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Set-bit relation (h, pos) for the key set — ≤ n_hashes ×
    n_bits rows however large the build side; one scan + one
    distinct on the tiny keyspace. Merge two filters with
    union().distinct()."""
    pos = _positions(F.col(key_col), n_hashes, n_bits)
    cells = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("h"), p.alias("pos"))
                    for i, p in enumerate(pos)
                ]
            )
        ).alias("e")
    )
    return cells.select("e.h", "e.pos").distinct()


def bloom_flag(
    probe: DataFrame,
    bits: DataFrame,
    key_col: str,
    n_hashes: int = BLOOM_HASHES,
    n_bits: int = BLOOM_BITS,
    flag_col: str = "pass_bloom",
) -> DataFrame:
    """Annotate each probe row with membership-possible: TRUE iff
    ALL n_hashes bit positions of the key are set. n_hashes broadcast
    left joins against per-row slices of the bits relation — the
    probe side never shuffles (the whole point of the prefilter).
    Filter on the flag to get the pruned scan."""
    out = probe
    hits = []
    for i, p in enumerate(_positions(F.col(key_col), n_hashes, n_bits)):
        bi = bits.filter(F.col("h") == i).select(
            F.col("pos").alias(f"_bfp{i}"), F.lit(1).alias(f"_bfhit{i}")
        )
        out = out.withColumn(f"_bfp{i}", p).join(
            F.broadcast(bi), f"_bfp{i}", "left"
        )
        hits.append(F.col(f"_bfhit{i}").isNotNull())
    flag = hits[0]
    for h in hits[1:]:
        flag = flag & h
    out = out.withColumn(flag_col, flag)
    return out.drop(
        *[f"_bfp{i}" for i in range(n_hashes)],
        *[f"_bfhit{i}" for i in range(n_hashes)],
    )
