"""Sampling operators for training-data curation.

Two families with different guarantees:

- ``hash_sample``: DETERMINISTIC content-keyed sampling — a row is in
  or out based only on its key's hash, independent of partitioning,
  cluster size, or run order. This is the reproducible-split
  primitive (train/val/test, A/B cohorts): reruns and backfills land
  every row on the same side. Sampling rate precision is 1/10000.
- ``stratified_sample``: per-stratum Bernoulli sampling via
  ``sampleBy`` — statistically sized (not exact counts), seeded.
  Use for downsampling over-represented strata (language, source,
  quality band) in a corpus.

Scale: both are scan-side filters — no shuffle, no driver state; the
hash sample pushes nothing to the driver and never materializes the
population.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash (deterministic:
    the same key always lands on the same side, any partitioning)."""
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string"), F.lit(salt)), F.lit(10000))
    return df.filter(bucket < int(fraction * 10000))


def train_val_test_split(
    df: DataFrame, key_col: str, val_fraction: float = 0.1, test_fraction: float = 0.1
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic 3-way split by key hash —
    the same row set partitions identically on every rerun."""
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(10000))
    val_hi = int(val_fraction * 10000)
    test_hi = val_hi + int(test_fraction * 10000)
    val = df.filter(bucket < val_hi)
    test = df.filter((bucket >= val_hi) & (bucket < test_hi))
    train = df.filter(bucket >= test_hi)
    return train, val, test


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (``sampleBy``); strata absent from
    ``fractions`` are dropped — the rebalance-a-skewed-corpus shape."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)


def portable_hash_bucket(key, salt: str = "", buckets: int = 65536):
    """Deterministic ENGINE-PORTABLE bucket in [0, buckets): leading
    hex nibbles of md5(key || '|' || salt) — md5 is md5 everywhere,
    so an external engine (or a SQL oracle) reproduces the exact
    bucket with string functions alone. Use where reproducibility
    must survive an engine swap; ``hash_sample``'s xxhash64 is faster
    when it only has to survive reruns.

    The nibble count adapts to ``buckets``: enough hex digits that
    the value space covers the bucket count (4 nibbles for the
    default 65,536; up to 15 ⇒ 2^60 buckets). Asking for more than
    65,536 buckets WORKS (r5 — previously the 4-nibble space silently
    aliased) and matters when one bucket is too coarse a grain:
    ``token_budget_sample``'s expected budget overshoot is one bucket
    ≈ corpus_tokens/buckets per source, ~1.5 GB of tokens at 100 TB
    with the default — at buckets=2^24 it drops to ~6 MB, while the
    (source × buckets) histogram stays far below data scale. Buckets
    that are a power of two divide the 16^nibbles value space evenly
    (zero modulo bias); other counts carry bias ≤ buckets/16^nibbles.
    """
    nibbles = 4
    while (1 << (4 * nibbles)) < buckets and nibbles < 15:
        nibbles += 1
    if buckets > (1 << (4 * nibbles)):
        raise ValueError(f"buckets={buckets} exceeds the 15-nibble md5 space")
    hexes = F.substring(
        F.md5(F.concat(key.cast("string"), F.lit("|" + salt))), 1, nibbles
    )
    out_type = "int" if buckets <= (1 << 31) else "bigint"
    return F.pmod(F.conv(hexes, 16, 10).cast("bigint"), F.lit(buckets)).cast(
        out_type
    )


def mixture_sample(
    df: DataFrame, rate_col, key_col: str, salt: str = "mix"
) -> DataFrame:
    """Domain-mixture (re)weighting: keep each row with probability
    ``rate_col`` (any per-row expression, e.g. a per-source rate),
    decided by the portable key hash — the deterministic version of
    the per-domain sampling every corpus mixing recipe needs.
    Scan-side filter: no shuffle, no driver state."""
    bucket = portable_hash_bucket(F.col(key_col), salt)
    # floor() explicitly: a bare int cast truncates in Spark but
    # ROUNDS in some engines' CAST (DuckDB), so non-dyadic rates
    # (0.1 * 65536 = 6553.6) would disagree on boundary buckets.
    return df.filter(bucket < F.floor(rate_col * 65536).cast("int"))


def token_budget_sample(
    docs: DataFrame,
    budget_per_source: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 65536,
    salt: str = "budget",
) -> DataFrame:
    """Per-source token-budget curation: keep a deterministic random
    subset of each source whose total token count stays within
    ``budget_per_source`` — the capping step of a training-mix recipe
    ("at most N tokens from each domain").

    Selection is by whole md5 hash buckets, granted in bucket order
    while the source's cumulative token count stays within budget —
    NOT by a per-source sorted prefix scan. That choice is the 100 TB
    design: the only shuffle aggregates (source, bucket) token sums —
    at most ``sources × n_buckets`` rows regardless of corpus size —
    the prefix sum runs over that tiny relation, and the per-source
    cutoff joins back by broadcast so the final keep/drop is a
    scan-side filter. Budget adherence is exact to bucket granularity
    (expected overshoot ≤ one bucket ≈ corpus_tokens / n_buckets per
    source); membership is content-keyed (md5 of the id), so reruns,
    backfills, and engine swaps keep the identical subset.

    Returns the kept docs with their token counts:
    (source, doc_id, n_tokens, bucket).
    """
    from pyspark.sql import Window as W

    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(F.expr(f"array_remove(split({text_col}, ' '), '')")).alias(
            "n_tokens"
        ),
        portable_hash_bucket(F.col(id_col), salt, n_buckets).alias("bucket"),
    )
    hist = toks.groupBy("source", "bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    cum = F.sum("bucket_tokens").over(
        W.partitionBy("source").orderBy("bucket")
    )
    cutoffs = (
        hist.withColumn("cum_tokens", cum)
        .filter(F.col("cum_tokens") <= budget_per_source)
        .groupBy("source")
        .agg(F.max("bucket").alias("cutoff_bucket"))
    )
    return toks.join(F.broadcast(cutoffs), "source").filter(
        F.col("bucket") <= F.col("cutoff_bucket")
    ).select("source", "doc_id", "n_tokens", "bucket")
