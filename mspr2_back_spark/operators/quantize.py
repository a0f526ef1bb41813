"""Scalar (int8-style) quantization audit for embedding columns.

At 100 TB an fp32 embedding column is usually stored quantized (4×
smaller, and most ANN indexes score int8 directly). This operator
measures what that costs: per-dimension affine quantization to
QUANT_LEVELS+1 codes against the GLOBAL per-dimension min/max, then
the per-vector L1 reconstruction error, aggregated per label.

Plan shape (the part that matters at scale):
- the per-dimension min/max reduce in ONE global aggregate row (128
  agg expressions over 64 dims — partial map-side, one row crosses
  the wire) broadcast back on a constant key;
- encode/decode/error is a single index-fold expression per row
  (sequence → transform → aggregate), entirely JVM-side;
- the per-label result relation is label-sized.

Determinism: every arithmetic step is double-precision in a FIXED
textual order shared with the DuckDB oracle via
``quant_err_term_sql`` (floor(x + 0.5) is the portable round — bare
int CASTs truncate in Spark but round in DuckDB); the per-vector
error is rounded to 6 dp BEFORE the DECIMAL cast so the
decimal-sum is exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 255 codes (0..254): symmetric around the midpoint like int8's
# practical range; span/254 is the step.
QUANT_LEVELS = 254
DIM = 64


def quant_err_term_sql(x: str, mn: str, mx: str) -> str:
    """|x - dequant(quant(x))| for one element — engine-portable SQL.

    ``{x}/{mn}/{mx}`` are element expressions. The degenerate
    zero-span dimension reconstructs exactly (error 0, written as
    abs(x - mn) so the expression stays branch-for-branch identical
    on both engines).
    """
    span = f"({mx} - {mn})"
    code = f"FLOOR(({x} - {mn}) / {span} * {QUANT_LEVELS} + 0.5)"
    recon = f"({mn} + {code} / {QUANT_LEVELS} * {span})"
    return (
        f"CASE WHEN {mx} = {mn} THEN abs({x} - {mn}) "
        f"ELSE abs({x} - {recon}) END"
    )


def int8_quantize_stats(
    vectors: DataFrame, dim: int = DIM, label_col: str = "label"
) -> DataFrame:
    """Per-label L1 reconstruction-error audit of global-range
    scalar quantization."""
    xs = vectors.select(
        label_col,
        F.expr("transform(embedding, e -> CAST(e AS DOUBLE))").alias("xs"),
    )
    stats = xs.agg(
        F.array(
            *[F.min(F.element_at("xs", i)) for i in range(1, dim + 1)]
        ).alias("mn"),
        F.array(
            *[F.max(F.element_at("xs", i)) for i in range(1, dim + 1)]
        ).alias("mx"),
    )
    key = F.spark_partition_id() * 0 + 1
    term = quant_err_term_sql(
        "element_at(xs, i)", "element_at(mn, i)", "element_at(mx, i)"
    )
    verr = F.round(
        F.expr(
            f"aggregate(transform(sequence(1, {dim}), i -> {term}), "
            "CAST(0 AS DOUBLE), (a, b) -> a + b)"
        ),
        6,
    )
    return (
        xs.withColumn("_k", key)
        .join(F.broadcast(stats.withColumn("_k", key)), "_k")
        .select(label_col, verr.alias("verr"))
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("verr").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_abs_err"),
            F.max("verr").alias("max_abs_err"),
        )
        .orderBy(label_col)
    )
