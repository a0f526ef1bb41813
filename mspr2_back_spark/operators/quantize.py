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


def conforming(vectors: DataFrame, dim: int) -> DataFrame:
    """Rows whose embedding has exactly ``dim`` components.

    The fixed-width contract (similarity._block_pair_scorer's rule,
    extended here in round 15): dirty rows — NULL vectors, wrong
    dimensions, empty arrays — are silently EXCLUDED from
    quantization stats, audits, and serving output instead of
    killing the job. Without this filter every ``element_at(xs, i)``
    for i past a short array's length throws
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode, so ONE
    corrupt row aborted the whole scan (found by the round-15
    dirty-corpus probe; the r14 record had wrongly assumed these
    pure-SQL paths were total). A scan-side Filter node, fully
    pushdown-eligible; on a clean corpus it passes every row, so
    values are untouched."""
    return vectors.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == dim)
    )


def quant_recon_sql(x: str, mn: str, mx: str) -> str:
    """dequant(quant(x)) for one element — engine-portable SQL.
    Degenerate zero-span dimensions reconstruct as mn (exact)."""
    span = f"({mx} - {mn})"
    code = f"FLOOR(({x} - {mn}) / {span} * {QUANT_LEVELS} + 0.5)"
    recon = f"({mn} + {code} / {QUANT_LEVELS} * {span})"
    return f"CASE WHEN {mx} = {mn} THEN {mn} ELSE {recon} END"


def quant_err_term_sql(x: str, mn: str, mx: str) -> str:
    """|x - dequant(quant(x))| for one element — engine-portable SQL.

    ``{x}/{mn}/{mx}`` are element expressions; built on
    quant_recon_sql so the serving path (ann over dequantized codes)
    and the audit share one reconstruction definition.
    """
    return f"abs({x} - {quant_recon_sql(x, mn, mx)})"


def minmax_stats(vectors: DataFrame, dim: int = DIM) -> DataFrame:
    """The one-row per-dimension (mn, mx) array relation every
    quantization consumer (audit + int8 serving) broadcasts.
    Non-conforming rows are excluded (see ``conforming``)."""
    xs = conforming(vectors, dim).select(
        F.expr("transform(embedding, e -> CAST(e AS DOUBLE))").alias("xs")
    )
    return xs.agg(
        F.array(
            *[F.min(F.element_at("xs", i)) for i in range(1, dim + 1)]
        ).alias("mn"),
        F.array(
            *[F.max(F.element_at("xs", i)) for i in range(1, dim + 1)]
        ).alias("mx"),
    )


def int8_quantize_stats(
    vectors: DataFrame, dim: int = DIM, label_col: str = "label"
) -> DataFrame:
    """Per-label L1 reconstruction-error audit of global-range
    scalar quantization. Non-conforming rows are excluded from both
    the stats and the audited population (see ``conforming``)."""
    xs = conforming(vectors, dim).select(
        label_col,
        F.expr("transform(embedding, e -> CAST(e AS DOUBLE))").alias("xs"),
    )
    stats = minmax_stats(vectors, dim)
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


def quantized_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    dim: int = DIM,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k over the DEQUANTIZED int8 codes — the
    compressed serving path (score what the index would actually
    store, 4× smaller than fp32).

    Same plan as similarity.brute_force_topk (broadcast query,
    scan-side fold scoring, TakeOrderedAndProject) with the
    embedding replaced by its quantize→dequantize image; the
    reconstruction expression is the audit's quant_recon_sql
    template, so serving and audit can never drift. Ranking quality
    vs the fp32 path is pinned by the recall test in
    tests/test_workloads.py.

    Non-conforming corpus rows are excluded (``conforming``); a
    non-conforming (or missing) QUERY id therefore yields an EMPTY
    result — defined behavior, not a crash. This INTENTIONALLY
    differs from ``ivf_topk``, which raises ValueError for the same
    condition (r15 ADVICE asked to align or document; documented):
    ``ivf_topk`` already materializes the query vector driver-side
    to select probe cells, so validating it there is free — raising
    costs nothing the path doesn't already pay. This path has no
    driver-side materialization point: it is ONE fully-lazy
    declarative plan (scan → broadcast-joined stats → broadcast
    query → TakeOrderedAndProject), and detecting an empty query
    relation would require adding a blocking point-lookup job to
    every serving call just to upgrade empty→error. Empty-result is
    the cheapest correct contract for a lazy plan; callers that
    need fail-loud semantics check ``result.count() == 0`` (or
    validate the id upfront), paying the extra job only when they
    want it. Pinned by test_quantized_topk_dirty_query_contract.
    """
    from mspr2_back_spark.operators.similarity import dot_col, norm_col

    recon = quant_recon_sql(
        "element_at(xs, i)", "element_at(mn, i)", "element_at(mx, i)"
    )
    dq_expr = F.expr(f"transform(sequence(1, {dim}), i -> {recon})")
    stats = minmax_stats(vectors, dim)
    key = F.spark_partition_id() * 0 + 1
    base = (
        conforming(vectors, dim).select(
            id_col,
            "label",
            F.expr("transform(embedding, e -> CAST(e AS DOUBLE))").alias("xs"),
        )
        .withColumn("_k", key)
        .join(F.broadcast(stats.withColumn("_k", key)), "_k")
        .withColumn("dq", dq_expr)
        .drop("_k", "xs", "mn", "mx")
    )
    q = base.filter(F.col(id_col) == query_id).select(
        F.col("dq").alias("q_dq"), norm_col("dq", dim).alias("q_norm")
    )
    scored = (
        base.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            "label",
            F.round(
                dot_col("dq", "q_dq") / (norm_col("dq", dim) * F.col("q_norm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)
