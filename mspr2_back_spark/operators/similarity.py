"""Similarity search over embedding columns (array<float>).

Everything is expression-level (zip_with/aggregate folds inside
whole-stage codegen) — no Python in the scoring loop. Dot products
fold left-to-right in DOUBLE so results are bit-reproducible across
engines and cluster layouts.

Scale story:
- `brute_force_topk` broadcasts the (tiny) query vector and plans a
  TakeOrderedAndProject — a single scan, no shuffle, linear in corpus
  size. Correct baseline at any scale, too slow past ~10⁸ vectors.
- `cosine_pairs` precomputes norms once, then prunes pairs by id
  order. All-pairs is the exact verifier; at 100 TB you run it only
  inside LSH/IVF buckets.
- `hyperplane_lsh_*` is the scale path: sign-random-projection
  bucketing with hyperplanes derived from md5 (deterministic,
  engine-portable, no state to ship). Search cost drops to one
  bucket; at cluster scale you'd repartition by bucket and serve
  lookups partition-locally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
NORM = "sqrt(aggregate({a}, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"


def norm_col(vec: str) -> Column:
    return F.expr(NORM.format(a=vec))


def cosine(a: str, b: str, norm_a: str, norm_b: str) -> Column:
    return F.expr(DOT.format(a=a, b=b)) / (F.col(norm_a) * F.col(norm_b))


def brute_force_topk(
    vectors: DataFrame, query_id: int, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k for one stored query vector.

    The query row is broadcast; scoring is one scan with a fold per
    row; top-k plans as TakeOrderedAndProject (per-partition heaps,
    no global sort)."""
    q = vectors.filter(F.col(id_col) == query_id).select(
        F.col("embedding").alias("q_embedding")
    )
    scored = (
        vectors.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            "label",
            F.round(
                F.expr(DOT.format(a="embedding", b="q_embedding"))
                / (norm_col("embedding") * norm_col("q_embedding")),
                6,
            ).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def cosine_pairs(
    vectors: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """All-pairs cosine near-duplicate detection (exact).

    Norms are computed once per vector before the join — the pair
    stage reuses them instead of recomputing 2N² folds."""
    v = vectors.select(
        F.col(id_col).alias("vid"),
        "embedding",
        norm_col("embedding").alias("nrm"),
    )
    a, b = v.alias("a"), v.alias("b")
    sim = F.round(
        F.expr(DOT.format(a="a.embedding", b="b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_id_1"),
            F.col("b.vid").alias("vec_id_2"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _hyperplane_sign(vec: str, plane: int, dim: int) -> str:
    """±1 hyperplane dot-product sign, plane derived from md5 so both
    engines (and every rerun) see identical hyperplanes.

    Component i of plane p is +1 iff the high bit of md5('p_i')'s
    first nibble is set. The projection is then a signed sum of vector
    components — no floats beyond the vector itself."""
    proj = (
        f"aggregate(zip_with({vec}, sequence(0, {dim - 1}), (x, i) -> "
        f"IF(instr('0123456789abcdef', substring(md5(concat('{plane}_', i)), 1, 1)) - 1 >= 8,"
        " CAST(x AS DOUBLE), -CAST(x AS DOUBLE))),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return f"IF({proj} > 0, 1, 0)"


def hyperplane_buckets(
    vectors: DataFrame, n_planes: int = 8, dim: int = 64, id_col: str = "vec_id"
) -> DataFrame:
    """Sign-random-projection LSH bucket id per vector (n_planes bits)."""
    bucket = " + ".join(
        f"({_hyperplane_sign('embedding', p, dim)} * {1 << p})" for p in range(n_planes)
    )
    return vectors.select(F.col(id_col), F.expr(bucket).cast("int").alias("bucket"))


def hyperplane_lsh_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket.

    Approximate by construction — recall depends on n_planes — but
    the scored candidate set is |bucket| ≈ N/2^planes instead of N.
    """
    buckets = hyperplane_buckets(vectors, n_planes, dim, id_col)
    with_b = vectors.join(buckets, id_col)
    q = with_b.filter(F.col(id_col) == query_id).select(
        F.col("embedding").alias("q_embedding"), F.col("bucket").alias("q_bucket")
    )
    scored = (
        with_b.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .select(
            id_col,
            "bucket",
            F.round(
                F.expr(DOT.format(a="embedding", b="q_embedding"))
                / (norm_col("embedding") * norm_col("q_embedding")),
                6,
            ).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)
