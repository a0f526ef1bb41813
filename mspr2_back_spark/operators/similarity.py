"""Similarity search over embedding columns (array<float>).

No Python in the scoring loop: dot products and norms are single
`aggregate(zip_with(...))` expressions — a sequential left fold, so
the summation order (and therefore every double bit) matches a left
fold in any other engine. An earlier formulation generated explicit
64-term sums for whole-stage codegen; measured head-to-head (2k, 256k
and 1M × 64-dim rows) the fold is as fast or faster end-to-end: the
giant expression's parse/analyze/codegen cost dominates every run,
while the fold's per-row interpretation overhead stays in the noise
next to array access itself. Query-side norms are computed once on
the broadcast side, not per scanned row.

Scale story:
- `brute_force_topk` broadcasts the (tiny) query vector and plans a
  TakeOrderedAndProject — a single scan, no shuffle, linear in corpus
  size. Correct baseline at any scale, too slow past ~10⁸ vectors.
- `cosine_pairs` precomputes norms once, then prunes pairs by id
  order. All-pairs is the exact verifier; at 100 TB you run it only
  inside LSH/IVF buckets.
- `hyperplane_lsh_*` is the scale path: sign-random-projection
  bucketing. Hyperplanes derive from md5, so they are deterministic
  and engine-portable — the ±1 components are folded into an array
  literal at plan time (no per-row hashing at all). Search cost drops
  to one bucket; at cluster scale you'd repartition by bucket and
  serve lookups partition-locally.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIM = 64

_FOLD = "CAST(0 AS DOUBLE), (acc, v) -> acc + v"


def dot_col(a: str, b: str) -> Column:
    """Dot product as a left fold — bit-identical to summing the
    products in index order."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), {_FOLD})"
    )


def norm_col(vec: str, dim: int = DIM) -> Column:
    return F.expr(
        f"sqrt(aggregate(transform({vec}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), {_FOLD}))"
    )


def brute_force_topk(
    vectors: DataFrame, query_id: int, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k for one stored query vector.

    The query row is broadcast; scoring is one scan with a codegen'd
    expression per row; top-k plans as TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    q = vectors.filter(F.col(id_col) == query_id).select(
        F.col("embedding").alias("q_embedding"),
        norm_col("embedding").alias("q_norm"),
    )
    scored = (
        vectors.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            "label",
            F.round(
                dot_col("embedding", "q_embedding")
                / (norm_col("embedding") * F.col("q_norm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def cosine_pairs(
    vectors: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """All-pairs cosine near-duplicate detection (exact).

    The O(N²·d) scoring runs as a blocked BLAS matmul: the normalized
    comparison matrix is broadcast once (like a dim table), and each
    Arrow batch of the scan side multiplies against it in numpy.
    This is the Pandas-UDF slow-path done right — one matmul per
    batch, no per-pair Python. A BroadcastNestedLoopJoin with an
    expression-level dot product benchmarks ~50x slower here because
    nested-loop conditions aren't whole-stage-codegen'd.

    Scale: broadcasting the index bounds N at ~10⁶ vectors (0.5 GB);
    beyond that, block both sides (block-pair join keyed by block id)
    or pre-bucket with `hyperplane_buckets` and verify within
    buckets. Rounding/threshold semantics happen Spark-side so the
    output contract is identical to an in-engine formulation.
    """
    import numpy as np
    import pandas as pd

    sc = vectors.sparkSession.sparkContext
    rows = vectors.select(id_col, "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    index_bc = sc.broadcast((ids, mat))
    slack = threshold - 1e-6  # numpy prune; exact round+filter is Spark-side

    def score(batches):
        b_ids, b_mat = index_bc.value
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
            sims = a_mat @ b_mat.T
            keep = (sims >= slack) & (a_ids[:, None] < b_ids[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "vec_id_1": a_ids[ai],
                    "vec_id_2": b_ids[bj],
                    "raw_sim": sims[ai, bj],
                }
            )

    scored = vectors.select(id_col, "embedding").mapInPandas(
        score, schema="vec_id_1 BIGINT, vec_id_2 BIGINT, raw_sim DOUBLE"
    )
    return (
        scored.select(
            "vec_id_1", "vec_id_2", F.round("raw_sim", 6).alias("cosine_sim")
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _plane_signs(plane: int, dim: int) -> list[int]:
    """±1 hyperplane components, derived from md5 at PLAN time.

    Component i of plane p is +1 iff the high bit of md5('{p}_{i}')'s
    first nibble is set — the identical rule an oracle engine can
    evaluate with its own md5(), since md5 is md5 everywhere."""
    return [
        1 if hashlib.md5(f"{plane}_{i}".encode()).hexdigest()[0] in "89abcdef" else -1
        for i in range(dim)
    ]


def _hyperplane_sign(vec: str, plane: int, dim: int) -> str:
    """0/1 sign bit of the projection of `vec` onto plane `plane`.

    The ±1 components are an array literal zipped against the vector:
    x*1.0 and x*-1.0 are bit-exact ±x, and the fold sums in index
    order, so the projection equals the explicit signed sum."""
    signs = _plane_signs(plane, dim)
    lit = "array(" + ", ".join(f"{s:d}.0D" for s in signs) + ")"
    proj = (
        f"aggregate(zip_with({vec}, {lit}, (x, s) -> CAST(x AS DOUBLE) * s), {_FOLD})"
    )
    return f"IF(({proj}) > 0, 1, 0)"


def hyperplane_buckets(
    vectors: DataFrame, n_planes: int = 8, dim: int = DIM, id_col: str = "vec_id"
) -> DataFrame:
    """Sign-random-projection LSH bucket id per vector (n_planes bits)."""
    bucket = " + ".join(
        f"({_hyperplane_sign('embedding', p, dim)} * {1 << p})" for p in range(n_planes)
    )
    return vectors.select(F.col(id_col), F.expr(bucket).cast("int").alias("bucket"))


def ivf_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 3,
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means cells + probe search.

    Index build: MLlib KMeans partitions the corpus into ``n_cells``
    Voronoi cells (one ``prediction`` column — at scale you'd persist
    this assignment and `repartition("cell")` so each cell is
    partition-local). Search: the query is scored only against the
    ``n_probe`` cells whose centroids are nearest — corpus scan cost
    drops to ~n_probe/n_cells of brute force, with recall controlled
    by n_probe. Complements `hyperplane_lsh_topk`: IVF adapts its
    partitions to the data distribution (better cell balance on
    clustered embeddings), LSH needs no training pass.

    Centroid distances for probe selection are computed driver-side
    on the collected query vector — a deliberate point-op (the
    centroid table is n_cells × dim, microscopic at any scale).
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.withColumn("features", array_to_vector("embedding"))
    model = KMeans(k=n_cells, seed=seed).fit(feats.select("features"))
    assigned = model.transform(feats).withColumnRenamed("prediction", "cell")

    q_vec = np.array(
        vectors.filter(F.col(id_col) == query_id).select("embedding").first()[0],
        dtype=np.float64,
    )
    centers = np.array(model.clusterCenters())
    probe_cells = [
        int(c) for c in np.argsort(((centers - q_vec) ** 2).sum(axis=1))[:n_probe]
    ]

    q = vectors.filter(F.col(id_col) == query_id).select(
        F.col("embedding").alias("q_embedding"),
        norm_col("embedding").alias("q_norm"),
    )
    scored = (
        assigned.filter(F.col("cell").isin(probe_cells) & (F.col(id_col) != query_id))
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            "cell",
            F.round(
                dot_col("embedding", "q_embedding")
                / (norm_col("embedding") * F.col("q_norm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def hyperplane_lsh_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 5,
    n_planes: int = 8,
    dim: int = DIM,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket.

    Approximate by construction — recall depends on n_planes — but
    the scored candidate set is |bucket| ≈ N/2^planes instead of N.
    """
    buckets = hyperplane_buckets(vectors, n_planes, dim, id_col)
    with_b = vectors.join(buckets, id_col)
    q = with_b.filter(F.col(id_col) == query_id).select(
        F.col("embedding").alias("q_embedding"),
        norm_col("embedding").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        with_b.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .select(
            id_col,
            "bucket",
            F.round(
                dot_col("embedding", "q_embedding")
                / (norm_col("embedding") * F.col("q_norm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)
