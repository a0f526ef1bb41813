"""BM25 keyword retrieval over a document corpus.

Okapi BM25 (Robertson/Spärck Jones probabilistic weighting, the
TREC-3 formulation) re-expressed as ONE corpus scan plus a one-row
broadcast:

- per-term term frequencies and the document length are scan-side
  array expressions over ``split(text)`` — no token explode, so no
  corpus-sized shuffle of (doc, token) rows ever exists;
- N / avgdl / per-term document frequencies all reduce in a SINGLE
  global aggregate (partial map-side, one row at the final exchange)
  that is broadcast back via a constant-key BroadcastHashJoin;
- the score is a closed-form codegen'd expression, so ranking is
  whole-stage-generated JVM code, and top-k plans as
  TakeOrderedAndProject (per-partition heaps, no global sort).

At 100 TB the only exchanges are the one-row scalar reduction and
the top-k heap merge — corpus size only widens the scan.

The scoring expression is built from one SQL template shared
verbatim with the DuckDB oracle (plans/workloads_oracle.py) so both
engines evaluate bit-identical double arithmetic in the same order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Okapi defaults (k1 in [1.2, 2.0], b = 0.75 are the published
# standard operating points).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_score_sql(i: int, k1: float = BM25_K1, b: float = BM25_B) -> str:
    """One term's BM25 contribution as engine-portable SQL text.

    References columns ``tf_{i}`` / ``df_{i}`` (per-term), ``dl``
    (doc token count), ``n_docs`` and ``avgdl`` (global scalars).
    Every operand is CAST to DOUBLE explicitly and the operation
    order is fixed by the template, so Spark and DuckDB produce the
    same IEEE doubles; float literals are written as CAST(x AS
    DOUBLE) because bare decimal literals parse as DECIMAL on both
    engines (and decimal arithmetic differs).

    idf uses the +1 form: ln(1 + (N - df + 0.5)/(df + 0.5)) — always
    positive, the variant Lucene standardized on.
    """
    return (
        f"ln(1 + ((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE)) + CAST(0.5 AS DOUBLE))"
        f" / (CAST(df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
        f" * (CAST(tf_{i} AS DOUBLE) * CAST({k1 + 1.0} AS DOUBLE))"
        f" / (CAST(tf_{i} AS DOUBLE) + CAST({k1} AS DOUBLE)"
        f" * (CAST({1.0 - b} AS DOUBLE) + CAST({b} AS DOUBLE)"
        f" * (CAST(dl AS DOUBLE) / avgdl)))"
    )


def term_stats(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """Scan-side (doc_id, dl, tf_0..tf_n) relation — no shuffle.

    ``dl`` counts non-empty whitespace tokens; ``tf_i`` counts exact
    occurrences of term i. Both are array expressions over one
    split(), evaluated inside whole-stage codegen.
    """
    return docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), w -> w <> ''))").alias("dl"),
        *[
            F.expr(f"size(filter(split(text, ' '), w -> w = '{t}'))").alias(
                f"tf_{i}"
            )
            for i, t in enumerate(terms)
        ],
    )


def corpus_stats(per_doc: DataFrame, n_terms: int) -> DataFrame:
    """N, avgdl and per-term document frequencies as ONE aggregate row."""
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(n_terms)
        ],
    )


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 15,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by BM25 score for a fixed bag of query terms.

    Ties break on doc_id so the ranking is a total order (the
    rounded score alone can collide). Zero-score docs (no query term
    present) are excluded before the heap.
    """
    per_doc = term_stats(docs, terms)
    stats = corpus_stats(per_doc, len(terms))
    # constant-key broadcast attach (see plans/analytics._with_scalar
    # for why the key must be non-foldable): one aggregate row fans
    # out to every scanned doc as a BroadcastHashJoin.
    key = F.spark_partition_id() * 0 + 1
    scored = (
        per_doc.withColumn("_k", key)
        .join(F.broadcast(stats.withColumn("_k", key)), "_k")
        .withColumn(
            "score",
            F.round(
                F.expr(
                    " + ".join(bm25_score_sql(i, k1, b) for i in range(len(terms)))
                ),
                6,
            ),
        )
    )
    return (
        scored.filter(F.col("score") > 0)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
