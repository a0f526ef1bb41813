"""Builders for the SCALING.md measurement corpora.

Every scale row in SCALING.md runs against parquet built by one of
these two constructions; they lived in throwaway scripts until r13.
Committing them makes the records reproducible byte-for-byte:

- ``build_scaled``: the header-method replica — N copies of an
  sf-dir table with key shifting so join/group cardinalities grow
  with the data, and (documents only) a per-copy alphabet rotation
  so cross-copy shingle sets are disjoint. The 26-rotation ceiling
  means >=27x replication forms same-shift classes of exact twins —
  the adversarial densest-case for clustering (SCALING.md round-8
  notes read this structure in detail).

- ``build_dupcorp``: the round-13 controlled-duplication documents
  corpus (SCALING.md "Banding expansion on a controlled-duplication
  corpus"): N copies of the sf0.1 documents where 40% of base docs
  (id%5<2) contribute their copies as families of 4 (f=c//4,
  m=c%4) — every word md5-salted with (base, f) so families are
  mutually DISJOINT, the middle word additionally salted with m so
  members are genuine NEAR-dups (word-3-gram Jaccard ~ (G-3)/(G+3)
  ~ 0.89 at the 54-word median, zero exact twins); the other 60%
  salt every word with (base, c): fully unique.

Usage:
    python -m mspr2_back_spark.tools.build_corpora scaled \\
        /root/testdata/sf0.1 /tmp/scaled256 --copies 256
    python -m mspr2_back_spark.tools.build_corpora dupcorp \\
        /root/testdata/sf0.1 /tmp/dupcorp256 --copies 256
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession, functions as F

_AB = "abcdefghijklmnopqrstuvwxyz"
_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _rotated(col: str, copy: str) -> F.Column:
    """Per-copy alphabet rotation (26-rotation ceiling, documented)."""
    rotations = [_AB[k:] + _AB[:k] for k in range(26)]
    expr = F.translate(F.col(col), _AB, rotations[1])
    out = F.when(F.col(copy) % 26 == 1, expr)
    for k in range(2, 26):
        out = out.when(
            F.col(copy) % 26 == k, F.translate(F.col(col), _AB, rotations[k])
        )
    return out.otherwise(F.col(col))


def build_scaled(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    copies: int,
    tables: list[str] | None = None,
    partitions: int = 32,
) -> None:
    """Replicate sf-dir tables with key shifting + alphabet rotation
    (documents) + per-copy circular dimension shift (embeddings —
    within-copy cosines preserved exactly, header method)."""
    for t in tables or list(_TABLES):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        key_cols = [
            n
            for n in df.columns
            if n.endswith("key") or n.endswith("_id")
        ]
        if key_cols:
            # The per-copy shift is 10M; a base key at/above it would
            # silently collide across copies and corrupt every join
            # cardinality the corpus is supposed to scale.  Fail loud
            # on any input dir, not just the documented sf0.1.
            hi = df.agg(
                *[F.max(F.col(n)).alias(n) for n in key_cols]
            ).collect()[0]
            bad = {n: hi[n] for n in key_cols if (hi[n] or 0) >= 10_000_000}
            if bad:
                raise ValueError(
                    f"build_scaled key-shift overflow in {t}: max key(s)"
                    f" {bad} >= 10000000 (the per-copy shift) — copies"
                    " would collide"
                )
            # r14 ADVICE: a NEGATIVE base key would alias into a
            # LOWER copy's id range (-5 in copy 1 → 9,999,995), which
            # the max-side guard permits — guard both ends.
            lo = df.agg(
                *[F.min(F.col(n)).alias(n) for n in key_cols]
            ).collect()[0]
            neg = {n: lo[n] for n in key_cols if (lo[n] or 0) < 0}
            if neg:
                raise ValueError(
                    f"build_scaled key-shift underflow in {t}: negative"
                    f" key(s) {neg} — a shifted copy would alias into a"
                    " lower copy's id range"
                )
        cdf = spark.range(copies).withColumnRenamed("id", "_copy")
        j = df.crossJoin(F.broadcast(cdf))
        shift = F.col("_copy") * 10_000_000
        cols = []
        for name in df.columns:
            c = F.col(name)
            if name.endswith("key") or name.endswith("_id"):
                c = (F.col(name) + shift).alias(name)
            elif t == "documents" and name == "text":
                c = _rotated("text", "_copy").alias("text")
            elif t == "embeddings" and name == "embedding":
                c = F.expr(
                    "concat(slice(embedding, cast(_copy % 64 as int) + 1,"
                    " 64 - cast(_copy % 64 as int)),"
                    " slice(embedding, 1, cast(_copy % 64 as int)))"
                ).alias("embedding")
            cols.append(c)
        j.select(*cols).repartition(partitions).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def build_dupcorp(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    copies: int = 256,
    partitions: int = 32,
) -> DataFrame:
    """The controlled-duplication documents corpus (r13 section)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # doc_id is encoded c*100000 + base; a base id at/above 100000
    # would silently collide copy c with copy c+1's low ids and
    # corrupt the planted family structure (families would share
    # members).  The documented corpus is sf0.1 (~5k docs) but the
    # CLI accepts any sf_dir — fail loud instead of producing a
    # plausible-but-wrong corpus.
    ends = base.agg(
        F.max("doc_id").alias("hi"), F.min("doc_id").alias("lo")
    ).collect()[0]
    max_id, min_id = ends["hi"] or 0, ends["lo"] or 0
    if max_id >= 100000:
        raise ValueError(
            f"build_dupcorp doc_id encoding overflow: max base doc_id"
            f" {max_id} >= 100000 — copy blocks would collide"
        )
    # r14 ADVICE: negative base ids alias DOWNWARD (-5 in copy 1 →
    # 99,995) past the max-side guard — guard both ends.
    if min_id < 0:
        raise ValueError(
            f"build_dupcorp doc_id encoding underflow: negative base"
            f" doc_id {min_id} — a copy block would alias into the"
            " block below it"
        )
    cdf = spark.range(copies).withColumnRenamed("id", "c")
    j = base.crossJoin(F.broadcast(cdf))
    j = j.withColumn("words", F.split(F.coalesce("text", F.lit("")), " "))
    j = j.withColumn("mid", (F.size("words") / 2).cast("int"))
    j = j.withColumn("f", (F.col("c") / 4).cast("int")).withColumn(
        "m", F.col("c") % 4
    )
    fam_word = (
        "transform(words, (w, i) -> CASE WHEN i = mid"
        " THEN substr(md5(concat_ws('|', w, doc_id, f, m)), 1, 8)"
        " ELSE substr(md5(concat_ws('|', w, doc_id, f)), 1, 8) END)"
    )
    uniq_word = (
        "transform(words, (w, i) ->"
        " substr(md5(concat_ws('|', w, 'u', doc_id, c)), 1, 8))"
    )
    out = j.select(
        (F.col("c") * 100000 + F.col("doc_id")).alias("doc_id"),
        F.when(
            F.col("doc_id") % 5 < 2,
            F.array_join(F.expr(fam_word), " "),
        )
        .otherwise(F.array_join(F.expr(uniq_word), " "))
        .alias("text"),
    )
    out.repartition(partitions).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    return spark.read.parquet(f"{out_dir}/documents.parquet")


EMB_DIM = 64
EMB_N_FAMILIES = 24
EMB_N_UNIQUES = 16
EMB_FAMILY_SIZE = 4
EMB_ID_STRIDE = 100  # vec_id = 100*f + m / 2400 + 100*u — spreads ids
#                      across id-contiguous verifier blocks so
#                      block_size=256 paths exercise multi-block joins


def _hadamard_sign(r: int, j: int) -> int:
    """Sylvester Hadamard entry H[r][j] = (-1)^popcount(r AND j).

    Distinct rows are exactly orthogonal (sum over j of
    H[a][j]*H[b][j] = 64*[a==b]) — the closed-form basis the planted
    embedding corpus builds on."""
    return 1 if bin(r & j).count("1") % 2 == 0 else -1


def _emb_tau(f: int) -> float:
    """Per-family member spacing along the partner row.

    tau straddles the registered 0.45 cosine threshold across
    families: member m sits at t = tau*m, so the pair (m1, m2)
    cosine is (1 + t1*t2)/sqrt((1+t1^2)(1+t2^2)) — for tau=0.15
    every pair is near 1; for tau=1.2 the (0,2)/(0,3) pairs fall
    below 0.45 while adjacent members stay above. Detection is
    per-PAIR, derived from construction (FIXTURES.md)."""
    return 0.15 * (1 + f % 8)


EMB_BLOCK_ID_OFFSET = 10_000


def build_embcorp(
    spark: SparkSession, out_dir: str, blocks: int = 1
) -> DataFrame:
    """The planted-neighborhood embeddings corpus (round-14 twin of
    ``build_dupcorp`` for the embedding-space dedup/ANN chain).

    Construction laws (contract in FIXTURES.md "Planted-neighborhood
    embeddings corpus"):

    - 24 families of 4 vectors; family f lives in the exactly-
      orthogonal 2-plane span{H[2f], H[2f+1]} of the 64-dim
      Sylvester Hadamard basis: member m = H[2f] + tau_f*m*H[2f+1],
      vec_id = 100*f + m, label = f.
    - 16 uniques on the reserved rows H[48+u] (never used as a
      family base or partner): vec_id = 2400 + 100*u, label = -1.
    - Cross-family, family-vs-unique, and unique-vs-unique cosines
      are all EXACTLY zero in exact arithmetic (distinct Hadamard
      rows are orthogonal; float folds leave ~1e-16 residue, far
      from any threshold); within-family cosines are the known
      closed form above. The planted neighborhoods are therefore
      mutually disjoint with infinite margin, and every expected
      answer — exact pairs, LSH/cell co-bucketing under the
      md5-derived planes, ANN top-k with its tie structure — is
      recomputable in plain python from the emitted vectors.
    - ``blocks`` > 1 replicates the 112-vector base corpus verbatim
      with vec_id offset 10000*b (labels unchanged). Replication
      PRESERVES all planted knowledge closed-form: a cross-block
      copy pair of the same base vector is exactly colinear
      (cosine 1.0, sign vectors identical — always a candidate in
      every bucketed path), and any other cross-block pair has
      exactly its base pair's cosine and sign structure. The
      scaled expected answer is therefore pure arithmetic over the
      base corpus: per qualifying base pair, blocks^2 emitted pairs
      at the base cosine, plus C(blocks,2)*112 colinear pairs at
      1.0 (the histogram law the scaled planted-truth check pins).
    """
    rows = []
    for f in range(EMB_N_FAMILIES):
        tau = _emb_tau(f)
        for m in range(EMB_FAMILY_SIZE):
            t = tau * m
            vec = [
                float(_hadamard_sign(2 * f, j))
                + t * _hadamard_sign(2 * f + 1, j)
                for j in range(EMB_DIM)
            ]
            rows.append((EMB_ID_STRIDE * f + m, vec, f))
    for u in range(EMB_N_UNIQUES):
        vec = [float(_hadamard_sign(48 + u, j)) for j in range(EMB_DIM)]
        rows.append(
            (EMB_ID_STRIDE * EMB_N_FAMILIES + EMB_ID_STRIDE * u, vec, -1)
        )
    assert rows[-1][0] < EMB_BLOCK_ID_OFFSET  # block id spans disjoint
    df = spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>, label int"
    )
    if blocks > 1:
        bdf = spark.range(blocks).withColumnRenamed("id", "_b")
        df = (
            df.crossJoin(F.broadcast(bdf))
            .select(
                (
                    F.col("vec_id") + F.col("_b") * EMB_BLOCK_ID_OFFSET
                ).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    df.coalesce(max(1, blocks // 8)).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    return spark.read.parquet(f"{out_dir}/embeddings.parquet")


if __name__ == "__main__":
    from mspr2_back_spark.session import get_spark

    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["scaled", "dupcorp", "embcorp"])
    p.add_argument("sf_dir", help="ignored for embcorp (self-contained)")
    p.add_argument("out_dir")
    p.add_argument("--copies", type=int, default=256)
    p.add_argument("--tables", nargs="*", default=None)
    a = p.parse_args()
    s = get_spark(shuffle_partitions=128)
    if a.kind == "scaled":
        build_scaled(s, a.sf_dir, a.out_dir, a.copies, a.tables)
    elif a.kind == "embcorp":
        build_embcorp(s, a.out_dir, blocks=a.copies)
    else:
        build_dupcorp(s, a.sf_dir, a.out_dir, a.copies)
    print("done:", a.out_dir)
