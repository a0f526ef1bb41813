"""IVF recall vs planted ground truth (VERDICT r14 task 3).

The IVF entry points were the only ANN paths with no
recall-vs-truth number: the planted Hadamard corpus yields no
closed-form CELL law (the Lloyd step blends Hadamard rows —
COVERAGE.md records why the histogram-style pin is excluded), but
it still enables a MEASURED recall record with no parallel IVF
implementation: ground truth is the construction law alone (family
membership + the tau-ladder cosine arithmetic from
``emb_planted_check.base_vectors``), and every measured number
comes from the REAL operators — ``ivf_topk_deterministic`` for
end-to-end search recall, ``ivf_assignments`` for the candidate
(cell co-location) recall the probe search is bounded by.

Measured and printed (the SCALING.md round-15 record):

- recall@10 of the registered search shape (n_cells=8, n_probe=3,
  ``ann_ivf_topk``'s parameters) over EVERY family vector as query
  — per-query family recovery plus the qualifying-edge restriction
  (base-pair cosine ≥ 0.45), with every miss enumerated;
- same-cell candidate recall of the 126 qualifying base pairs at
  n_cells ∈ {4, 8, 16};
- hash-seed sensitivity: the deterministic index's only seed is the
  ``vec_id % n_cells`` hash-shard. A global AFFINE id map (offset,
  or odd scale) provably does NOT change the seeding partition —
  residue classes permute wholesale — so that axis is asserted
  invariant with one offset, and the REAL sensitivity probe
  re-shards under md5-derived id permutations (salted): the
  production layout question, since real corpora don't have
  family-correlated ids;
- the B-replicated corpus (``build_embcorp(blocks=B)``): same-cell
  recall over the scaled qualifying-pair set (B² copies per
  qualifying base pair + C(B,2)·112 colinear cross-block pairs,
  the FIXTURES.md replication law).

Usage:
    python -m mspr2_back_spark.tools.ivf_planted_check \\
        --out /tmp/embcorp_ivf --blocks 8
"""

from __future__ import annotations

import argparse
import math
import time

from pyspark.sql import functions as F

from mspr2_back_spark.operators.similarity import (
    ivf_assignments,
    ivf_topk_deterministic,
)
from mspr2_back_spark.tools.build_corpora import (
    EMB_BLOCK_ID_OFFSET,
    build_embcorp,
)
from mspr2_back_spark.tools.emb_planted_check import (
    THRESHOLD,
    _fold,
    base_vectors,
)

N_CELLS = 8
N_PROBE = 3
K = 10


def family_edges() -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """(all family pairs, qualifying family pairs) — undirected,
    a < b, from the construction law only."""
    vecs = base_vectors()

    def cos(a: int, b: int) -> float:
        return _fold(vecs[a], vecs[b]) / (
            math.sqrt(_fold(vecs[a], vecs[a]))
            * math.sqrt(_fold(vecs[b], vecs[b]))
        )

    all_pairs, qual = [], []
    for f in range(24):
        ids = [100 * f + m for m in range(4)]
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                all_pairs.append((a, b))
                if cos(a, b) >= THRESHOLD:
                    qual.append((a, b))
    return all_pairs, qual


def same_cell_recall(
    cells: dict[int, int], pairs: list[tuple[int, int]]
) -> tuple[int, int]:
    hit = sum(1 for a, b in pairs if cells[a] == cells[b])
    return hit, len(pairs)


def boundary_check(spark, out: str, B: int, n_cells: int = 32) -> None:
    """The replication law's BOUNDARY (VERDICT r15 task 4): the B=128
    exactness at n_cells=8 rests on n_cells dividing
    EMB_BLOCK_ID_OFFSET (10,000 — divisible by 8 and 16, NOT by 32:
    10,000 = 32·312 + 16). At a non-dividing n_cells, copy i of base
    v seeds at residue (v + 16·i) mod 32 — alternating with block
    PARITY between v%32 and (v+16)%32 — so the seed shards, hence
    the decimal centroid means, hence the one-step assignment, are
    no longer replication-invariant and only APPROXIMATE
    preservation is predicted. This measures the prediction: base
    same-cell at n_cells=32, the B-replica's same-cell vs the
    exact-law expectation hit·B², and the parity split (equal-parity
    block pairs share seed geometry; mixed-parity pairs don't — the
    mechanism, made visible)."""
    _, qual = family_edges()
    base = spark.read.parquet(f"{out}/embeddings.parquet")
    cells_b = {
        r["vec_id"]: r["cell"]
        for r in ivf_assignments(base, n_cells=n_cells).collect()
    }
    h1, n1 = same_cell_recall(cells_b, qual)
    print(
        f"boundary base (n_cells={n_cells}, offset mod n_cells = "
        f"{EMB_BLOCK_ID_OFFSET % n_cells}): qualifying same-cell "
        f"{h1}/{n1}",
        flush=True,
    )
    build_embcorp(spark, f"{out}_b{B}", blocks=B)
    rep = spark.read.parquet(f"{out}_b{B}/embeddings.parquet")
    cells = {
        r["vec_id"]: r["cell"]
        for r in ivf_assignments(rep, n_cells=n_cells).collect()
    }
    scaled = [
        (x + EMB_BLOCK_ID_OFFSET * i, y + EMB_BLOCK_ID_OFFSET * j, i, j)
        for x, y in qual
        for i in range(B)
        for j in range(B)
    ]
    hq = sum(1 for x, y, _, _ in scaled if cells[x] == cells[y])
    nq = len(scaled)
    same_par = [(x, y) for x, y, i, j in scaled if (i - j) % 2 == 0]
    mix_par = [(x, y) for x, y, i, j in scaled if (i - j) % 2 == 1]
    hs = sum(1 for x, y in same_par if cells[x] == cells[y])
    hm = sum(1 for x, y in mix_par if cells[x] == cells[y])
    exact_law = h1 * B * B
    colinear = [
        (v + EMB_BLOCK_ID_OFFSET * i, v + EMB_BLOCK_ID_OFFSET * j)
        for v in base_vectors()
        for i in range(B)
        for j in range(i + 1, B)
    ]
    hc, nc2 = same_cell_recall(cells, colinear)
    print(
        f"boundary B={B} replica ({112 * B} vectors, "
        f"n_cells={n_cells}): qualifying same-cell {hq}/{nq} "
        f"(exact-law expectation {exact_law}; deviation "
        f"{hq - exact_law:+d} = {100.0 * (hq - exact_law) / nq:+.2f} "
        f"pp of pairs); parity split same={hs}/{len(same_par)} "
        f"mixed={hm}/{len(mix_par)}; colinear copies {hc}/{nc2}",
        flush=True,
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/embcorp_ivf")
    p.add_argument("--blocks", type=int, default=8)
    p.add_argument(
        "--boundary-only",
        action="store_true",
        help="run ONLY the non-dividing-n_cells replication-law "
        "boundary measurement (n_cells=32)",
    )
    a = p.parse_args()

    all_pairs, qual = family_edges()
    print(
        f"ground truth: {len(all_pairs)} family pairs, "
        f"{len(qual)} qualifying (cos >= {THRESHOLD})",
        flush=True,
    )

    from mspr2_back_spark.session import get_spark

    spark = get_spark(app_name="ivf_planted_check", shuffle_partitions=8)
    build_embcorp(spark, a.out, blocks=1)
    if a.boundary_only:
        boundary_check(spark, a.out, a.blocks)
        spark.stop()
        return
    corpus = spark.read.parquet(f"{a.out}/embeddings.parquet")
    corpus = corpus.persist()
    corpus.count()

    # ---- end-to-end search recall at the registered shape --------
    fam_of = {100 * f + m: f for f in range(24) for m in range(4)}
    qual_edges = {(a, b) for a, b in qual} | {(b, a) for a, b in qual}
    t0 = time.time()
    got_edges: set[tuple[int, int]] = set()
    for q in sorted(fam_of):
        out = ivf_topk_deterministic(
            corpus, q, k=K, n_cells=N_CELLS, n_probe=N_PROBE
        ).collect()
        for r in out:
            if fam_of.get(r["vec_id"]) == fam_of[q]:
                got_edges.add((q, r["vec_id"]))
    dt = time.time() - t0
    all_dir = {(a, b) for a, b in all_pairs} | {(b, a) for a, b in all_pairs}
    rec_all = len(got_edges & all_dir)
    rec_qual = len(got_edges & qual_edges)
    print(
        f"search recall@{K} (n_cells={N_CELLS}, n_probe={N_PROBE}, "
        f"{len(fam_of)} queries, {dt:.1f}s): "
        f"family edges {rec_all}/{len(all_dir)}, "
        f"qualifying edges {rec_qual}/{len(qual_edges)}",
        flush=True,
    )
    missed = sorted(qual_edges - got_edges)
    print(f"qualifying misses: {missed}", flush=True)

    # ---- candidate (same-cell) recall per n_cells -----------------
    for nc in (4, 8, 16):
        cells = {
            r["vec_id"]: r["cell"]
            for r in ivf_assignments(corpus, n_cells=nc).collect()
        }
        h, n = same_cell_recall(cells, qual)
        ha, na = same_cell_recall(cells, all_pairs)
        print(
            f"same-cell recall n_cells={nc}: qualifying {h}/{n}, "
            f"all-family {ha}/{na}",
            flush=True,
        )

    # ---- hash-seed sensitivity --------------------------------------
    # (a) affine maps are provably partition-invariant: (id + off)
    # mod n_cells permutes residue classes wholesale, so the seeding
    # PARTITION — and therefore every downstream number — is
    # unchanged. Assert it with one offset rather than pretending
    # it's a sensitivity axis.
    shifted = corpus.withColumn("vec_id", F.col("vec_id") + F.lit(3))
    cells_base = {
        r["vec_id"]: r["cell"]
        for r in ivf_assignments(corpus, n_cells=N_CELLS).collect()
    }
    cells_off = {
        r["vec_id"] - 3: r["cell"]
        for r in ivf_assignments(shifted, n_cells=N_CELLS).collect()
    }
    h0, n0 = same_cell_recall(cells_base, qual)
    h3, n3 = same_cell_recall(cells_off, qual)
    assert (h0, n0) == (h3, n3), "affine invariance violated"
    print(
        f"affine id-offset invariance asserted: {h0}/{n0} == {h3}/{n3}",
        flush=True,
    )
    # (b) the real axis: re-shard under md5-derived id permutations.
    # new_id = rank of md5(salt|id) — a deterministic pseudo-random
    # relabeling, i.e. the layout an arbitrary production corpus
    # would present to the id-mod seed shard.
    import hashlib

    base_ids = sorted(base_vectors())
    for salt in ("a", "b", "c", "d"):
        perm = {
            v: r
            for r, v in enumerate(
                sorted(
                    base_ids,
                    key=lambda v: hashlib.md5(
                        f"{salt}|{v}".encode()
                    ).hexdigest(),
                )
            )
        }
        inv = {r: v for v, r in perm.items()}
        mapping = F.create_map(
            *[F.lit(x) for kv in perm.items() for x in kv]
        )
        relab = corpus.withColumn(
            "vec_id", mapping[F.col("vec_id")].cast("bigint")
        )
        cells = {
            inv[r["vec_id"]]: r["cell"]
            for r in ivf_assignments(relab, n_cells=N_CELLS).collect()
        }
        h, n = same_cell_recall(cells, qual)
        print(
            f"seed sensitivity (md5 relabel salt={salt!r}, "
            f"n_cells={N_CELLS}): qualifying same-cell {h}/{n}",
            flush=True,
        )

    # ---- B-replicated corpus --------------------------------------
    B = a.blocks
    build_embcorp(spark, f"{a.out}_b{B}", blocks=B)
    rep = spark.read.parquet(f"{a.out}_b{B}/embeddings.parquet")
    cells = {
        r["vec_id"]: r["cell"]
        for r in ivf_assignments(rep, n_cells=N_CELLS).collect()
    }
    scaled_qual = [
        (x + EMB_BLOCK_ID_OFFSET * i, y + EMB_BLOCK_ID_OFFSET * j)
        for x, y in qual
        for i in range(B)
        for j in range(B)
    ]
    colinear = [
        (v + EMB_BLOCK_ID_OFFSET * i, v + EMB_BLOCK_ID_OFFSET * j)
        for v in base_vectors()
        for i in range(B)
        for j in range(i + 1, B)
    ]
    hq, nq = same_cell_recall(cells, scaled_qual)
    hc, nc2 = same_cell_recall(cells, colinear)
    print(
        f"B={B} replica ({112 * B} vectors, n_cells={N_CELLS}): "
        f"qualifying same-cell {hq}/{nq}, colinear copies {hc}/{nc2}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
