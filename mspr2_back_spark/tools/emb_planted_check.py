"""Scaled planted-truth check for the embedding cells chain.

Builds the replicated planted-neighborhood corpus
(``build_corpora.build_embcorp`` at B blocks), derives the EXPECTED
full value histogram of ``cell_cosine_pairs`` closed-form from the
112-vector base (the replication law: B^2 pairs per qualifying base
pair at the base cosine + C(B,2)*112 colinear pairs at 1.0 —
FIXTURES.md "Planted-neighborhood embeddings corpus"), then runs the
chain and asserts histogram equality per rep with an exact integer
fingerprint. The SCALING.md round-14 record runs this at B=128
(14,336 vectors, 2,925,568 expected pairs).

Usage:
    python -m mspr2_back_spark.tools.emb_planted_check \\
        --blocks 128 --out /tmp/embcorp128 --reps 3
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import time
from collections import Counter

import numpy as np

from mspr2_back_spark.operators.similarity import cell_cosine_pairs
from mspr2_back_spark.tools.build_corpora import (
    EMB_DIM,
    _emb_tau,
    _hadamard_sign,
    build_embcorp,
)

THRESHOLD = 0.45
N_PLANES = 4


def base_vectors() -> dict[int, list[float]]:
    """The 112-vector base corpus, float32-rounded exactly as
    emitted (plain python + numpy — independent of Spark)."""
    vecs: dict[int, list[float]] = {}
    for f in range(24):
        tau = _emb_tau(f)
        for m in range(4):
            t = tau * m
            vecs[100 * f + m] = [
                float(
                    np.float32(
                        float(_hadamard_sign(2 * f, j))
                        + t * _hadamard_sign(2 * f + 1, j)
                    )
                )
                for j in range(EMB_DIM)
            ]
    for u in range(16):
        vecs[2400 + 100 * u] = [
            float(np.float32(float(_hadamard_sign(48 + u, j))))
            for j in range(EMB_DIM)
        ]
    return vecs


def _fold(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def expected_histogram(blocks: int) -> Counter:
    """The closed-form output histogram at B blocks."""
    vecs = base_vectors()

    def cos6(a: int, b: int) -> float:
        c = _fold(vecs[a], vecs[b]) / (
            math.sqrt(_fold(vecs[a], vecs[a]))
            * math.sqrt(_fold(vecs[b], vecs[b]))
        )
        frac = abs(c) * 1e6 % 1.0
        assert abs(frac - 0.5) > 1e-3, (a, b, c)
        assert abs(c - THRESHOLD) > 1e-4, (a, b, c)
        return round(c, 6)

    def bit(v: int, p: int) -> int:
        acc = 0.0
        for i, x in enumerate(vecs[v]):
            s = (
                1.0
                if hashlib.md5(f"{p}_{i}".encode()).hexdigest()[0]
                in "89abcdef"
                else -1.0
            )
            acc += x * s
        return 1 if acc > 0 else 0

    bits = {v: [bit(v, p) for p in range(N_PLANES)] for v in vecs}
    ids = sorted(vecs)
    hist: Counter = Counter()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = cos6(a, b)
            if c >= THRESHOLD and (
                sum(x != y for x, y in zip(bits[a], bits[b])) <= 2
            ):
                hist[c] += blocks * blocks
    hist[1.0] += blocks * (blocks - 1) // 2 * len(vecs)
    return hist


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", type=int, default=128)
    p.add_argument("--out", default=None)
    p.add_argument("--reps", type=int, default=3)
    a = p.parse_args()
    out = a.out or f"/tmp/embcorp{a.blocks}"

    expected = expected_histogram(a.blocks)
    total = sum(expected.values())
    print(f"expected pairs at B={a.blocks}: {total}", flush=True)

    from mspr2_back_spark.session import get_spark

    spark = get_spark(
        app_name="emb_planted_check", shuffle_partitions=64
    )
    t0 = time.time()
    build_embcorp(spark, out, blocks=a.blocks)
    print(f"corpus built: {time.time() - t0:.1f}s -> {out}", flush=True)
    corpus = spark.read.parquet(f"{out}/embeddings.parquet")
    times = []
    for rep in range(a.reps):
        la = os.getloadavg()[0]
        t0 = time.time()
        rows = (
            cell_cosine_pairs(
                corpus,
                THRESHOLD,
                n_planes=N_PLANES,
                block_size=4096,
                multi_probe=True,
            )
            .groupBy("cosine_sim")
            .count()
            .collect()
        )
        dt = time.time() - t0
        got = Counter({r["cosine_sim"]: r["count"] for r in rows})
        # round(), not int(): the cosines are already rounded to 6
        # decimals with an asserted boundary margin, but int()
        # TRUNCATES, so a stored 0.384615 represented as
        # 0.3846149999… would land one bin low and make the printed
        # fingerprint platform-sensitive (r14 ADVICE).
        fp = sum(round(c * 1e6) * k for c, k in got.items())
        ok = got == expected
        times.append(dt)
        print(
            f"rep{rep}: {dt:.1f}s pairs={sum(got.values())} fp={fp} "
            f"loadavg_start={la:.2f} hist_match={ok}",
            flush=True,
        )
        assert ok, "HISTOGRAM MISMATCH vs the planted closed form"
        spark.catalog.clearCache()
    print("ALL REPS MATCH; times:", [round(t, 1) for t in times])


if __name__ == "__main__":
    main()
