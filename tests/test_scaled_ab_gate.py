"""Opt-in 64x scaled-corpus regression gate (r19, VERDICT r18 task 8).

The r18 advisory-band hole class — a session-conf change that
serializes mid-band shuffles at corpus scale while sf0.1 looks fine
(event_association_rules 4.4 s -> 19.2 s at 64x under the 64 MB
advisory + parallelismFirst=false pair) — is invisible to every
default gate: correctness is unaffected and the sf0.1 bench's
shuffles are KB-sized. This gate makes the class repeatable:

    MSPR2_SCALED_AB=1 python -m pytest tests/test_scaled_ab_gate.py -q

It builds (or reuses, recipe-fingerprinted) a 64x replica of sf0.1
via the committed builder (tools/build_corpora.build_scaled), runs
the six-probe set SCALING.md's advisory sweep established
(ml_forecast_ar_exact, bigram_surprisal, skewed_join_topk,
event_association_rules, equidepth_price_bands, dedup_keep_best),
and trips when any probe's 64x-to-sf0.1 wall-time ratio exceeds
RATIO_CAP. Healthy ratios measured on local[32] sit at 2-10x (64x
the rows over the same cores, partially parallelism-absorbed); the
hole class pushed event_association_rules to ~20x. The cap is a
tripwire for structural serialization, not a benchmark — absolute
times are load-sensitive, ratios on the same session much less so.
"""

from __future__ import annotations

import os
import time

import pytest

from tests.test_dirty_smoke import ensure_built, recipe_fingerprint

pytestmark = pytest.mark.skipif(
    not os.environ.get("MSPR2_SCALED_AB"),
    reason="opt-in scaled-corpus A/B gate (set MSPR2_SCALED_AB=1)",
)

SCALED_DIR = "/tmp/mspr2_scaled64_gate"
COPIES = 64
SF_SRC = "/root/testdata/sf0.1"
PROBES = [
    "ml_forecast_ar_exact",
    "bigram_surprisal",
    "skewed_join_topk",
    "event_association_rules",
    "equidepth_price_bands",
    "dedup_keep_best",
]
RATIO_CAP = 16.0


def test_scaled_corpus_ratio_tripwire(spark, sf_dir):
    from mspr2_back_spark.plans import QUERIES
    from mspr2_back_spark.tools.build_corpora import build_scaled

    fp = recipe_fingerprint("scaled64-gate-v1", SF_SRC, COPIES)
    ensure_built(
        SCALED_DIR, fp, lambda: build_scaled(spark, SF_SRC, SCALED_DIR, COPIES)
    )

    failures = []
    for name in PROBES:
        fn = QUERIES[name]
        # warm codegen + python workers on the tiny sf first
        fn(spark, "/root/testdata/sf0.001").count()
        spark.catalog.clearCache()

        def timed(sf_path: str, reps: int = 2) -> float:
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_path).count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            return best

        t_small = timed(SF_SRC)
        t_big = timed(SCALED_DIR)
        ratio = t_big / t_small
        print(f"{name}: sf0.1 {t_small:.2f}s  64x {t_big:.2f}s  ratio {ratio:.1f}")
        if ratio > RATIO_CAP:
            failures.append((name, round(t_small, 2), round(t_big, 2), round(ratio, 1)))
    assert not failures, (
        "64x/sf0.1 wall-time ratio above the serialization tripwire "
        f"({RATIO_CAP}x) — a conf or plan change is starving mid-band "
        f"shuffles of parallelism at corpus scale: {failures}"
    )
