#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes as a count-materialization (full plan runs, no
driver-side result marshalling in the timing). Warmup runs every
headline query once at sf0.001 first: that compiles and caches the
whole-stage-codegen classes and spins up the Python UDF workers, so
the timed sf run measures steady-state execution (what a long-lived
cluster sees), not one-time JVM/JIT startup.
"""

from __future__ import annotations

import json
import os
import re
import time

from mspr2_back_spark.plans import QUERIES
from mspr2_back_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "weekly_rollup",
    "revenue_by_nation",
    "year_week_rollup_join",
    "top5_customers",
    "rolling_sum3",
    "latest_order_per_customer",
    "hourly_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_token_stats",
    "ann_topk",
    "dedup_embedding_cosine",
    "sessionize_events",
    "rollup_revenue",
    "percentile_prices",
    "crud_upsert",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="mspr2_back_spark_bench")

    # warmup: JVM, whole-stage-codegen compile cache, Python UDF
    # workers, parquet footers — same plans on the tiny sf so the
    # generated-code cache is hot for the timed run.
    warmup_dir = "/root/testdata/sf0.001"
    QUERIES["global_totals"](spark, sf_dir).collect()
    for name in HEADLINE:
        QUERIES[name](spark, warmup_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)
        del n

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
