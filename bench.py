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

Noise resistance (round 5, repeats raised round 9): each query is
timed REPEATS (5, was 3 — r8's within-run spread hit 29.7% under
machine load, VERDICT r8 task 6) times and the reported per-query
number is the MINIMUM — the best-observed run is the least
contaminated by co-tenant load / GC / page-cache misses, which round
3/4 showed can move sub-second timings ±30% between otherwise
identical runs (driver recorded 11.05 s where same-code local runs
measured 8.85 s). The spread is reported alongside ("queries_max",
"spread_pct") so a noisy environment is visible in the record
instead of silently inflating the headline total. Repetitions
interleave full passes (q1..qn, q1..qn, ...) rather than
back-to-back repeats so one query's page-cache warmth doesn't
uniquely favor its own later reps.

Cache lifecycle (round 9, VERDICT r8 task 5): the driver that owns
the session also owns the session cache
(plans/timeseries.py's funnel contract), so the bench now calls
``spark.catalog.clearCache()`` after every timed query — queries
that persist internally (funnel_latency) are timed INCLUDING their
per-run persist cost, and a same-plan cache hit from a previous rep
can no longer flatter any number (Spark's CacheManager matches by
analyzed plan, so without the clear, rep N of a persisting query
silently reused rep N-1's cache). The JSON records
``persistent_rdds_after_clear`` plus the r16 residue
classification: the leak tripwire asserts the two REAL leak
classes directly (SQL-cache entries surviving clearCache; Python
DataFrame objects surviving gc), while a registry count above
baseline with both classes clean is scheduler-pinned
localCheckpoint lifecycle residue — bounded, Python-unreachable,
reaped by Spark's periodic GC — recorded, not failed (the r16
bisect that separated these classes is in the
``_persistent_rdd_count`` docstring). r17 adds two guards around
that classification: surviving-frame repr/referrers go INTO the
JSON (``leaked_frame_info``) before the assert so a false positive
is diagnosable from the artifact alone, and residue growth above
``MAX_CHECKPOINT_RESIDUE`` fails the run even with both direct
classes clean — a JVM-side RDD-level leak (neither cached SQL plan
nor Python frame) can no longer hide as classified residue.

Load context (round 10, VERDICT r9 task 5; strengthened round 14,
VERDICT r13 task 4): the timed sweep gates on a two-tier quiet
window — up to 300 s waiting for 1-min loadavg < 2 (the SCALING.md
record threshold; "quiet_achieved": true in the artifact), then up
to a further 120 s for loadavg < 8 (the old hard gate), then runs
anyway — a busy box must still produce a number.  The artifact
records the tier outcome, total wait, the loadavg at gate exit, and
the loadavg at every pass BOUNDARY ("loadavg_per_pass": N+1
samples for N passes — start of each pass plus one after the last,
r17 verdict task 6), so uniform cross-round drift can be
attributed to measured co-tenant load from the artifact alone, and
a quiet capture is distinguishable from a forced one without a
side-channel reference (the r13 artifact needed one: every query
drifted up together at loadavg 6–8, which passed the old gate).

Max-side attribution (round 11, VERDICT r10 "What's wrong" #2): the
r10 max-side spread (39.5%) mixed each query's page-cache-cold FIRST
pass with co-tenant noise and the artifact couldn't tell them apart.
The artifact now carries the full per-pass matrix ("queries_passes",
pass-ordered — pass i of query q is queries_passes[q][i]) plus the
warm-side aggregates computed over passes 2..N only ("queries_max_warm",
"total_max_warm", "spread_pct_warm"): a cold first pass widens
spread_pct but not spread_pct_warm, while genuine co-tenant noise
widens both. Any other slice is recomputable from the matrix.

Artifact split (round 19, VERDICT r18 task 1): the printed line is
the COMPACT contract record (~3.5 KB — floors, totals, spread
scalars, probe, load, "cpus", "sf") so the driver's tail capture can
always parse it; the per-pass matrix, max-side per-query maps and
frame-leak detail live in a side file written before the line is
printed ("full_artifact": /tmp/bench_full_c{cpus}.json — cpus-keyed
so the driver's low-core sweep doesn't clobber the main record).
The side file is a strict superset of the line.
"""

from __future__ import annotations

import json
import os
import re
import time

from mspr2_back_spark.plans import QUERIES
from mspr2_back_spark.session import get_spark

REPEATS = 5

# Upper bound on (persistent-RDD residue − baseline) a clean sweep
# can leave behind: the final rep's scheduler-pinned localCheckpoint
# chains from the two checkpointing headline queries
# (cms_heavy_hitters: 1; dedup_keep_best's LP: 1 + ≤5 converged
# iterations), with margin. Derivation and the leak class this
# backstop catches are at the assert site in main().
MAX_CHECKPOINT_RESIDUE = 8

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
    # round-5 additions: the round-4 analytics family's heaviest
    # members get a per-round perf floor (VERDICT r4 task 4)
    "waiting_orders_by_supplier",
    "customer_order_histogram",
    "bigram_pmi",
    # round-5 retrieval family — scan+broadcast ranking shapes
    "bm25_topk",
    "ann_batch_topk",
    # round-5 time-series/sketch layer — representative member of
    # each new plan shape (window carry / sketch grid / tf-idf rank)
    "attribution_last_touch",
    "cms_heavy_hitters",
    "tfidf_top_terms",
    # round-6 additions (VERDICT r5 task 2): the r5 heavies whose
    # perf previously lived only in SCALING.md one-offs get a
    # per-round floor here
    "funnel_latency",
    "rfm_segments",
    "event_association_rules",
    "gapfill_user_daily",
    "seasonal_decompose_daily",
    # round-7 additions (VERDICT r6 task 4): the AR and DAU families
    # plus the new skew demonstration get a per-round perf floor
    "ml_forecast_ar_exact",
    "rolling_active_users",
    "event_weekday_contingency",
    "skewed_join_topk",
    # round-8 additions (VERDICT r7 task 5 + task 3): the remaining
    # r7 registration gets its floor, and the new JPEG marker-path
    # query is benched from birth (its pure-Python Huffman decode is
    # the documented hot path — SCALING.md "JPEG decode throughput")
    "zorder_locality_audit",
    "multimodal_jpeg_meta",
    # late round 8: the deterministic HLL's flat-exchange claim gets a
    # per-round floor (SCALING.md shows it flat across 64x data; the
    # bench guards the constant factor)
    "hll_distinct_users",
    # round-9 registrations, benched from birth (r8 pattern): the WAV
    # codec path, the sketch-only HLL scale shape, the per-cluster
    # survivor selection (riding the dedup_clusters subplan), and the
    # bigram-LM quality score (the corpus's heaviest n-gram shuffle)
    "multimodal_wav_stats",
    "hll_distinct_users_sketch_only",
    "dedup_keep_best",
    "bigram_surprisal",
]

# Queries benched in the PREVIOUS round's headline set — their
# subtotal is emitted as "shared_prev_subtotal" so the
# round-over-round like-for-like comparison lives in the artifact
# itself instead of requiring the reader to re-sum (VERDICT r5,
# "What's wrong" #2). Update alongside HEADLINE each round.
PREV_ROUND_HEADLINE = [
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
    "waiting_orders_by_supplier",
    "customer_order_histogram",
    "bigram_pmi",
    "bm25_topk",
    "ann_batch_topk",
    "attribution_last_touch",
    "cms_heavy_hitters",
    "tfidf_top_terms",
    "funnel_latency",
    "rfm_segments",
    "event_association_rules",
    "gapfill_user_daily",
    "seasonal_decompose_daily",
    "ml_forecast_ar_exact",
    "rolling_active_users",
    "event_weekday_contingency",
    "skewed_join_topk",
    "zorder_locality_audit",
    "multimodal_jpeg_meta",
    "hll_distinct_users",
    # round 10 and round 11: no new registrations (registry closed at
    # 149), so the headline set is unchanged — the whole previous set
    # is the like-for-like comparison base.  Round 12 registers
    # audio_feature_stats (retirement-funded); the headline set stays
    # unchanged so shared_prev_subtotal remains like-for-like — the
    # new query is driver-hashed in the sweep, and its per-doc numpy
    # cost profile is already represented by multimodal_wav_stats.
    # Round 13 registers multimodal_adpcm_stats (the precomputed
    # spare slot) and applies the same rule: per-doc codec probe on
    # ~100-sample waveforms, cost profile represented by
    # multimodal_wav_stats / audio_feature_stats (SCALING.md codec
    # cost table carries the per-second encode/decode constants);
    # headline set unchanged, shared_prev_subtotal fully
    # like-for-like for the third consecutive round
    "multimodal_wav_stats",
    "hll_distinct_users_sketch_only",
    "dedup_keep_best",
    "bigram_surprisal",
]


def _persistent_rdd_count(spark) -> int:
    """Entries in the context's persistent-RDD registry (cached
    DataFrames AND localCheckpoint blocks), read after nudging both
    collectors: localCheckpoint blocks unpersist asynchronously via
    the ContextCleaner once their driver-side reference dies, so an
    undrained read nondeterministically includes blocks that are
    already garbage — the baseline and the residue must both be
    drained reads or the leak assert below is comparing different
    quantities. The ContextCleaner drains on its own schedule, so
    instead of one fixed sleep (which can race the cleaner on a
    loaded box and spuriously fail the leak assert — r10 ADVICE) the
    count is polled until it holds still for THREE consecutive reads
    or a ~12 s budget runs out, with a JVM System.gc() before EVERY
    read: py4j's detach of a dead Python-side DataFrame lands
    asynchronously, so a single up-front System.gc() can fire before
    the detach and then nothing ever re-collects the JVM object on a
    quiet driver — the r10 per-query bisect showed exactly that (the
    last query's localCheckpoint blocks survived an 11 s quiet poll
    and drained only when the NEXT query's activity triggered a GC).
    A genuinely leaked cache is a strong reference — stable nonzero
    under repeated gc — so the poll never masks a real leak.

    r16 addendum — the detach pipeline must be actively FLUSHED,
    not just GC-polled. Three r16 bench runs tripped the leak
    assert (+2 stuck residue through the whole poll; JSON already
    printed, exit code nonzero) and the bisect found a py4j
    retention quirk, not a query leak: in pinned-thread
    (ClientServer) mode every MEMORY_DEL detach is delivered by the
    dedicated FinalizerWorker connection, and the LAST delivered
    binding stays reachable from that idle JVM connection thread
    until the NEXT detach command arrives on it. A tail query's
    localCheckpoint Dataset is therefore pinned — stable under any
    amount of gc.collect()/System.gc(), immune even to a manually
    re-sent MEMORY_DEL — until unrelated py4j detach traffic
    flushes it (measured: stuck residue of 1 survived 30 s of
    GC polling and a manual MEMORY_DEL, then a 50-object detach
    burst drained it instantly; the same mechanism explains why
    heavy mid-sweep queries always flushed their predecessors and
    only the sweep TAIL ever stuck). The poll therefore generates a
    small detach burst per read — plan-only `spark.range(1)`
    temporaries, no jobs — alongside both collectors. A real leak
    (a strong Python reference) survives the burst just the same,
    so the tripwire keeps its teeth."""
    import gc

    def _detach_burst() -> None:
        tmp = [spark.range(1) for _ in range(20)]
        del tmp
        gc.collect()

    _detach_burst()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)  # the pre-r10 drain window, kept as the floor
    deadline = time.monotonic() + 15.0
    cur = spark.sparkContext._jsc.getPersistentRDDs().size()
    # Early exit only on ZERO (it can't regress); a nonzero read is
    # polled to the deadline, because detach delivery is async
    # (FinalizerWorker sleeps up to 1 s between queue drains) and
    # the old three-stable-reads heuristic at 0.5 s spacing latched
    # the stale pre-delivery count and returned a phantom leak.
    while cur > 0 and time.monotonic() < deadline:
        time.sleep(1.5)
        _detach_burst()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        cur = spark.sparkContext._jsc.getPersistentRDDs().size()
    return cur


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # The local bench recipe wants the 1m AQE advisory partition size
    # (the r18 two-scale sweep's winner for sub-100MB local shuffles
    # under parallelismFirst=false — SCALING.md). r19 moved the
    # session factory's UNSET default to the scale-safe 64m (the same
    # conf sizes skew-join splits; VERDICT r18 "What's wrong" #1), so
    # the bench exports its local value itself. setdefault: an
    # explicit env override still wins, and the value used is
    # recorded in the JSON line.
    os.environ.setdefault("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "1m")
    spark = get_spark(app_name="mspr2_back_spark_bench")

    # warmup: JVM, whole-stage-codegen compile cache, Python UDF
    # workers, parquet footers — same plans on the tiny sf so the
    # generated-code cache is hot for the timed run.
    warmup_dir = "/root/testdata/sf0.001"
    QUERIES["global_totals"](spark, sf_dir).collect()
    for name in HEADLINE:
        QUERIES[name](spark, warmup_dir).count()
    spark.catalog.clearCache()
    baseline_rdds = _persistent_rdd_count(spark)

    # Load gate (round 10, VERDICT r9 task 5; strengthened round 14,
    # VERDICT r13 task 4): co-tenant load is the dominant cross-round
    # drift source (r9: uniform +25–40% max-side deltas under loadavg
    # ~6.4 with zero plan changes; r13: every query drifted +2–103%
    # together at loadavg 6–8, which PASSED the old threshold-8 gate,
    # and the builder's separate quiet-window reference had to carry
    # the real signal).  Two tiers, both bounded — the bench must
    # still produce a number on a busy box:
    #   1. QUIET tier: wait up to 300 s for 1-min loadavg < 2.0 (the
    #      SCALING.md record-measurement threshold) so the
    #      driver-visible artifact is capture-comparable across
    #      rounds without a side-channel quiet reference.
    #   2. HARD tier: if the box never goes quiet, wait up to a
    #      further 120 s for loadavg < 8.0 (the old gate), then run
    #      regardless.
    # The artifact RECORDS the tier outcome (quiet_achieved), the
    # total wait, and the loadavg at gate exit, so a reader can tell
    # a quiet capture from a forced one from the JSON alone.
    load_gate = {
        "quiet_threshold": 2.0,
        "hard_threshold": 8.0,
        "quiet_wait_budget_sec": 300,
        "hard_wait_budget_sec": 120,
        "waited_sec": 0,
        "quiet_achieved": False,
        "load_at_start": None,
    }
    quiet_deadline = time.monotonic() + 300.0
    while True:
        if os.getloadavg()[0] < load_gate["quiet_threshold"]:
            load_gate["quiet_achieved"] = True
            break
        if time.monotonic() >= quiet_deadline:
            break
        time.sleep(10.0)
        load_gate["waited_sec"] += 10
    if not load_gate["quiet_achieved"]:
        hard_deadline = time.monotonic() + 120.0
        while os.getloadavg()[0] >= load_gate["hard_threshold"] and (
            time.monotonic() < hard_deadline
        ):
            time.sleep(10.0)
            load_gate["waited_sec"] += 10
    load_gate["load_at_start"] = round(os.getloadavg()[0], 2)

    # Box-speed denominator (round 15): a fixed single-thread
    # pure-python loop timed at gate exit and again after the
    # passes.  Cross-round floor comparisons have repeatedly had to
    # guess whether drift is code or box (r12-r15: broad-based
    # 10-30% moves on queries frozen since r4).  Measured behavior
    # on this box: the probe swings ~3x (129-376 ms) with HOST-side
    # contention that container metrics miss entirely (container
    # loadavg < 2 and /proc/stat steal = 0 during 2x swings) — so
    # it is NOT a constant, it is the effective-core-speed sample
    # the floors actually run under.  Read BENCH floors against it:
    # floors that move with cpu_probe_ms are the box; floors that
    # move against a flat probe are the engine.
    def cpu_probe_ms() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = 0
            for i in range(2_000_000):
                s += i * i
            best = min(best, time.perf_counter() - t0)
        return round(best * 1000.0, 1)

    probe_start = cpu_probe_ms()

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # loadavg at every pass BOUNDARY (r17 verdict task 6): N passes
    # yield N+1 samples — start of each pass plus one after the
    # final pass — so co-tenant load arriving MID-sweep is
    # attributable to the passes it straddles (the r17 driver
    # artifact's +8% ratio drift appeared between per-pass starts).
    loadavg_per_pass: list[list[float]] = []
    for _ in range(REPEATS):
        loadavg_per_pass.append([round(x, 2) for x in os.getloadavg()])
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
            # the bench owns the session cache (the funnel contract,
            # plans/timeseries.py): drop whatever the query persisted
            # OUTSIDE the timed window, so no same-plan cache hit
            # flatters a later rep
            spark.catalog.clearCache()
    loadavg_per_pass.append([round(x, 2) for x in os.getloadavg()])

    residue = _persistent_rdd_count(spark)
    if residue > baseline_rdds:
        # apparent growth: give the async detach→gc→cleaner chain one
        # more full window before calling it a leak — a transient
        # tail-query localCheckpoint drains here, a real leak doesn't
        time.sleep(3.0)
        residue = _persistent_rdd_count(spark)

    # Leak classification (r16). The registry COUNT alone cannot be
    # the tripwire: the r16 bisect proved that a query-internal
    # localCheckpoint's blocks can stay registered with ZERO Python
    # owners and an EMPTY SQL cache — the parent RDD is pinned by
    # Spark-internal scheduler state (stage/shuffle structures hold
    # the ShuffleDependency → parent-RDD chain), immune to both
    # collectors AND to py4j detach bursts, and is exactly the
    # lifecycle residue spark.cleaner.periodicGC.interval (30 min
    # default) exists to reap on long-running jobs. KB-scale, bounded
    # by the tail queries' checkpoint count, not a leak. The two REAL
    # leak classes a query could commit are asserted directly:
    #   1. SQL-cache entries that survive clearCache (a query
    #      re-persisting after the sweep's clear, or holding its own
    #      cache contract open) — cacheManager must be empty;
    #   2. Python-owned frames (a module-global caching a DataFrame)
    #      — no pyspark DataFrame object may survive gc.
    cache_mgr_empty = bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    )
    import gc as _gc

    from pyspark.sql import DataFrame as _DF

    _gc.collect()
    leaked_frames = [o for o in _gc.get_objects() if isinstance(o, _DF)]
    # Diagnosability (r16 ADVICE): the surviving-frame assert is
    # global — a future bench-local or library-held DataFrame alive
    # at classification time would fail the run after the JSON line.
    # Record each survivor's repr and referrer types IN the JSON
    # (before the assert) so a false positive is attributable from
    # the artifact alone: a module-global shows a `dict` referrer
    # from that module, a leaked closure shows `cell`/`function`.
    leaked_frame_info = []
    for f in leaked_frames[:8]:
        refs = []
        for r in _gc.get_referrers(f):
            if r is leaked_frames:
                continue
            t = type(r)
            desc = f"{t.__module__}.{t.__name__}"
            if isinstance(r, dict):
                # a module/class __dict__ names the owner via its keys
                owner_keys = [k for k, v in r.items() if v is f]
                desc += f"(keys={owner_keys[:3]})"
            refs.append(desc)
            if len(refs) >= 4:
                break
        leaked_frame_info.append({"repr": repr(f)[:160], "referrers": refs})

    timings = {name: round(min(ts), 4) for name, ts in samples.items()}
    worst = {name: round(max(ts), 4) for name, ts in samples.items()}
    # warm side: drop each query's first (page-cache-cold) pass so the
    # max/spread accounting separates cold-start from co-tenant noise
    worst_warm = {
        name: round(max(ts[1:]), 4) if len(ts) > 1 else round(max(ts), 4)
        for name, ts in samples.items()
    }
    best_warm = {
        name: round(min(ts[1:]), 4) if len(ts) > 1 else round(min(ts), 4)
        for name, ts in samples.items()
    }
    total = round(sum(timings.values()), 4)
    total_max = round(sum(worst.values()), 4)
    total_max_warm = round(sum(worst_warm.values()), 4)
    shared_prev = round(
        sum(timings[n] for n in PREV_ROUND_HEADLINE if n in timings), 4
    )
    # r19 (VERDICT r18 task 1): the printed line had outgrown the
    # driver's tail capture — the full 43×5 queries_passes matrix plus
    # leaked_frame_info made the one-line JSON driver-unparseable for
    # 12 straight rounds (r06-r17 "parsed": null), which blinded
    # PERF's prev/geomean computation. The contract line now stays
    # compact (~3.5 KB: floors, totals, probe, load, cpus, sf) and
    # the bulky diagnostics (per-pass matrix, max-side aggregates,
    # frame-leak detail) move to a side file referenced by path
    # ("full_artifact"). Nothing is dropped — the side file carries a
    # superset of every field the line ever had. "cpus" is recorded
    # so the driver's low-core scaling sweep is attributable from the
    # artifact alone (the r18 suspect_cpus_ignored false positive).
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    compact = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "repeats": REPEATS,
        "cpus": cpus,
        "master": spark.sparkContext.master,
        "advisory_partition_bytes": spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
        "total_max": total_max,
        "spread_pct": round(100.0 * (total_max - total) / total, 1) if total else 0.0,
        "total_max_warm": total_max_warm,
        "spread_pct_warm": round(
            100.0 * (total_max_warm - total) / total, 1
        ) if total else 0.0,
        "shared_prev_subtotal": shared_prev,
        "shared_prev_n": len(PREV_ROUND_HEADLINE),
        "persistent_rdds_baseline": baseline_rdds,
        "persistent_rdds_after_clear": residue,
        # residue classification (r16): any count above baseline with
        # BOTH fields below clean is scheduler-pinned localCheckpoint
        # lifecycle residue (bounded, reaped by Spark's periodic GC)
        "cache_manager_empty": cache_mgr_empty,
        "leaked_python_frames": len(leaked_frames),
        # co-tenant load is the dominant spread source on a shared
        # box (r8: 29.7% spread with zero plan changes)
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "loadavg_per_pass": loadavg_per_pass,
        "load_gate": load_gate,
        "cpu_probe_ms": [probe_start, cpu_probe_ms()],
        # floors LAST: the per-query floor (min over warm passes) is
        # the stat that survives co-tenant noise (r14 VERDICT task 2)
        "queries_min_warm": best_warm,
        "total_min_warm": round(sum(best_warm.values()), 4),
        "full_artifact": f"/tmp/bench_full_c{cpus}.json",
    }
    full = dict(compact)
    full.update(
        {
            "queries_max": worst,
            "queries_passes": {
                name: [round(t, 4) for t in ts]
                for name, ts in samples.items()
            },
            "queries_max_warm": worst_warm,
            "leaked_frame_info": leaked_frame_info,
        }
    )
    # The side file is diagnostics; the printed line is the CONTRACT.
    # A failed write (read-only /tmp, disk full) must not take the
    # contract line down with it — record the failure in the line
    # instead.
    try:
        with open(compact["full_artifact"], "w") as fh:
            json.dump(full, fh)
    except OSError as exc:
        compact["full_artifact"] = f"unwritable: {exc}"[:120]
    print(json.dumps(compact))
    assert cache_mgr_empty, (
        "SQL cache entries survived clearCache — a query leaked a "
        "cache it doesn't own (see the funnel cache-lifecycle "
        "contract)"
    )
    assert not leaked_frames, (
        f"{len(leaked_frames)} DataFrame objects survived gc after "
        "the sweep — a module-global is caching a frame (a real "
        "Python-side leak, not checkpoint lifecycle residue); "
        f"survivors: {leaked_frame_info}"
    )
    # Bounded-growth backstop (r16 ADVICE): a JVM-side RDD-level leak
    # (df.rdd.persist(), a strong JVM reference to a localCheckpoint)
    # lives in NEITHER asserted class — not in the SQL cacheManager,
    # not a Python DataFrame — so without a bound it would read as
    # benign scheduler-pinned residue forever. Bound the growth by
    # what the FINAL rep's checkpointing headline queries can pin:
    # cms_heavy_hitters makes 1 localCheckpoint per run and
    # dedup_keep_best's LP makes 1 + (converged iterations, ≤5 at
    # every measured sf) — call it 8 with margin. The classified
    # residue measured in r16 is 3 above baseline; a leak that
    # accumulates PER REP across the 5-pass sweep shows ≥ ~12.
    # Growth past the bound fails the run even with both direct
    # classes clean.
    assert residue - baseline_rdds <= MAX_CHECKPOINT_RESIDUE, (
        f"persistent-RDD registry grew by {residue - baseline_rdds} "
        f"(baseline {baseline_rdds} -> {residue}), above the "
        f"final-rep checkpoint bound {MAX_CHECKPOINT_RESIDUE} — an "
        "RDD-level reference is accumulating across the sweep (a JVM-"
        "side leak outside both asserted classes)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
