"""Structured Streaming over the events stream.

The reference has no streaming layer (SURVEY §1.1); this module is
the engine extension for the `events` table's native shape: an
append-only timestamped stream. The same aggregation logic exists in
batch form as the `hourly_events` query (plans/queries.py), so batch
and streaming results are directly comparable — the classic
lambda-architecture parity check, used by the tests.

Scale notes: windowed aggregation state is bounded by the watermark
(late rows beyond it are dropped and their state evicted); the
shuffle key is (window, event_type), so state distributes across
executors; `availableNow` triggers give batch-sized reprocessing with
streaming semantics.

State-store partitioning (r19, VERDICT r18 task 7): AQE does not
apply to stream shuffles, so every stateful operator's state-store
partition count is frozen at ``spark.sql.shuffle.partitions`` AS OF
THE QUERY'S FIRST START and persisted in the checkpoint — later
session-conf changes are ignored on restart (pinned by
test_state_store_partitions_frozen_at_first_start). The deployment
knob is therefore the session seam that already parameterizes
shuffle.partitions (``SPARK_GRAFT_CPUS``, session.py): size it for
PEAK state volume (key count × state row size / target ~100-200 MB
per store) before the first production start of each stream;
resizing afterwards requires a new checkpoint (a full state rebuild
from the source). This is a Spark structured-streaming contract, not
an engine choice — documented here because the batch side's
byte-adaptive AQE sizing (r18) does NOT carry over to these ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mspr2_back_spark.functions.numeric import METRIC


def read_event_stream(spark, path: str, schema) -> DataFrame:
    """File-source stream: new parquet files under `path` become
    micro-batches.

    Any TIMESTAMP_NTZ column (parquet written without the UTC
    adjustment annotation) is normalized to TIMESTAMP: watermarks
    reject NTZ event time (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and
    the session timezone is pinned UTC so the cast is value-identity.

    Rows outside the documented timestamp operating window
    (plans/timeseries.ts_operating_window_sql — [0001-01-08,
    9999-12-25)) are excluded at this scan boundary (r18): several
    downstream ops emit raw or window-shifted timestamps
    (session_start/end, hop window_start), and a day-one year-1
    event's window start lands in year ZERO — unrepresentable at
    the memory-sink collect boundary. Same conformance-filter
    pattern as the batch consumers; NULL timestamps still pass here
    and drop at each op's watermark, the pre-r18 documented
    semantics.
    """
    from mspr2_back_spark.plans.timeseries import ts_operating_window_sql
    from mspr2_back_spark.sources.readers import normalize_ntz

    stream = normalize_ntz(spark.readStream.schema(schema).parquet(path))
    return stream.filter(
        F.col("ts").isNull() | F.expr(ts_operating_window_sql("ts"))
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + exact decimal sums per event type,
    tolerating `watermark` of event-time lateness."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(METRIC)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions per user with native ``session_window`` —
    the streaming twin of the batch `sessionize_events` query
    (plans/extensions.py).

    Session state merges as events arrive and is finalized (emitted in
    append mode) once the watermark passes the session's end + gap.
    State is keyed by (user, session), so it distributes across
    executors and is bounded by the watermark — the shape that holds
    on an unbounded 100 TB/day stream, where a driver-side or
    unbounded-state formulation would not.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(METRIC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def _pandas_domain(events: DataFrame) -> DataFrame:
    """Scan-side conformance filter for the stateful PYTHON ops
    (r18): applyInPandasWithState converts each group's whole Arrow
    batch — including ``ts`` — to pandas, and pandas' datetime64[ns]
    domain ends at 2262-04-11, far inside Spark's timestamp domain.
    A year-2999 event (valid, inside the operating window) aborts
    that conversion before user code runs, so the only total
    placement is before the shuffle into the python worker. The
    python-path ops carry this documented narrower domain
    (plans/timeseries.pandas_ts_window_sql); their JVM twins cover
    the full operating window. NULL ts still passes — NaT is the
    pre-r18 documented semantics for these ops."""
    from mspr2_back_spark.plans.timeseries import pandas_ts_window_sql

    return events.filter(
        F.col("ts").isNull() | F.expr(pandas_ts_window_sql("ts"))
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running (event count, value sum) carried across
    micro-batches.

    Demonstrates the engine's arbitrary-stateful-processing path —
    the escape hatch for operators windowed aggregation can't express
    (per-key counters, custom eviction, model state). State is one
    tuple per user, Arrow-batched per group; each micro-batch emits
    the updated running totals for the users it touched (update
    output mode).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
        )

    return _pandas_domain(events).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_parquet(stream_df: DataFrame, path: str, checkpoint: str) -> None:
    """Drain all available input into an append-mode parquet sink with
    a checkpoint — the production sink shape. Re-running with the same
    checkpoint resumes from the persisted offsets + watermark, which
    is what makes late-data eviction observable across restarts."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def join_event_streams(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "1 hour",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each click pairs with the same user's view
    events from the preceding ``within`` interval. ``how="left_outer"``
    additionally emits unmatched clicks (null view columns) once the
    watermark proves no match can still arrive — the click stays
    buffered until then, which is why outer results trail inner ones
    by the watermark delay.

    Both sides carry watermarks and the join condition bounds the
    event-time distance, so Spark can evict buffered state for rows
    no future match can reach — the requirement that makes
    stream-stream joins runnable on unbounded input. Without the time
    bound the state grows forever; with it, state per side is
    O(watermark + within) of throughput.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {within}")),
        how,
    ).select("c_user", "click_id", "c_ts", "view_id", "v_ts", "view_value")


GOLD_MERGE_BUCKETS = 64


def _gold_bucket(keys: list[str], n_buckets: int):
    """Deterministic merge-bucket id for a key tuple: xxhash64 of the
    key columns, folded into [0, n_buckets). The SAME expression
    buckets the standing gold table (at write time, as its partition
    column) and each arriving batch (at merge time), so a key's rows
    always live in exactly one partition directory."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast(
        "int"
    )


def _gold_meta_path(spark, gold_path: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(gold_path, "_gold_meta.json")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def read_gold_meta(spark, gold_path: str) -> dict | None:
    """Read the gold table's persisted merge contract (`n_buckets`,
    `keys`) from ``_gold_meta.json`` (underscore prefix — invisible to
    Spark's file listing). None if the table has never been created.
    Goes through the Hadoop FileSystem API so any URI scheme works,
    not just local paths."""
    import json

    fs, path = _gold_meta_path(spark, gold_path)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        txt = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(txt)


def write_gold_meta(spark, gold_path: str, meta: dict) -> None:
    import json

    fs, path = _gold_meta_path(spark, gold_path)
    out = fs.create(path, True)
    try:
        out.write(bytearray(json.dumps(meta, sort_keys=True).encode()))
    finally:
        out.close()


def run_upsert_to_gold(
    stream_df: DataFrame,
    gold_path: str,
    checkpoint: str,
    keys: list[str],
    n_buckets: int = GOLD_MERGE_BUCKETS,
) -> None:
    """Stream → gold-table maintenance via ``foreachBatch`` upsert:
    each micro-batch's aggregates MERGE into the parquet gold table
    (replace matching keys, append new ones), so the table always
    holds the latest value per key — the production pattern for
    serving continuously-updated rollups. On Delta/Iceberg the body
    becomes a real MERGE INTO; the relational algebra is identical
    (operators/crud.upsert).

    The merge is PARTITION-SCOPED (r6, VERDICT r5): the gold table is
    laid out as ``_bucket=<xxhash64(keys) mod n_buckets>`` partition
    directories, and a micro-batch (1) computes the bucket set its
    keys hash into, (2) reads ONLY those partitions back (partition
    pruning — untouched buckets are never scanned), (3) merges, and
    (4) rewrites ONLY those partitions via dynamic partition
    overwrite. Per-batch work is O(batch + touched-bucket data), not
    O(gold): at 100 TB gold with 4096 buckets, a batch touching 10
    buckets reads/writes ~250 GB instead of the whole table, and
    every untouched bucket's files are left physically untouched
    (byte-identical — the parity test asserts this). Commit is atomic
    per partition directory (the committer stages files and swaps at
    job commit); cross-bucket atomicity is what a table format's
    transaction log adds on top.

    ``localCheckpoint`` severs the merged plan's lineage from the
    gold path before the overwrite — Spark (correctly) refuses to
    overwrite a path its own input plan is still reading; the
    checkpoint bounds that materialization to the touched buckets.

    Update-mode batches can re-emit a key with a fresher value, which
    plain append sinks can't reconcile — exactly-once-per-key needs
    this read-modify-write (idempotent on retry: re-upserting the
    same batch is a no-op; the bucket function is deterministic, so a
    retry touches the same partitions).
    """
    from mspr2_back_spark.operators.crud import upsert

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_b = batch_df.withColumn("_bucket", _gold_bucket(keys, n_buckets))
        touched = [
            r["_bucket"]
            for r in batch_b.select("_bucket").distinct().collect()
        ]
        if not touched:
            return
        # Explicit existence + contract check (r7, ADVICE fixes): a
        # bare except here would treat a TRANSIENT read failure on a
        # populated table as "table absent" and dynamically overwrite
        # the touched buckets with batch-only rows — silent data
        # loss. Now only genuine absence yields base=None; any real
        # read error propagates and the streaming checkpoint retries
        # the batch. The bucket count is part of the table's identity
        # (a key's bucket must never move), so it is persisted at
        # creation and asserted on every merge.
        meta = read_gold_meta(spark, gold_path)
        fs, _ = _gold_meta_path(spark, gold_path)
        table_exists = fs.exists(
            spark._jvm.org.apache.hadoop.fs.Path(gold_path)
        )
        if meta is None and table_exists:
            # Pre-meta table (or meta lost): adopting it under the
            # CALLER's n_buckets re-opened the silent key-split the
            # meta contract exists to prevent (r8, VERDICT r7 task
            # 2) — a 16-bucket table adopted as 64 strands old rows
            # in old buckets while new rows hash elsewhere. Validate
            # the caller's contract against the table itself before
            # adopting: recompute the bucket function over every
            # existing row and require its stored _bucket to match.
            # One O(gold) scan, paid exactly once at adoption (a
            # migration event, not steady state); any mismatch
            # refuses the merge and demands an explicit rebucket.
            existing = spark.read.parquet(gold_path)
            # A genuinely foreign table may lack _bucket or the key
            # columns entirely — surface that as the same descriptive
            # cannot-adopt ValueError instead of letting the
            # recompute-and-compare below die with an
            # AnalysisException on the missing column (r9 ADVICE).
            missing = [
                c for c in ["_bucket", *keys] if c not in existing.columns
            ]
            if missing:
                raise ValueError(
                    f"cannot adopt pre-meta gold table at {gold_path} "
                    f"under n_buckets={n_buckets}, keys={list(keys)}: "
                    f"existing table lacks column(s) {missing} — not a "
                    "gold table built by this contract; rewrite it "
                    "under the contract explicitly"
                )
            bad = (
                existing.withColumn(
                    "_expect", _gold_bucket(keys, n_buckets)
                )
                .filter(F.col("_bucket") != F.col("_expect"))
                .limit(1)
                .count()
            )
            if bad:
                raise ValueError(
                    f"cannot adopt pre-meta gold table at {gold_path} "
                    f"under n_buckets={n_buckets}, keys={list(keys)}: "
                    "existing rows live in buckets that contract "
                    "would not map them to (the table was built with "
                    "a different bucket count or key set) — rewrite "
                    "the table under the new contract explicitly"
                )
            meta = {"n_buckets": n_buckets, "keys": list(keys)}
            write_gold_meta(spark, gold_path, meta)
        if meta is not None:
            if meta["n_buckets"] != n_buckets or meta["keys"] != list(keys):
                raise ValueError(
                    f"gold table at {gold_path} was created with "
                    f"n_buckets={meta['n_buckets']}, keys={meta['keys']}; "
                    f"merge called with n_buckets={n_buckets}, "
                    f"keys={list(keys)} — rebucketing would strand "
                    "existing keys in stale partitions"
                )
            base = spark.read.parquet(gold_path).filter(
                F.col("_bucket").isin(touched)
            )
        else:
            base = None
        merged = (
            batch_b
            if base is None
            else upsert(base, batch_b.select(*base.columns), keys)
        )
        # repartition by _bucket before the overwrite: every touched
        # bucket's rows land in ONE task, so each dynamic-partition
        # overwrite writes exactly one file per bucket — repeated
        # micro-batches can never fragment a bucket into small files
        # (r7 soak contract; the shuffle this adds is bounded by
        # batch + touched-bucket data, which the merge already reads)
        (
            merged.repartition(max(len(touched), 1), "_bucket")
            .localCheckpoint(eager=True)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket")
            .parquet(gold_path)
        )
        if meta is None:
            write_gold_meta(
                spark,
                gold_path,
                {"n_buckets": n_buckets, "keys": list(keys)},
            )

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(stream_df: DataFrame, table_name: str, mode: str = "update"):
    """Drain all available input into an in-memory sink (test/serving
    harness; a production job would write a parquet/Delta sink with a
    checkpoint location). Returns the terminated query handle so
    callers can read ``lastProgress`` — e.g. to tell "watermark never
    finalized" apart from "the data emptied the output" when an
    append-mode sink comes back empty (the dirty-smoke gate does)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def dedup_gate_against_corpus(
    doc_stream: DataFrame, corpus_fingerprints: DataFrame
) -> DataFrame:
    """Stream-static ingest gate: each arriving document's SimHash is
    checked against the STANDING corpus's fingerprint set — the
    streaming half of incremental dedup (operators/dedup.py's
    ``incremental_ngram_pairs`` is the batch half).

    This is a stream-static join: the static side is re-read per
    micro-batch (picking up corpus compactions), needs no watermark,
    and keeps zero join state — the execution mode Structured
    Streaming reserves for exactly this reference-data shape. At
    scale the static side is a bucketed fingerprint table so the join
    is hash-local.

    Output: (doc_id, simhash, matches_corpus) — ``matches_corpus``
    counts standing documents with the identical fingerprint (0 ⇒
    novel content bucket).
    """
    from mspr2_back_spark.operators.dedup import simhash_fingerprints

    stream_fp = simhash_fingerprints(doc_stream)
    corpus_counts = corpus_fingerprints.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("matches_corpus")
    )
    return (
        stream_fp.join(corpus_counts, "simhash", "left")
        .select(
            "doc_id",
            "simhash",
            F.coalesce("matches_corpus", F.lit(0)).alias("matches_corpus"),
        )
    )


def funnel_stage_progress(
    events: DataFrame,
    stages: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    window_days: int = 2,
) -> DataFrame:
    """Per-user funnel STATE MACHINE via ``applyInPandasWithState`` —
    the streaming twin of plans/workloads.event_funnel.

    State per user is three scalars: stages completed, first-signup
    timestamp (nanos), and the previous stage's timestamp. Each
    micro-batch advances the machine over its (ts-sorted) events:
    stage k completes on the first stage-k event strictly after the
    stage-(k-1) event and within ``window_days`` calendar days of
    the signup day — the greedy first-match chain, identical to the
    batch query's ordered array logic when events arrive in event-time
    order (the parity test's contract; production fronts this with
    the watermark + in-batch sort, late cross-batch stragglers are a
    documented divergence of any single-pass state machine).

    Emits (user_id, stage_reached) updates; downstream counts per
    stage give the live funnel. State is O(1) per user — this is the
    pattern (per-key progression machines) that windowed aggregation
    cannot express and the escape hatch exists for.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    n_stages = len(stages)

    def update(key, pdf_iter, state):
        reached, t0, tprev = state.get if state.exists else (0, 0, 0)
        rows = pd.concat(list(pdf_iter))
        # (ts, event_id) — ts alone can collide, which would make the
        # greedy chain's first-match nondeterministic; same total
        # order as the transition/EWMA twins and the batch query.
        rows = rows.sort_values(["ts", "event_id"])
        ts_ns = rows["ts"].astype("int64")  # nanos since epoch (UTC)
        for t, et in zip(ts_ns, rows["event_type"]):
            if reached == 0:
                if et == stages[0]:
                    reached, t0, tprev = 1, int(t), int(t)
            elif reached < n_stages:
                # floor-div by a UTC day = CAST(ts AS DATE) in the
                # batch query's UTC session
                day = (t // 86_400_000_000_000) - (t0 // 86_400_000_000_000)
                if et == stages[reached] and t > tprev and day <= window_days:
                    reached += 1
                    tprev = int(t)
        state.update((reached, t0, tprev))
        yield pd.DataFrame({"user_id": [key[0]], "stage_reached": [reached]})

    return _pandas_domain(events).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, stage_reached int",
        stateStructType="reached int, t0 long, tprev long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transition_increments(events: DataFrame) -> DataFrame:
    """Live first-order transition counting via
    ``applyInPandasWithState`` — the streaming twin of
    plans/timeseries.event_transition_matrix.

    State per user is ONE (last event type, last ts) pair; each
    micro-batch sorts its rows by event time, chains them onto the
    carried last event, and emits per-(from, to) increment rows for
    the batch. Downstream, ``SUM(n) GROUP BY from_type, to_type``
    (any sink-side aggregation) gives the live matrix; the parity
    test drains the full history and checks the summed increments
    equal the batch query's counts exactly. Same contract as the
    funnel machine: event-time order within the drain (watermark +
    in-batch sort in production); O(1) state per user.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        last_type, last_ts = state.get if state.exists else (None, 0)
        # (ts, event_id) — ts alone can collide, which would make the
        # emitted transition order (hence counts) nondeterministic;
        # same total order as the EWMA twin.
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        counts: dict[tuple[str, str], int] = {}
        for t, et in zip(rows["ts"].astype("int64"), rows["event_type"]):
            if last_type is not None:
                k = (last_type, et)
                counts[k] = counts.get(k, 0) + 1
            last_type, last_ts = et, int(t)
        state.update((last_type, last_ts))
        if counts:
            keys = list(counts)
            yield pd.DataFrame(
                {
                    "from_type": [k[0] for k in keys],
                    "to_type": [k[1] for k in keys],
                    "n": [counts[k] for k in keys],
                }
            )

    return _pandas_domain(events).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="from_type string, to_type string, n long",
        stateStructType="last_type string, last_ts long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_value_live(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Live exponential smoothing of event values per type via
    ``applyInPandasWithState`` — the streaming twin of the batch
    EWMA fold (plans/timeseries.ewma_daily_value's recursion, applied
    at event grain).

    State per event type is TWO scalars: the running EWMA and the
    count of values folded — the O(1)-state recursion that windowed
    aggregation cannot express (each step depends on the previous
    result, not on a frame of rows). Batches fold their rows in
    (ts, event_id) order (the deterministic total order — ts alone
    can collide across users) on top of the carried state; draining
    the full history in event-time order reproduces the batch fold
    bit-for-bit (pytest parity). Emits the (type, n_seen, ewma)
    running snapshot each batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        ewma, n = state.get if state.exists else (0.0, 0)
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        for v in rows["value"]:
            v = float(v)
            ewma = v if n == 0 else ewma * (1 - alpha) + v * alpha
            n += 1
        state.update((float(ewma), int(n)))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_seen": [n], "ewma": [float(ewma)]}
        )

    return _pandas_domain(events).groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType="event_type string, n_seen long, ewma double",
        stateStructType="ewma double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hopping_event_rates(
    events: DataFrame,
    width: str = "60 minutes",
    step: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Hopping-window (overlapping) rates per event type — the LIVE
    twin of plans/workloads.sliding_event_rates: same F.window(ts,
    width, step) assignment, same DECIMAL value sums, with watermark-
    bounded state (each event belongs to width/step windows; state
    per window evicts once the watermark passes its end). The parity
    test drains the full history and matches the batch query's
    matrix exactly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", width, step).alias("win"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(METRIC)).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def cms_cells_live(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 day",
    watermark: str = "2 hours",
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Live count-min sketch: per-``window`` CMS cell counts over a
    key column — the streaming twin of operators/sketches.cms_build.

    Each event explodes into its ``depth`` (h, bucket) cells
    scan-side (the identical md5 grid the batch sketch and the
    DuckDB oracle use), then a windowed count per (window, h,
    bucket). State is bounded by windows-in-flight × depth × width
    cells (4,096 per window at the defaults) — NOT by key
    cardinality, which is the whole point of sketching a stream.
    Because cell counts are additive, the per-window grids MERGE by
    summing cells: the parity test drains the full history, sums
    the per-day grids, and must reproduce the batch corpus sketch
    cell-for-cell — demonstrating time-partitioned mergeability, the
    property that lets a year of daily sketches answer "how often
    did k occur in March" without rescanning anything.
    """
    from mspr2_back_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        _cell_structs,
    )

    d = depth or CMS_DEPTH
    w = width or CMS_WIDTH
    return (
        events.withWatermark("ts", watermark)
        .select(
            "ts",
            F.explode(_cell_structs(F.col(key_col), d, w)).alias("e"),
        )
        .groupBy(
            F.window("ts", window).alias("win"),
            F.col("e.h").alias("h"),
            F.col("e.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"), "h", "bucket", "cnt"
        )
    )


def hll_registers_live(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Live deterministic-HLL register state: per-``window`` maximum
    rho per register over a key column — the streaming twin of
    plans/sketches.hll_distinct_users, sharing its md5 register/rho
    arithmetic (operators/sketches.hll_register_cols).

    Where ``dau_live`` leans on Spark's opaque
    ``approx_count_distinct`` sketch, this exposes the register set
    ITSELF as rows, which buys two things a black-box estimate
    can't: (1) cross-engine determinism — the registers equal the
    batch query's and the DuckDB oracle's value-for-value; (2)
    time-partitioned mergeability — registers merge by MAX, so a
    year of drained per-day register sets folds into any coarser
    period's distinct estimate without rescanning events (the HLL
    analogue of the CMS grid's sum-merge). State per in-flight
    window is ≤ 256 rows regardless of key cardinality; a windowed
    MAX is streaming-legal under the watermark because max is
    order-insensitive and monotone under late arrivals."""
    from mspr2_back_spark.operators.sketches import hll_register_cols

    reg, rho = hll_register_cols(F.col(key_col))
    return (
        events.filter(F.col(key_col).isNotNull())
        .withWatermark("ts", watermark)
        .select("ts", reg.alias("reg"), rho.alias("rho"))
        .groupBy(F.window("ts", window).alias("win"), "reg")
        .agg(F.max("rho").alias("mj"))
        .select(F.col("win.start").cast("date").alias("day"), "reg", "mj")
    )


def dau_live(
    events: DataFrame,
    watermark: str = "2 hours",
    rsd: float = 0.01,
) -> DataFrame:
    """Live daily active users: per-day approx-distinct user counts —
    the streaming twin of the DAU half of
    plans/timeseries.rolling_active_users.

    Exact DISTINCT is not frame-decomposable and not supported in
    streaming aggregation; the HLL sketch underneath
    ``approx_count_distinct`` is both partial-aggregatable (works as
    streaming state) and ORDER-INSENSITIVE (registers keep maxima),
    so the drained estimate is bit-equal to the batch estimate over
    the same rows — the parity test asserts exact equality, not a
    tolerance. State per day window is one HLL register set
    (~kilobytes at rsd=1%), evicted by the watermark.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.approx_count_distinct("user_id", rsd=rsd).alias("dau_est"))
        .select(F.col("win.start").cast("date").alias("day"), "dau_est")
    )
