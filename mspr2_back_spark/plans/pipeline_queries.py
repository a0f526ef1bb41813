"""Training-data-pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing — the beyond-the-reference surface a
100 TB corpus engine needs (BASELINE.json north star).

Same contract as plans/queries.py: (spark, sf_dir) → DataFrame, every
computed column aliased to match the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mspr2_back_spark.functions.text import (
    WORDS,
    fingerprints,
    predicted_lang,
    quality_features,
    token_stats,
)
from mspr2_back_spark.operators import dedup, multimodal, similarity
from mspr2_back_spark.sources.readers import load_table

NGRAM_JACCARD_THRESHOLD = 0.5
MINHASH_THRESHOLD = 0.8
COSINE_PAIR_THRESHOLD = 0.45
ANN_QUERY_ID = 0
# Single source of truth for parameters the DuckDB oracles must
# mirror (pipeline_oracle.py imports and formats these — hard-coding
# them on both sides invited silent drift, ADVICE r4):
TOKEN_BUDGET_PER_SOURCE = 800
EMB_LSH_PLANES = 18
EMB_LSH_BANDS = 3
EMB_CELL_PLANES = 4


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest (hash-groupBy)."""
    return dedup.exact_duplicates(load_table(spark, sf_dir, "documents"))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (inverted index).

    The registered form caps posting lists at 1% of the corpus (floor
    20): the self-join costs Σ posting_len², so ONE boilerplate
    shingle present in 10⁶ of 10⁸ docs would alone generate 10¹²
    candidate pairs — the cap drops such stop-phrases from the index
    while the exact-verify pass keeps emitted pairs identical to the
    uncapped oracle (any near-dup pair still sharing ≥1 sub-cap
    shingle is found; this corpus's max shingle df is well under the
    cap at every SF, measured in SCALING.md). The count() feeding the
    cap is parquet-metadata-only — no data scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    cap = max(20, docs.count() // 100)
    return dedup.ngram_jaccard_pairs(
        docs, NGRAM_JACCARD_THRESHOLD, max_doc_freq=cap
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates, exact-Jaccard-verified at 0.8.

    The oracle is the exact thresholded pair set: with 32 bands × 2
    rows, LSH recall at j ≥ 0.8 is 1 − 2e-13, so candidate+verify
    equals exact with near-certainty (see operators/dedup.py).
    """
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), MINHASH_THRESHOLD
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable 16-bit SimHash fingerprint per document."""
    return dedup.simhash_fingerprints(load_table(spark, sf_dir, "documents"))


def simhash_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-fingerprint dup buckets over the SimHash table: bucket
    size + representative (min) doc per fingerprint — the grouping
    step between fingerprinting and Hamming-ball candidate probing."""
    return dedup.simhash_buckets(load_table(spark, sf_dir, "documents"))


def simhash_near_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document near-duplicate degree under SimHash Hamming<=2
    via the Hamming-ball probe join (operators/dedup.py::
    simhash_near_degree) — corpus-linear even where the fingerprint
    distribution is concentrated (this corpus yields 4.9M raw pairs
    at sf0.1, which pair materialization would have to shuffle;
    the probe join touches only corpus x 137 probe rows against the
    broadcast fingerprint-count table)."""
    return dedup.simhash_near_degree(load_table(spark, sf_dir, "documents"))


def simhash64_near_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document near-duplicate degree at the PRODUCTION fingerprint
    width: 64-bit SimHash, Hamming<=2, via the same Hamming-ball probe
    join (corpus x 2,081 probe rows vs the broadcast fingerprint-count
    table). 64-bit is the width that keeps Hamming blocking usable at
    100 TB — the 16-bit space (65,536 buckets) saturates on any real
    corpus (4.9M Hamming<=2 pairs among 5k docs measured at sf0.1,
    vs near-dup-only pairs at 64-bit; SCALING.md)."""
    return dedup.simhash_near_degree(
        load_table(spark, sf_dir, "documents"), max_hamming=2, bits=64
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs verifier).

    block_size=256 so even sf0.01 (500 vectors) exercises the
    multi-block pair join, not a degenerate single block."""
    return similarity.cosine_pairs(
        load_table(spark, sf_dir, "embeddings"),
        COSINE_PAIR_THRESHOLD,
        block_size=256,
    )


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed embedding near-dup pairs (banded sign-LSH candidates
    + exact cosine verify) — the scale path next to the exact
    all-pairs dedup_embedding_cosine. Same 0.45 threshold, so the
    output is the recall-limited subset of the exact pair set; the
    oracle mirrors the identical md5-derived planes, making the
    bucketed semantics bit-checkable."""
    return similarity.lsh_cosine_pairs(
        load_table(spark, sf_dir, "embeddings"),
        COSINE_PAIR_THRESHOLD,
        n_planes=EMB_LSH_PLANES,
        bands=EMB_LSH_BANDS,
    )


def dedup_embedding_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-bucketed exact embedding near-dup pairs: hyperplane cells
    (16 at sf0.01) + the BLAS block-pair verifier run per probe-cell
    overlap — the moderate-threshold 100 TB dedup composition (see
    operators/similarity.py::cell_cosine_pairs and the SCALING.md
    LSH-vs-cells analysis). Registered with Hamming-1 multi-probe
    (candidates = cell sign-distance ≤ 2): without it the single-cell
    form finds 0 pairs at sf0.01 and its oracle verdict was vacuously
    green (r5 fix, same class as idle_customers_avg_bal); with it the
    sf0.01 result is 12 pairs — a real comparison."""
    return similarity.cell_cosine_pairs(
        load_table(spark, sf_dir, "embeddings"),
        COSINE_PAIR_THRESHOLD,
        n_planes=EMB_CELL_PLANES,
        block_size=256,
        multi_probe=True,
    )


def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for a stored query vector."""
    return similarity.brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_ID, k=10
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-5 (sign random projection, 8 planes)."""
    return similarity.hyperplane_lsh_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_ID, k=5
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID by stopword-marker density."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.col("lang").alias("labeled_lang"), predicted_lang().alias("predicted_lang"))


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features + blended score per document."""
    return quality_features(load_table(spark, sf_dir, "documents"))


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    return token_stats(load_table(spark, sf_dir, "documents"))


def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw / normalized / bag-of-words content digests."""
    return fingerprints(load_table(spark, sf_dir, "documents"))


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing via mapInPandas (stub codec)."""
    return multimodal.image_metadata(load_table(spark, sf_dir, "documents"))


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing. Oracle-checked as of round 2: the
    byte-offset arithmetic and chunk hashes are mirrored in SQL
    (ASCII corpus makes VARCHAR slicing byte-exact)."""
    return multimodal.sample_frames(load_table(spark, sf_dir, "documents"))


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec proof: synthesize a gradient image per doc_id (even
    ids → 24-bit BMP, odd ids → PNG cycling all five scanline filter
    types — r7), decode it with the library-free parsers, report
    stats from the DECODED pixels; the oracle recomputes them from
    the closed-form channel definitions
    (operators/multimodal.decode_stats)."""
    return multimodal.decode_stats(load_table(spark, sf_dir, "documents"))


def multimodal_jpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated JPEG marker path (r8, VERDICT r7 task 3): per
    doc_id encode a closed-form gray/4:4:4/4:2:0 wrap-gradient image
    with restart interval id%4, independently re-parse the bytes
    (SOF0 dims, DRI, RSTn census), decode, and report metadata +
    DRI-vs-plain bit parity + a pixel error bound; the oracle
    recomputes all of it from the MCU-grid closed forms
    (operators/multimodal.jpeg_meta_stats)."""
    return multimodal.jpeg_meta_stats(load_table(spark, sf_dir, "documents"))


def multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated WAV/PCM audio path (r9, VERDICT r8 task 2): per
    doc_id synthesize a closed-form PCM waveform (channels/bit-depth/
    rate/length all doc_id arithmetic, plus JUNK/cue chunks that make
    the RIFF chunk walk load-bearing), encode a real RIFF/WAVE file,
    decode it back with the numpy parser, and report exact sample
    stats; the oracle recomputes everything — including the payload's
    byte length — from the closed forms
    (operators/multimodal.wav_meta_stats)."""
    return multimodal.wav_meta_stats(load_table(spark, sf_dir, "documents"))


def audio_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated audio-feature seam (r12, VERDICT r11 task 3):
    per doc_id, closed-form int16 PCM waveform → real RIFF/WAVE
    encode → ``audio_feature_row`` (decode, full-scale mono
    normalize, RMS / peak / zero-crossing descriptors). Every
    projected column is exact dyadic-rational double arithmetic the
    oracle recomputes from the same closed forms; the rFFT spectral
    centroid is deliberately excluded (not SQL-expressible — its pin
    is the integer-period-sine pytest). Registered in the slot freed
    by retiring ``percentile_prices`` from the freshness treadmill
    (COVERAGE.md registry retirement policy; the callable stays a
    user-facing API). Seam: operators/multimodal.audio_feature_probe."""
    return multimodal.audio_feature_probe(
        load_table(spark, sf_dir, "documents")
    )


def multimodal_adpcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated COMPRESSED-WAV decode paths (r13, VERDICT r12
    task 2 — the spare rotation slot): per doc_id, closed-form int16
    PCM → one of four compressed framings cycling on id%4 (IMA-ADPCM
    / plain MS-ADPCM / EXTENSIBLE-wrapped MS-ADPCM / G.711 µ- or
    A-law, EXTENSIBLE-wrapped for id%5<2) → full ``decode_wav`` →
    the columns that survive lossy round-trips bit-exactly: decoder
    metadata, duration_ms, and n_bytes — which the oracle recomputes
    from the per-framing closed-form CONTAINER assembly (fmt-chunk
    size per codec/extension layout, fact chunk, block-quantized or
    byte-per-sample data chunk, word-align pad), so a mis-sized
    block, missing fact chunk, or wrong extension layout breaks the
    hash. Sample values are pinned by the scalar-reference pytest
    cross-checks (tests/codec_refs.py), not here — ADPCM is lossy
    and the G.711 tables are not SQL-expressible.
    Seam: operators/multimodal.adpcm_roundtrip_probe."""
    return multimodal.adpcm_roundtrip_probe(
        load_table(spark, sf_dir, "documents")
    )


def ml_forecast_ar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user autoregressive 7-day forecast via applyInPandas (no
    SQL oracle: the AR(14) ridge fit is a 15×15 linear solve, not
    SQL-expressible; driver checks rows-only). The oracle-checked
    twin is ``ml_forecast_ar_exact`` below — together they give the
    AR operator the split green + rows-only driver record (VERDICT
    r5 task 4). Rows outside the PANDAS timestamp domain are
    excluded scan-side (r18, timeseries.pandas_ts_window_sql
    rationale: this is a python-path forecaster — event days cross
    into pandas as datetime64[ns], whose domain ends at 2262-04-11,
    and both an in-domain day's Arrow conversion past that bound
    and the 7-step pd.Timedelta horizon past 9999-12-24 abort the
    applyInPandas worker — measured OutOfBoundsDatetime-class
    PythonException. The JVM closed-form twin ml_forecast_ar_exact
    covers the full operating window; this documented narrower
    domain is the python path's contract)."""
    from mspr2_back_spark.ml import forecast
    from mspr2_back_spark.plans.timeseries import pandas_ts_window_sql

    ev = load_table(spark, sf_dir, "events").filter(
        F.expr(pandas_ts_window_sql("ts"))
    )
    series = forecast.daily_user_series(ev)
    return forecast.autoregressive_forecast(series, horizon=7)


AR2_HORIZON = 7
# Moment sums go through DECIMAL so they are partition-order-free on
# both engines (the workloads.CORR_SCALE contract). Widened to
# (38,6) in r18: the AR(2) normal-equation products are
# daily-total × daily-total, and two IN-CONTRACT daily sums near
# the METRIC edge (~9.9e11 each) multiply to ~9.8e23 — past
# DECIMAL(28,6)'s ~1e22 but comfortably inside (38,6)'s ~1e32
# (measured NUMERIC_VALUE_OUT_OF_RANGE, r18 metric-contract probe;
# the r17 rfm_segments second-level class). Clean-data values are
# bit-identical — the sums are exact at either width and convert
# to double at the same boundary; the oracle imports this constant
# so both engines widen in lockstep. CORR_SCALE stays (28,6): its
# products are lineitem quantity×price, bounded ≤ ~5e6 by the
# money contract's column domains.
AR2_SCALE = "decimal(38,6)"


def _det3_sql(m: list[str]) -> str:
    """3×3 determinant (cofactor expansion along the first row) over
    nine SQL operand strings, row-major — ONE fixed operation order,
    so Spark and DuckDB evaluate the identical IEEE double chain."""
    a, b, c, d, e, f, g, h, i = m
    return (
        f"({a} * ({e} * {i} - {f} * {h})"
        f" - {b} * ({d} * {i} - {f} * {g})"
        f" + {c} * ({d} * {h} - {e} * {g}))"
    )


def ar2_weight_sqls() -> tuple[str, str, str, str]:
    """Cramer's-rule solve of the AR(2)-with-intercept normal
    equations over moment columns n / sx1 / sx2 / sy / s11 / s12 /
    s22 / s1y / s2y: returns (det, det_w1, det_w2, det_b) SQL
    templates (weights = det_*/det). Shared verbatim with the DuckDB
    oracle — the closed-form fit that makes a true multi-step AR
    forecast oracle-checkable."""
    nn = "CAST(n AS DOUBLE)"
    det = _det3_sql(["s11", "s12", "sx1", "s12", "s22", "sx2", "sx1", "sx2", nn])
    d1 = _det3_sql(["s1y", "s12", "sx1", "s2y", "s22", "sx2", "sy", "sx2", nn])
    d2 = _det3_sql(["s11", "s1y", "sx1", "s12", "s2y", "sx2", "sx1", "sy", nn])
    d3 = _det3_sql(["s11", "s12", "s1y", "s12", "s22", "s2y", "sx1", "sx2", "sy"])
    return det, d1, d2, d3


def ar2_step_sql(p1: str, p2: str) -> str:
    """One autoregressive step f = b + w1·prev1 + w2·prev2 — the
    recursion body, shared verbatim with the oracle so the unrolled
    7-step float chain is bit-equal cross-engine."""
    return f"(bb + ww1 * {p1} + ww2 * {p2})"


def ml_forecast_ar_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 7-day forecast from a CLOSED-FORM AR(2)+intercept
    model — the fully oracle-checked twin of ``ml_forecast_ar``
    (VERDICT r5 task 4, exceeded: not just step 1 — with Cramer's
    rule the fit itself is closed-form, so the entire unrolled
    recursion is SQL-expressible and all 7 steps are hash-checked).

    Pipeline, all JVM-side codegen (zero Python):
    1. daily (user, day) totals through DECIMAL (order-free y);
    2. lag-1/lag-2 features via one user-keyed window;
    3. one aggregation to a users-sized moment relation (products
       through DECIMAL(28,6), the corr-matrix discipline) plus
       max_by-carried last two observations;
    4. weights by Cramer's rule (ar2_weight_sqls); degenerate fits
       (n < 3 training rows or singular normal matrix) fall back to
       (w1, w2, b) = (0, 0, last_value), which makes the recursion
       repeat the last value — mirroring _fit_predict_ar's guard;
    5. the 7-step autoregression UNROLLED as chained expressions
       (ar2_step_sql), then posexplode to (step, day, value) rows.

    Scale: two shuffles (user-day agg, user window/agg); everything
    after the moment aggregation is arithmetic over a users-sized
    relation. Sequentiality of autoregression costs nothing here —
    the recursion is unrolled into the projection. Rows outside the
    timestamp operating window are excluded scan-side (r18,
    timeseries.ts_operating_window_sql rationale: date_add(last_day,
    7) from a last observation past 9999-12-24 produces a year-10000
    date, unrepresentable at the driver's collect boundary —
    measured `ValueError: year 10000 is out of range`; the window's
    7-day upper margin bounds forecast_day at 9999-12-31). Oracle
    mirrors the same predicate template.
    """
    from pyspark.sql import Window as W

    from mspr2_back_spark.functions.numeric import METRIC
    from mspr2_back_spark.plans.timeseries import ts_operating_window_sql

    ev = load_table(spark, sf_dir, "events").filter(
        F.expr(ts_operating_window_sql("ts"))
    )
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast(METRIC)).cast("double").alias("y"))
    w = W.partitionBy("user_id").orderBy("day")
    lagged = daily.select(
        "user_id",
        "day",
        "y",
        F.lag("y", 1).over(w).alias("x1"),
        F.lag("y", 2).over(w).alias("x2"),
    )
    t = F.col("x2").isNotNull()

    def msum(expr: F.Column, name: str) -> F.Column:
        return (
            F.sum(F.when(t, expr).cast(AR2_SCALE)).cast("double").alias(name)
        )

    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    agg = lagged.groupBy("user_id").agg(
        F.sum(F.when(t, F.lit(1)).otherwise(F.lit(0))).cast("bigint").alias("n"),
        msum(x1, "sx1"),
        msum(x2, "sx2"),
        msum(y, "sy"),
        msum(x1 * x1, "s11"),
        msum(x1 * x2, "s12"),
        msum(x2 * x2, "s22"),
        msum(x1 * y, "s1y"),
        msum(x2 * y, "s2y"),
        F.expr("max_by(y, day)").alias("pc"),
        F.expr("max_by(x1, day)").alias("pa_raw"),
        F.max("day").alias("last_day"),
    )
    det, d1, d2, d3 = ar2_weight_sqls()
    ok = f"(n >= 3 AND {det} <> CAST(0.0 AS DOUBLE))"
    wts = agg.select(
        "user_id",
        "last_day",
        F.col("pc"),
        F.expr("COALESCE(pa_raw, CAST(0.0 AS DOUBLE))").alias("pa"),
        F.expr(
            f"CASE WHEN {ok} THEN {d1} / {det} ELSE CAST(0.0 AS DOUBLE) END"
        ).alias("ww1"),
        F.expr(
            f"CASE WHEN {ok} THEN {d2} / {det} ELSE CAST(0.0 AS DOUBLE) END"
        ).alias("ww2"),
        F.expr(f"CASE WHEN {ok} THEN {d3} / {det} ELSE pc END").alias("bb"),
    )
    cur = wts
    prev2, prev1 = "pa", "pc"
    for k in range(1, AR2_HORIZON + 1):
        cur = cur.withColumn(f"f{k}", F.expr(ar2_step_sql(prev1, prev2)))
        prev2, prev1 = prev1, f"f{k}"
    out = cur.select(
        "user_id",
        "last_day",
        F.posexplode(
            F.array(*[F.col(f"f{k}") for k in range(1, AR2_HORIZON + 1)])
        ).alias("pos", "fv"),
    )
    return out.select(
        "user_id",
        (F.col("pos") + 1).cast("int").alias("step"),
        F.expr("date_add(last_day, pos + 1)").alias("forecast_day"),
        F.round("fv", 6).alias("forecast_value"),
    ).orderBy("user_id", "step")


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: connected components (min-label
    propagation) over the MinHash-verified pair graph, plus each
    cluster's size. The step after pair generation in any real dedup
    pipeline — pairs alone under-merge transitive duplicates."""
    from pyspark.sql import Window as W

    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), MINHASH_THRESHOLD
    )
    labels = dedup.near_dup_clusters(pairs)
    size_w = W.partitionBy("cluster")
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("cluster").alias("cluster_id"),
        F.count(F.lit(1)).over(size_w).alias("cluster_size"),
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection — the dedup end-game the cluster labels
    exist for: within each near-dup cluster keep the single
    highest-quality document (blended quality score, lowest doc_id on
    ties) and mark every other member for drop, carrying the
    canonical survivor's id so downstream stages can redirect
    references. Pairs find duplicates, clusters merge them
    transitively; THIS decides which copy a 100 TB corpus keeps.

    Scale shape: rides the ``dedup_clusters`` subplan unchanged; the
    additions are one doc_id join of the label relation against a
    2-column corpus projection (labels carry only docs with a
    near-dup edge, so the join's small side is the label relation —
    AQE broadcasts it while it fits, shuffle-join on doc_id past
    that) and ONE window exchange keyed on cluster_id over clustered
    docs only (≪ corpus). The quality score is a map-side
    projection; rank, size, and canonical-id all share the single
    cluster_id sort."""
    from pyspark.sql import Window as W

    from mspr2_back_spark.functions.text import quality_score_col

    docs = load_table(spark, sf_dir, "documents")
    labels = dedup.near_dup_clusters(
        dedup.minhash_lsh_pairs(docs, MINHASH_THRESHOLD)
    )
    scored = docs.select("doc_id", quality_score_col().alias("quality_score"))
    member = labels.join(scored, labels.node == scored.doc_id).select(
        scored.doc_id,
        F.col("cluster").alias("cluster_id"),
        "quality_score",
    )
    part = W.partitionBy("cluster_id")
    rank = part.orderBy(F.desc("quality_score"), F.asc("doc_id"))
    full = rank.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return member.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(part).alias("cluster_size"),
        "quality_score",
        (F.row_number().over(rank) == 1).alias("kept"),
        F.first("doc_id").over(full).alias("canonical_id"),
    ).orderBy("doc_id")


def _split_assignments(docs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, split, text): the cluster-atomic
    train/val/test assignment shared by ``leakage_safe_splits`` and
    ``split_contamination_audit`` — connected-component label
    (singletons self-label), split = md5-nibble(label) mod 20 →
    18/1/1."""
    labels = dedup.near_dup_clusters(
        dedup.minhash_lsh_pairs(docs, MINHASH_THRESHOLD)
    )
    d = docs.select("doc_id", "text")
    assigned = d.join(labels, d.doc_id == labels.node, "left").select(
        d.doc_id,
        F.coalesce(labels.cluster, d.doc_id).alias("cluster_id"),
        F.col("text"),
    )
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(cluster_id AS STRING)), 1, 4),"
        " 16, 10) AS INT) % 20"
    )
    return assigned.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 18, F.lit("train"))
        .when(bucket == 18, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        "text",
    )


def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment that can never leak a near-dup pair
    across splits: docs are split at the DEDUP-CLUSTER level, not the
    document level. Every doc gets its connected-component label from
    the MinHash-verified pair graph (singletons label themselves),
    and the split is a pure function of that label — portable md5
    arithmetic, first 4 nibbles mod 20 → 18/1/1 train/val/test — so
    all members of a cluster travel together by construction; the
    standard random-split mistake (a val doc whose near-twin is in
    train) is structurally impossible.

    Scale shape: the only heavy work is the clustering itself (same
    plan as ``dedup_clusters``); the assignment adds one LEFT join
    doc→label on doc_id (labels ≪ docs — only docs with a near-dup
    edge appear) and a map-side hash of the label. No extra shuffle,
    no sort: split quotas hold in expectation per cluster, exactly
    what a 100 TB corpus wants (exact quotas would force a global
    sort on a value the clusters must be allowed to straddle)."""
    docs = load_table(spark, sf_dir, "documents")
    return _split_assignments(docs).select(
        "doc_id",
        "cluster_id",
        "split",
        F.size(F.expr(WORDS)).alias("n_tokens"),
    ).orderBy("doc_id")


def split_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The residual-leakage audit for the cluster-atomic split:
    ``leakage_safe_splits`` guarantees no MinHash-verified near-dup
    pair straddles splits, but SPAN-level overlap below the Jaccard
    threshold still can — a val doc quoting one paragraph of a train
    doc leaks eval signal without ever becoming a near-dup pair.
    Per held-out split (val/test): how many docs share ANY distinct
    word-3-gram span with the train split, and the mean per-doc
    fraction of spans shared.

    Plan shape for 100 TB: the train shingle set is ~90% of the
    corpus, so the benchmark-screen trick (broadcast the small side)
    does NOT apply — instead one groupBy(shingle) computes an
    in-train verdict per shingle (partial-agg'ed MAX, shuffle ∝
    distinct shingles), and the held-out rows join it ON the same
    shingle key, reusing the exchange's partitioning. Two shuffles
    proportional to shingle cardinality, one tiny per-(split, doc)
    fold — never a corpus-sized broadcast, never a pair join."""
    docs = load_table(spark, sf_dir, "documents")
    return _contamination_audit_frame(_split_assignments(docs))


def _contamination_audit_frame(splits: DataFrame) -> DataFrame:
    """The audit body over a (doc_id, cluster_id, split, text) frame
    — factored so the planted-ground-truth test can drive it on the
    controlled-duplication corpus (tests/test_pipeline_ops.py)."""
    ex = dedup.shingles_exploded(dedup._spread(splits))
    exs = ex.join(
        splits.select(F.col("doc_id").alias("doc"), "split"), "doc"
    )
    verdict = exs.groupBy("shingle").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "in_train"
        )
    )
    holdout = exs.filter(F.col("split") != "train")
    per_doc = (
        holdout.join(verdict, "shingle")
        .groupBy("split", "doc")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("in_train").alias("n_shared"),
        )
    )
    return (
        per_doc.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_shared") > 0, 1).otherwise(0)).alias(
                "n_leaking_docs"
            ),
            F.round(
                F.avg(F.col("n_shared").cast("double") / F.col("n_spans")), 6
            ).alias("mean_span_overlap"),
        )
        .orderBy("split")
    )


def repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication: per-document fraction of word-
    3-gram spans shared with any other document."""
    return dedup.repeated_span_coverage(load_table(spark, sf_dir, "documents"))


def contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: training docs sharing any
    word-3-gram span with the held-out set (doc_id % 50 == 0 stands
    in as the benchmark membership predicate)."""
    return dedup.contamination_screen(
        load_table(spark, sf_dir, "documents"), F.col("doc_id") % 50 == 0
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact audit. The word-soup corpus carries no
    natural PII, so deterministic synthetic PII (email/phone/IPv4
    derived from doc_id, on disjoint modulo classes) is injected
    before scrubbing — detection and redaction then have non-trivial,
    oracle-checkable work on every third/fifth/seventh row."""
    from mspr2_back_spark.functions.pii import scrub_documents

    d = load_table(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" call +1 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return scrub_documents(injected)



def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup: near-dup pairs between the standing corpus
    (doc_id % 10 != 7) and the new batch (doc_id % 10 == 7) only —
    linear in the batch, never corpus x corpus."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.incremental_ngram_pairs(
        d.filter(F.col("doc_id") % 10 != 7),
        d.filter(F.col("doc_id") % 10 == 7),
        NGRAM_JACCARD_THRESHOLD,
    )


def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source keep rates (1.0 / 0.5 /
    0.25 / 0.1 by source index band) applied via the engine-portable
    md5 bucket, reported as per-source kept/total counts."""
    from mspr2_back_spark.operators.sampling import mixture_sample

    d = load_table(spark, sf_dir, "documents")
    # try_cast (r17): a source label outside the srcNN format made
    # the bare ANSI cast abort the scan (CAST_INVALID_INPUT on e.g.
    # 'rd_source'). try_cast NULLs the index instead, every when()
    # comparison on NULL is false, and the row falls into the
    # otherwise-branch tail rate (0.1) — unknown-format sources
    # sample at the most conservative rate rather than killing the
    # job. DuckDB TRY_CAST mirrors in the oracle.
    idx = F.substring("source", 4, 10).try_cast("int")
    rate = (
        F.when(idx < 5, F.lit(1.0))
        .when(idx < 10, F.lit(0.5))
        .when(idx < 15, F.lit(0.25))
        .otherwise(F.lit(0.1))
    )
    kept = mixture_sample(d, rate, "doc_id").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept")
    )
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return totals.join(kept, "source", "left").select(
        "source",
        "n_total",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.round(F.coalesce("n_kept", F.lit(0)) / F.col("n_total"), 6).alias(
            "kept_ratio"
        ),
    )


def quality_filter_frame(d: DataFrame) -> DataFrame:
    """End-to-end curation verdict per document, fusing the pipeline
    signals: exact-dup keeper status, token-count band, blended
    quality score, language agreement. First failing rule wins (fixed
    rule order — the filter ladder every corpus recipe runs)."""
    from mspr2_back_spark.functions.text import WORDS, quality_score_col
    # Single-pass: every per-row signal (tokens, score, language,
    # content hash) computed in ONE projection of one scan — the
    # join-per-signal formulation reads the corpus once per signal,
    # which is 4 extra scans at 100 TB for zero benefit.
    signals = d.select(
        "doc_id",
        F.expr(f"size({WORDS})").alias("n_ws_tokens"),
        quality_score_col().alias("quality_score"),
        F.col("lang").alias("labeled_lang"),
        predicted_lang().alias("pl"),
        # coalesce: NULL text hashes as the empty doc on BOTH
        # engines (SQL md5(NULL)=NULL never equi-joins/groups)
        F.md5(F.coalesce("text", F.lit(""))).alias("ch"),
    )
    from pyspark.sql import Window as W

    # Dup-keeper via a window on the content hash: one exchange on ch
    # instead of a second corpus scan + groupBy + join.
    with_keeper = signals.withColumn(
        "keeper_id", F.min("doc_id").over(W.partitionBy("ch"))
    )
    verdict = (
        F.when(F.col("doc_id") != F.col("keeper_id"), F.lit("duplicate"))
        .when(F.col("n_ws_tokens") < 25, F.lit("too_short"))
        .when(F.col("n_ws_tokens") > 90, F.lit("too_long"))
        .when(F.col("quality_score") < 0.55, F.lit("low_quality"))
        .when(F.col("pl") != F.col("labeled_lang"), F.lit("lang_mismatch"))
        .otherwise(F.lit("keep"))
    )
    return with_keeper.select(
        "doc_id", "quality_score", "n_ws_tokens", verdict.alias("verdict")
    )


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated wrapper over :func:`quality_filter_frame`."""
    return quality_filter_frame(load_table(spark, sf_dir, "documents"))



def dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the streaming ingest gate
    (streaming/events.py::dedup_gate_against_corpus): odd-id docs
    (the "arriving batch") SimHash-checked against the even-id
    standing corpus. Same function both modes — the stream-static
    join's static side is this corpus fingerprint set."""
    from mspr2_back_spark.streaming.events import dedup_gate_against_corpus

    d = load_table(spark, sf_dir, "documents")
    corpus_fp = dedup.simhash_fingerprints(d.filter(F.col("doc_id") % 2 == 0))
    return dedup_gate_against_corpus(d.filter(F.col("doc_id") % 2 == 1), corpus_fp)


def dedup_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end product of the dedup pipeline: per-source corpus size
    before and after dropping near-duplicate cluster losers (cluster
    members that are not the minimum-id representative). Pairs →
    clusters → anti-join — what a user actually materializes after
    running near-dup detection."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, MINHASH_THRESHOLD)
    labels = dedup.near_dup_clusters(pairs)
    losers = labels.filter(F.col("node") != F.col("cluster")).select(
        F.col("node").alias("doc_id")
    )
    # no broadcast hint: losers is unbounded (duplicate docs can be
    # a large corpus fraction); AQE picks broadcast when it fits.
    kept = d.join(losers, "doc_id", "left_anti")
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    kept_counts = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return totals.join(kept_counts, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.round(F.coalesce("n_kept", F.lit(0)) / F.col("n_docs"), 6).alias(
            "kept_ratio"
        ),
    )


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget curation (TOKEN_BUDGET_PER_SOURCE
    tokens/source): the training-mix capping step, selected by whole
    md5 hash buckets so the only corpus-sized work is one
    (source, bucket) aggregation and the keep/drop is a scan-side
    broadcast-joined filter (see operators/sampling.py::
    token_budget_sample for the 100 TB rationale)."""
    from mspr2_back_spark.operators.sampling import token_budget_sample as tbs

    return tbs(
        load_table(spark, sf_dir, "documents"),
        budget_per_source=TOKEN_BUDGET_PER_SOURCE,
    )


PIPELINE_QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "simhash_bucket_stats": simhash_bucket_stats,
    "simhash_near_degree": simhash_near_degree,
    "simhash64_near_degree": simhash64_near_degree,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "dedup_embedding_cells": dedup_embedding_cells,
    "ann_topk": ann_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "text_lang_id": text_lang_id,
    "text_quality": text_quality,
    "text_token_stats": text_token_stats,
    "text_fingerprints": text_fingerprints,
    "multimodal_meta": multimodal_meta,
    "multimodal_frames": multimodal_frames,
    "multimodal_decode_stats": multimodal_decode_stats,
    "multimodal_jpeg_meta": multimodal_jpeg_meta,
    "multimodal_wav_stats": multimodal_wav_stats,
    "audio_feature_stats": audio_feature_stats,
    "multimodal_adpcm_stats": multimodal_adpcm_stats,
    "ml_forecast_ar": ml_forecast_ar,
    "ml_forecast_ar_exact": ml_forecast_ar_exact,
    "dedup_clusters": dedup_clusters,
    "dedup_keep_best": dedup_keep_best,
    "leakage_safe_splits": leakage_safe_splits,
    "split_contamination_audit": split_contamination_audit,
    "repeated_spans": repeated_spans,
    "contamination_screen": contamination_screen,
    "pii_scrub": pii_scrub,
    "dedup_incremental": dedup_incremental,
    "source_mixture_sample": source_mixture_sample,
    "quality_filter": quality_filter,
    "dedup_gate": dedup_gate,
    "dedup_corpus_summary": dedup_corpus_summary,
    "token_budget_sample": token_budget_sample,
}
