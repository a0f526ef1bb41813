"""Streaming parity + ML smoke tests (SURVEY §5 strategy #5)."""

from __future__ import annotations

import math
import shutil

import numpy as np

import pytest

from pyspark.sql import functions as F

from mspr2_back_spark.ml import forecast
from mspr2_back_spark.plans.queries import hourly_events
from mspr2_back_spark.sources.readers import load_table
from mspr2_back_spark.streaming import events as stream_events


def test_streaming_matches_batch_hourly(spark, sf_dir, tmp_path):
    """Lambda-parity: availableNow streaming over the same events must
    reproduce the batch hourly aggregate exactly."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_stream")
    src.write.mode("overwrite").parquet(stream_dir)

    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    agg = stream_events.windowed_event_counts(stream)
    stream_events.run_to_memory(agg, "hourly_stream", mode="complete")
    got = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("hourly_stream").collect()
    }
    expected = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in hourly_events(spark, sf_dir).collect()
    }
    assert got == expected
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_watermark_present_in_plan(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_stream2")
    src.limit(10).write.mode("overwrite").parquet(stream_dir)
    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    agg = stream_events.windowed_event_counts(stream, watermark="30 minutes")
    assert "EventTimeWatermark" in agg._jdf.queryExecution().logical().toString()


def test_rf_metrics_reasonable(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(2000)
    metrics = forecast.train_rf_metrics(
        li,
        numeric_features=["l_quantity", "l_discount", "l_tax"],
        categorical_features=["l_returnflag"],
        label="l_extendedprice",
    )
    assert set(metrics) == {"r2", "rmse", "mae"}
    assert metrics["rmse"] > 0 and metrics["mae"] > 0
    assert -1.5 <= metrics["r2"] <= 1.0


def test_autoregressive_forecast_contract(spark, sf_dir):
    series = forecast.daily_user_series(load_table(spark, sf_dir, "events"))
    out = forecast.autoregressive_forecast(series, horizon=7).collect()
    n_users = series.select("user_id").distinct().count()
    assert len(out) == 7 * n_users
    one_user = sorted(
        (r for r in out if r.user_id == out[0].user_id), key=lambda r: r.step
    )
    assert [r.step for r in one_user] == [1, 2, 3, 4, 5, 6, 7]
    days = [r.forecast_day for r in one_user]
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))
    assert all(r.forecast_value == r.forecast_value for r in out)  # no NaN


def test_forecast_deterministic(spark, sf_dir):
    series = forecast.daily_user_series(load_table(spark, sf_dir, "events"))
    a = {(r.user_id, r.step): r.forecast_value
         for r in forecast.autoregressive_forecast(series).collect()}
    b = {(r.user_id, r.step): r.forecast_value
         for r in forecast.autoregressive_forecast(series).collect()}
    assert a == b


def test_forecast_linear_trend_extrapolates():
    import numpy as np

    y = np.arange(1.0, 31.0)  # perfect linear trend
    preds = forecast._fit_predict_ar(y, lookback=5, horizon=3)
    assert preds == pytest.approx([31.0, 32.0, 33.0], rel=1e-3)


def test_stream_sessionization_matches_batch(spark, sf_dir, tmp_path):
    """Append-mode session windows: every emitted session must match a
    batch-computed session exactly (sessions still open when the
    stream drains stay in state and are legitimately absent)."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_sess")
    src.write.mode("overwrite").parquet(stream_dir)

    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    sess = stream_events.sessionized_event_counts(
        stream, gap="30 minutes", watermark="1 minute"
    )
    stream_events.run_to_memory(sess, "sessions_stream", mode="append")
    emitted = spark.table("sessions_stream").collect()
    assert emitted  # watermark passes all but the newest sessions

    batch = (
        src.groupBy(
            F.session_window("ts", "30 minutes").alias("win"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("win.start").alias("session_start"),
                F.col("win.end").alias("session_end"), "n_events")
    )
    expected = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in batch.collect()
    }
    for r in emitted:
        key = (r.user_id, r.session_start, r.session_end)
        assert expected.get(key) == r.n_events, f"session {key} diverges from batch"

    # Cross-check session *counts* per user against the lag-based batch
    # sessionizer (plans/extensions.py) — two formulations, same gaps.
    from mspr2_back_spark.plans.extensions import sessionize_events

    lag_counts = {r.user_id: r.n_sessions for r in sessionize_events(spark, sf_dir).collect()}
    win_counts = {}
    for r in batch.collect():
        win_counts[r.user_id] = win_counts.get(r.user_id, 0) + 1
    assert win_counts == lag_counts
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState: final running totals must equal the
    batch per-user aggregates (counts exact; float sums to 1e-6)."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_state")
    src.write.mode("overwrite").parquet(stream_dir)

    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    totals = stream_events.running_user_totals(stream)
    stream_events.run_to_memory(totals, "running_totals", mode="update")

    final = {}
    for r in spark.table("running_totals").collect():
        prev = final.get(r.user_id)
        if prev is None or r.n_events > prev[0]:
            final[r.user_id] = (r.n_events, r.total_value)
    expected = {
        r.user_id: (r.n, r.v)
        for r in src.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(final) == set(expected)
    for uid, (n, v) in expected.items():
        assert final[uid][0] == n
        assert abs(final[uid][1] - v) < 1e-6 * max(1.0, abs(v))
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_watermark_drops_late_data(spark, sf_dir, tmp_path):
    """Restart with the same checkpoint: rows older than the persisted
    watermark are dropped, closed windows are never re-emitted."""
    import pandas as pd

    src = load_table(spark, sf_dir, "events")
    stream_dir = tmp_path / "events_late"
    out_dir = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")
    stream_dir.mkdir()

    def write_batch(rows, name):
        # The file stream source watches one directory level, so land
        # each batch's part files directly in it under unique names.
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pdf["props"] = "{}"
        staging = tmp_path / f"stage_{name}"
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(staging))
        for i, f in enumerate(staging.glob("part-*.parquet")):
            f.rename(stream_dir / f"{name}_{i}.parquet")

    write_batch(
        [
            (1, "2024-06-01 10:05:00", 1, "click", 1.0),
            (2, "2024-06-01 11:10:00", 1, "click", 1.0),
            (3, "2024-06-01 13:00:00", 1, "click", 1.0),  # watermark → 12:30
        ],
        "b1",
    )
    schema = spark.read.parquet(str(stream_dir)).schema
    stream = stream_events.read_event_stream(spark, str(stream_dir), schema)
    agg = stream_events.windowed_event_counts(stream, watermark="30 minutes")
    stream_events.run_to_parquet(agg, out_dir, ckpt)
    first = {r.hour: r.n_events for r in spark.read.parquet(out_dir).collect()}
    assert first == {"2024-06-01 10": 1, "2024-06-01 11": 1}  # 13:00 window open

    # Late row (09:00 < persisted watermark 12:30) must be dropped;
    # 13:40 is on time (joins the open 13:00 window); 15:30 pushes the
    # watermark to 15:00, past the 13:00 window's end, closing it.
    write_batch(
        [
            (4, "2024-06-01 09:00:00", 1, "click", 1.0),
            (5, "2024-06-01 13:40:00", 1, "click", 1.0),
            (6, "2024-06-01 15:30:00", 1, "click", 1.0),
        ],
        "b2",
    )
    stream2 = stream_events.read_event_stream(spark, str(stream_dir), schema)
    agg2 = stream_events.windowed_event_counts(stream2, watermark="30 minutes")
    stream_events.run_to_parquet(agg2, out_dir, ckpt)
    second = {r.hour: r.n_events for r in spark.read.parquet(out_dir).collect()}
    assert "2024-06-01 09" not in second  # late row evicted, window never emitted
    assert second["2024-06-01 13"] == 2  # both on-time rows; late row excluded
    assert "2024-06-01 15" not in second  # newest window still open


def test_predict_single_row(spark, sf_dir):
    from mspr2_back_spark.ml.forecast import build_rf_pipeline, predict_single

    li = load_table(spark, sf_dir, "lineitem").limit(1000)
    model = build_rf_pipeline(
        ["l_quantity", "l_discount"], ["l_returnflag"], "l_extendedprice"
    ).fit(li)
    pred = predict_single(
        model, spark,
        {"l_quantity": 10.0, "l_discount": 0.05, "l_returnflag": "N"},
    )
    assert pred == pred and pred > 0  # finite, positive price
    # Single-row path must agree with the batch path on the same row.
    batch = model.transform(
        spark.createDataFrame(
            [{"l_quantity": 10.0, "l_discount": 0.05, "l_returnflag": "N"}]
        )
    ).select("prediction").first()[0]
    assert pred == batch


def test_foreachbatch_gold_upsert(spark, sf_dir, tmp_path):
    """Two availableNow runs: the second's fresher aggregates replace
    the first's rows per key instead of appending duplicates."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = tmp_path / "gold_in"
    stream_dir.mkdir()
    gold = str(tmp_path / "gold_out")
    ckpt = str(tmp_path / "gold_ckpt")

    def land(df, name):
        staging = tmp_path / f"gstage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        for i, f in enumerate(staging.glob("part-*.parquet")):
            f.rename(stream_dir / f"{name}_{i}.parquet")

    half = src.limit(src.count() // 2)
    land(half, "b1")

    def run():
        stream = stream_events.read_event_stream(spark, str(stream_dir), src.schema)
        counts = stream.groupBy("event_type").count()
        stream_events.run_upsert_to_gold(
            counts, gold, ckpt, keys=["event_type"]
        )

    run()
    first = {r.event_type: r["count"] for r in spark.read.parquet(gold).collect()}
    assert first

    land(src.subtract(half), "b2")
    run()
    final = {r.event_type: r["count"] for r in spark.read.parquet(gold).collect()}
    # One row per key (upsert, not append)...
    assert len(final) == spark.read.parquet(gold).count()
    # ...and values reflect batch-2 increments over batch 1.
    assert all(final[k] >= v for k, v in first.items() if k in final)


def test_gold_upsert_partition_scoped_merge(spark, sf_dir, tmp_path):
    """The r6 bucket-partitioned gold merge: (a) the final table is
    identical to the full-table merge semantics computed in batch,
    and (b) a micro-batch that touches a strict subset of buckets
    leaves every untouched bucket's files physically unrewritten
    (same names, same bytes) — the O(touched), not O(gold), rewrite
    contract."""
    import hashlib
    from pathlib import Path

    src = load_table(spark, sf_dir, "events")
    stream_dir = tmp_path / "pgold_in"
    stream_dir.mkdir()
    gold = str(tmp_path / "pgold_out")
    ckpt = str(tmp_path / "pgold_ckpt")

    def land(df, name):
        staging = tmp_path / f"pgstage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        for i, f in enumerate(staging.glob("part-*.parquet")):
            f.rename(stream_dir / f"{name}_{i}.parquet")

    def run():
        stream = stream_events.read_event_stream(
            spark, str(stream_dir), src.schema
        )
        counts = stream.groupBy("event_type").count()
        stream_events.run_upsert_to_gold(
            counts, gold, ckpt, keys=["event_type"], n_buckets=16
        )

    def inventory():
        return {
            str(p.relative_to(gold)): hashlib.md5(p.read_bytes()).hexdigest()
            for p in Path(gold).rglob("*.parquet")
        }

    land(src, "b1")
    run()
    before = inventory()
    base_counts = {
        r.event_type: r["count"]
        for r in spark.read.parquet(gold).collect()
    }

    # batch 2: one single event type — exactly one bucket is touched
    one_type = src.select("event_type").first()[0]
    land(src.filter(F.col("event_type") == one_type), "b2")
    run()
    after = inventory()

    touched_bucket = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(one_type)), F.lit(16)).cast("int").alias("b")
    ).first()[0]
    touched_dir = f"_bucket={touched_bucket}"
    untouched_before = {
        p: h for p, h in before.items() if not p.startswith(touched_dir)
    }
    untouched_after = {
        p: h for p, h in after.items() if not p.startswith(touched_dir)
    }
    # the corpus has >1 event type, so untouched buckets must exist,
    # and their files must be EXACTLY the batch-1 files, byte for byte
    assert untouched_before
    assert untouched_after == untouched_before
    # the touched bucket was rewritten (fresh part files)
    assert {p for p in after if p.startswith(touched_dir)} != {
        p for p in before if p.startswith(touched_dir)
    }

    # full-table parity: gold == the merge semantics over all data —
    # batch-1 counts for every other key, cumulative count for the
    # re-emitted key (streaming state accumulates across runs)
    expected = dict(base_counts)
    expected[one_type] = (
        base_counts[one_type]
        + src.filter(F.col("event_type") == one_type).count()
    )
    final = {
        r.event_type: r["count"]
        for r in spark.read.parquet(gold).collect()
    }
    assert final == expected


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream time-bounded join == the same join in batch over
    the drained input."""
    src = load_table(spark, sf_dir, "events")
    clicks_dir = str(tmp_path / "ss_clicks")
    views_dir = str(tmp_path / "ss_views")
    clicks_b = src.filter(F.col("event_type") == "click")
    views_b = src.filter(F.col("event_type") == "view")
    clicks_b.write.parquet(clicks_dir)
    views_b.write.parquet(views_dir)

    c_stream = stream_events.read_event_stream(spark, clicks_dir, src.schema)
    v_stream = stream_events.read_event_stream(spark, views_dir, src.schema)
    joined = stream_events.join_event_streams(c_stream, v_stream)
    stream_events.run_to_memory(joined, "ss_join", mode="append")
    got = {
        (r.click_id, r.view_id)
        for r in spark.table("ss_join").collect()
    }

    expected = {
        (r.click_id, r.view_id)
        for r in stream_events.join_event_streams(
            clicks_b, views_b  # same logic, batch DataFrames
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_dedup_drops_replayed_events(spark, sf_dir, tmp_path):
    """Streaming exact dedup: dropDuplicates on event_id within the
    watermark absorbs replayed input (at-least-once sources), so the
    sink sees each event once."""
    src = load_table(spark, sf_dir, "events").limit(500)
    stream_dir = tmp_path / "dedup_in"
    stream_dir.mkdir()

    def land(df, name):
        staging = tmp_path / f"ddstage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        for i, f in enumerate(staging.glob("part-*.parquet")):
            f.rename(stream_dir / f"{name}_{i}.parquet")

    land(src, "original")
    land(src, "replay")  # the same 500 events again

    stream = stream_events.read_event_stream(spark, str(stream_dir), src.schema)
    deduped = stream.withWatermark("ts", "10 days").dropDuplicates(["event_id"])
    stream_events.run_to_memory(deduped, "dedup_stream", mode="append")
    out = spark.table("dedup_stream").select("event_id").collect()
    assert len(out) == 500  # 1000 input rows, every event exactly once
    assert len({r.event_id for r in out}) == 500


def test_stream_stream_left_outer_emits_unmatched(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join: inner pairs plus null-view rows
    for clicks the watermark has proven unmatched."""
    src = load_table(spark, sf_dir, "events")
    clicks_dir = str(tmp_path / "lo_clicks")
    views_dir = str(tmp_path / "lo_views")
    clicks_b = src.filter(F.col("event_type") == "click")
    views_b = src.filter(F.col("event_type") == "view")
    clicks_b.write.parquet(clicks_dir)
    views_b.write.parquet(views_dir)

    c_stream = stream_events.read_event_stream(spark, clicks_dir, src.schema)
    v_stream = stream_events.read_event_stream(spark, views_dir, src.schema)
    joined = stream_events.join_event_streams(
        c_stream, v_stream, watermark="1 minute", how="left_outer"
    )
    stream_events.run_to_memory(joined, "lo_join", mode="append")
    rows = spark.table("lo_join").collect()
    matched = {(r.click_id, r.view_id) for r in rows if r.view_id is not None}
    unmatched = {r.click_id for r in rows if r.view_id is None}
    assert matched and unmatched

    batch = stream_events.join_event_streams(clicks_b, views_b)
    expected_matched = {(r.click_id, r.view_id) for r in batch.collect()}
    assert matched == expected_matched
    # Every null-view click truly has no view within the window.
    matched_clicks = {cid for cid, _ in expected_matched}
    assert not (unmatched & matched_clicks)


class TestNumpyLSTM:
    """M4 shape parity: the torch-absent path must still exercise the
    reference's model topology (2×LSTM(128) + FC(1), ref
    train_lstm_multipays (1).py:80-117)."""

    def test_parameter_shapes_match_reference_topology(self):
        import numpy as np

        m = forecast.NumpyLSTM()
        assert len(m.layers) == 2
        assert m.layers[0]["W_ih"].shape == (4 * 128, 1)
        assert m.layers[1]["W_ih"].shape == (4 * 128, 128)
        for layer in m.layers:
            assert layer["W_hh"].shape == (4 * 128, 128)
            assert layer["b_ih"].shape == (4 * 128,)
            assert layer["b_hh"].shape == (4 * 128,)
        assert m.W_fc.shape == (1, 128)
        out = m.forward(np.linspace(0, 1, 14))
        assert isinstance(out, float) and out == out

    def test_torch_state_dict_names_load(self):
        import numpy as np

        m = forecast.NumpyLSTM(hidden_size=4, num_layers=2)
        rng = np.random.default_rng(0)
        state = {}
        for n in (0, 1):
            in_sz = 1 if n == 0 else 4
            state[f"lstm.weight_ih_l{n}"] = rng.normal(size=(16, in_sz))
            state[f"lstm.weight_hh_l{n}"] = rng.normal(size=(16, 4))
            state[f"lstm.bias_ih_l{n}"] = rng.normal(size=16)
            state[f"lstm.bias_hh_l{n}"] = rng.normal(size=16)
        state["fc.weight"] = rng.normal(size=(1, 4))
        state["fc.bias"] = rng.normal(size=1)
        m.load_torch_state(state)
        assert (m.layers[1]["W_hh"] == state["lstm.weight_hh_l1"]).all()
        a = m.forward([0.1, 0.5, 0.9])
        assert a == m.forward([0.1, 0.5, 0.9])  # deterministic

    def test_lstm_forecast_loop_contract(self):
        import numpy as np

        y = np.arange(30, dtype=np.float64)
        preds = forecast._fit_predict_lstm(y, lookback=14, horizon=7)
        assert preds.shape == (7,) and np.isfinite(preds).all()
        # inverse scaling puts predictions back in data units
        assert preds.min() > -30 and preds.max() < 60

    def test_lstm_model_through_applyinpandas(self, spark, sf_dir):
        series = forecast.daily_user_series(
            load_table(spark, sf_dir, "events")
        ).filter(F.col("user_id") < 5)
        out = forecast.autoregressive_forecast(series, horizon=3, model="lstm")
        rows = out.collect()
        assert len(rows) == 5 * 3
        assert all(r.forecast_value == r.forecast_value for r in rows)


def test_streaming_pii_scrub_matches_batch(spark, sf_dir, tmp_path):
    """Batch/stream unification of the curation surface: the same
    scrub_documents expressions run unchanged over readStream and
    reproduce the batch scrub exactly (per-row expressions are
    trivially streamable — this pins that no batch-only construct
    sneaks into the scrubber)."""
    from mspr2_back_spark.functions.pii import scrub_documents

    src = load_table(spark, sf_dir, "documents")
    stream_dir = str(tmp_path / "docs_stream")
    src.write.mode("overwrite").parquet(stream_dir)

    stream = spark.readStream.schema(src.schema).parquet(stream_dir)
    scrubbed = scrub_documents(stream)
    stream_events.run_to_memory(scrubbed, "pii_stream", mode="append")
    got = {
        r.doc_id: (r.n_email, r.n_phone, r.n_ipv4, r.redacted_hash)
        for r in spark.table("pii_stream").collect()
    }
    expected = {
        r.doc_id: (r.n_email, r.n_phone, r.n_ipv4, r.redacted_hash)
        for r in scrub_documents(src).collect()
    }
    assert got == expected
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_streaming_quality_gate_matches_batch(spark, sf_dir, tmp_path):
    """The per-row half of quality_filter (token band + quality
    score) streams unchanged; the corpus-dependent rules (dup,
    language priors) stay in the batch layer by design."""
    from mspr2_back_spark.functions.text import quality_features

    src = load_table(spark, sf_dir, "documents")
    stream_dir = str(tmp_path / "docs_stream_q")
    src.write.mode("overwrite").parquet(stream_dir)

    stream = spark.readStream.schema(src.schema).parquet(stream_dir)
    gated = quality_features(stream).filter(F.col("quality_score") >= 0.55)
    stream_events.run_to_memory(gated, "quality_stream", mode="append")
    got = sorted(r.doc_id for r in spark.table("quality_stream").collect())
    expected = sorted(
        r.doc_id
        for r in quality_features(src).filter(F.col("quality_score") >= 0.55).collect()
    )
    assert got == expected and len(got) > 0
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_stream_static_dedup_gate(spark, sf_dir, tmp_path):
    """Stream-static join: streaming docs gated against the standing
    corpus's SimHash set must match the batch computation of the same
    gate, and corpus-matching docs must be flagged."""
    from mspr2_back_spark.operators.dedup import simhash_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    stream_dir = str(tmp_path / "gate_stream")
    batch.write.mode("overwrite").parquet(stream_dir)

    corpus_fp = simhash_fingerprints(corpus)
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    gated = stream_events.dedup_gate_against_corpus(stream, corpus_fp)
    stream_events.run_to_memory(gated, "gate_stream_out", mode="append")
    got = {
        r.doc_id: (r.simhash, r.matches_corpus)
        for r in spark.table("gate_stream_out").collect()
    }
    expected = {
        r.doc_id: (r.simhash, r.matches_corpus)
        for r in stream_events.dedup_gate_against_corpus(batch, corpus_fp).collect()
    }
    assert got == expected and len(got) == batch.count()
    assert any(v[1] > 0 for v in got.values())  # near-dups hit the corpus
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_degenerate_inputs_do_not_crash(spark):
    """ANSI-mode hardening: empty corpus and empty-text docs flow
    through the curation operators without division or NPE errors."""
    from mspr2_back_spark.functions.pii import scrub_documents
    from mspr2_back_spark.functions.text import quality_features
    from mspr2_back_spark.operators.dedup import repeated_span_coverage

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert scrub_documents(empty).count() == 0
    assert repeated_span_coverage(empty).count() == 0

    degenerate = spark.createDataFrame(
        [(1, ""), (2, None), (3, "one")], "doc_id long, text string"
    )
    rows = quality_features(degenerate).collect()
    assert len(rows) == 3  # empty/null text -> null ratios, no x/0 error
    scrubbed = scrub_documents(degenerate.fillna({"text": ""})).collect()
    assert len(scrubbed) == 3


class TestNumpyLSTMTraining:
    """M4 full: numpy BPTT must be a CORRECT gradient (checked
    against central-difference numerical gradients) and must actually
    learn (loss descent on a learnable series)."""

    def test_bptt_gradients_match_numerical(self):
        import numpy as np

        m = forecast.NumpyLSTM(hidden_size=3, num_layers=2, seed=11)
        rng = np.random.default_rng(3)
        X = rng.normal(size=(4, 5, 1))
        y = rng.normal(size=4)
        pred, ctx = m._forward_batch(X)
        _, grads = m._backward(pred, y, ctx)

        def loss_at():
            p, _ = m._forward_batch(X)
            return float(np.mean((p.reshape(-1) - y) ** 2))

        eps = 1e-6
        for name in grads:
            analytic = np.asarray(grads[name])
            param = m._get(name)
            flat = param.reshape(-1)
            # spot-check a handful of coordinates per tensor
            idxs = rng.choice(flat.size, size=min(6, flat.size), replace=False)
            for j in idxs:
                orig = flat[j]
                flat[j] = orig + eps
                lp = loss_at()
                flat[j] = orig - eps
                lm = loss_at()
                flat[j] = orig
                num = (lp - lm) / (2 * eps)
                ana = analytic.reshape(-1)[j]
                assert abs(num - ana) <= 1e-5 * max(1.0, abs(num), abs(ana)), (
                    name, j, num, ana,
                )

    def test_forward_batch_matches_forward(self):
        import numpy as np

        m = forecast.NumpyLSTM(hidden_size=8, num_layers=2, seed=5)
        seqs = np.random.default_rng(1).uniform(size=(3, 9))
        batch_pred, _ = m._forward_batch(seqs.reshape(3, 9, 1))
        for b in range(3):
            assert abs(m.forward(seqs[b]) - batch_pred[b, 0]) < 1e-12

    def test_training_reduces_loss_and_is_deterministic(self):
        import numpy as np

        # learnable target: next value of a noiseless sine
        t = np.arange(300)
        y_series = (np.sin(t / 7.0) + 1.0) / 2.0
        L = 10
        X = np.stack([y_series[i : i + L] for i in range(len(t) - L)])
        y = y_series[L:]
        X = X.reshape(-1, L, 1)

        m1 = forecast.NumpyLSTM(hidden_size=8, num_layers=2, seed=2)
        losses1 = m1.train(X, y, epochs=12, batch_size=32, lr=3e-3, seed=0)
        assert losses1[-1] < 0.25 * losses1[0], losses1
        m2 = forecast.NumpyLSTM(hidden_size=8, num_layers=2, seed=2)
        losses2 = m2.train(X, y, epochs=12, batch_size=32, lr=3e-3, seed=0)
        assert losses1 == losses2  # bit-deterministic training

    def test_train_on_spark_series(self, spark, sf_dir):
        """End-to-end: Spark-side window building over the events
        series feeds the numpy trainer; windows are scaled per group
        and capped; training runs and descends."""
        from mspr2_back_spark.ml.forecast import daily_user_series

        events = load_table(spark, sf_dir, "events")
        series = daily_user_series(events).filter(F.col("user_id") < 10)
        model, losses = forecast.train_lstm_on_series(
            series, lookback=6, hidden_size=4, epochs=8, batch_size=64
        )
        assert len(losses) == 8
        assert losses[-1] < losses[0]
        # the trained model slots into the serving loop
        out = forecast._fit_predict_lstm(
            np.linspace(1.0, 50.0, 40), lookback=6, horizon=3, model=model
        )
        assert out.shape == (3,) and np.isfinite(out).all()



def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    """The per-user funnel state machine, drained over the full event
    history in event-time order, must land every user on exactly the
    stage the batch event_funnel chain computes."""
    from mspr2_back_spark.plans.workloads import FUNNEL_STAGES, event_funnel

    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_funnel")
    src.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(stream_dir)

    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    prog = stream_events.funnel_stage_progress(stream)
    stream_events.run_to_memory(prog, "funnel_progress", mode="update")

    final: dict[int, int] = {}
    for r in spark.table("funnel_progress").collect():
        final[r.user_id] = max(final.get(r.user_id, 0), r.stage_reached)
    # per-stage reach counts: stage k ⇒ stage_reached >= k+1
    stream_counts = [
        sum(1 for v in final.values() if v >= k + 1)
        for k in range(len(FUNNEL_STAGES))
    ]
    batch = event_funnel(spark, sf_dir).collect()[0]
    batch_counts = [batch[f"reached_{s}"] for s in FUNNEL_STAGES]
    assert stream_counts == batch_counts
    assert len(final) == batch["n_users"]
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_streaming_transitions_match_batch(spark, sf_dir, tmp_path):
    """The per-user transition state machine, drained over the full
    history, must emit increments that sum to exactly the batch
    transition matrix's counts."""
    from mspr2_back_spark.plans.timeseries import event_transition_matrix

    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_transitions")
    src.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(stream_dir)

    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    inc = stream_events.transition_increments(stream)
    stream_events.run_to_memory(inc, "transition_increments", mode="update")

    streamed: dict[tuple[str, str], int] = {}
    for r in spark.table("transition_increments").collect():
        k = (r.from_type, r.to_type)
        streamed[k] = streamed.get(k, 0) + r.n
    batch = {
        (r.from_type, r.to_type): r.n_transitions
        for r in event_transition_matrix(spark, sf_dir).collect()
    }
    assert streamed == batch
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_streaming_ewma_matches_batch_fold(spark, sf_dir, tmp_path):
    """The per-type EWMA state machine, drained over the full
    history, must equal the python fold over the (ts, event_id)-
    ordered values — same recursion, same order, same floats."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_ewma")
    src.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(stream_dir)

    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    live = stream_events.ewma_value_live(stream, alpha=0.3)
    stream_events.run_to_memory(live, "ewma_live", mode="update")

    final: dict[str, tuple] = {}
    for r in spark.table("ewma_live").collect():
        prev = final.get(r.event_type)
        if prev is None or r.n_seen > prev[0]:
            final[r.event_type] = (r.n_seen, r.ewma)

    series: dict[str, list] = {}
    for r in src.select("event_type", "ts", "event_id", "value").collect():
        series.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    assert set(final) == set(series)
    for et, rows in series.items():
        rows.sort()
        ewma = None
        for _, _, v in rows:
            ewma = v if ewma is None else ewma * 0.7 + v * 0.3
        n_seen, got = final[et]
        assert n_seen == len(rows)
        assert math.isclose(got, ewma, rel_tol=1e-12, abs_tol=1e-12)
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_streaming_hopping_windows_match_batch(spark, sf_dir, tmp_path):
    """The hopping-window stream, drained over the full history,
    must produce exactly the batch sliding_event_rates matrix
    (update mode: the last emitted row per key is the final state —
    counts only grow, so keep the max)."""
    from mspr2_back_spark.plans.workloads import sliding_event_rates

    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_hopping")
    src.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(stream_dir)

    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    live = stream_events.hopping_event_rates(stream)
    stream_events.run_to_memory(live, "hopping_rates", mode="update")

    final: dict = {}
    for r in spark.table("hopping_rates").collect():
        k = (r.window_start, r.event_type)
        prev = final.get(k)
        if prev is None or r.n_events > prev[0]:
            final[k] = (r.n_events, r.total_value)
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in sliding_event_rates(spark, sf_dir).collect()
    }
    assert final == batch
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_streaming_cms_cells_match_batch_sketch(spark, sf_dir, tmp_path):
    """Per-day live CMS grids, drained over the full history and
    MERGED by summing cells, must equal the batch corpus sketch
    cell-for-cell — streaming parity AND time-partitioned
    mergeability in one assertion."""
    from mspr2_back_spark.operators.sketches import cms_build

    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_cms")
    src.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(stream_dir)

    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    live = stream_events.cms_cells_live(stream, key_col="user_id")
    stream_events.run_to_memory(live, "cms_live", mode="update")

    # update mode: last emitted value per (window, cell) is the final
    # per-day count (counts only grow); merge = sum across days
    per_key: dict = {}
    for r in spark.table("cms_live").collect():
        k = (r.window_start, r.h, r.bucket)
        per_key[k] = max(per_key.get(k, 0), r.cnt)
    merged: dict = {}
    for (win, h, bucket), cnt in per_key.items():
        merged[(h, bucket)] = merged.get((h, bucket), 0) + cnt

    batch = {
        (r.h, r.bucket): r.cnt
        for r in cms_build(src, "user_id").collect()
    }
    assert merged == batch


def test_streaming_dau_matches_batch_estimate(spark, sf_dir, tmp_path):
    """Live per-day HLL DAU, drained, must equal the batch
    approx_count_distinct per day EXACTLY (HLL registers are
    order-insensitive), and land within the rsd guard of the true
    distinct count."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_dau")
    src.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(stream_dir)

    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    live = stream_events.dau_live(stream)
    stream_events.run_to_memory(live, "dau_live", mode="update")

    final: dict = {}
    for r in spark.table("dau_live").collect():
        final[r.day] = r.dau_est  # last emit per day wins; keep any —
        # estimates only change while the day's window is open
    batch = {
        r.day: r.dau_est
        for r in src.groupBy(
            F.window("ts", "1 day").alias("win")
        )
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("dau_est"))
        .select(F.col("win.start").cast("date").alias("day"), "dau_est")
        .collect()
    }
    assert final == batch
    exact = {
        r.day: r.d
        for r in src.select(
            F.col("ts").cast("date").alias("day"), "user_id"
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for day, est in final.items():
        assert abs(est - exact[day]) <= max(3, 0.05 * exact[day]), (
            day, est, exact[day]
        )


def test_gold_upsert_meta_contract(spark, sf_dir, tmp_path):
    """r7 (ADVICE): the gold table's bucket contract is persisted at
    creation (`_gold_meta.json`, underscore-hidden from the parquet
    reader), and a later merge with a different n_buckets — which
    would hash existing keys into NEW partitions while their old rows
    survive, i.e. silent duplicates — fails loudly instead."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = tmp_path / "mgold_in"
    stream_dir.mkdir()
    gold = str(tmp_path / "mgold_out")
    ckpt = str(tmp_path / "mgold_ckpt")

    def land(df, name):
        staging = tmp_path / f"mgstage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        for i, f in enumerate(staging.glob("part-*.parquet")):
            f.rename(stream_dir / f"{name}_{i}.parquet")

    def run(n_buckets):
        stream = stream_events.read_event_stream(
            spark, str(stream_dir), src.schema
        )
        counts = stream.groupBy("event_type").count()
        stream_events.run_upsert_to_gold(
            counts, gold, ckpt, keys=["event_type"], n_buckets=n_buckets
        )

    land(src.limit(200), "b1")
    run(8)
    meta = stream_events.read_gold_meta(spark, gold)
    assert meta == {"n_buckets": 8, "keys": ["event_type"]}
    # the meta file must be invisible to the table scan
    n_rows = spark.read.parquet(gold).count()
    assert n_rows > 0

    land(src.limit(300), "b2")
    with pytest.raises(Exception, match="n_buckets=8"):
        run(4)
    # the failed merge must not have altered the table
    assert spark.read.parquet(gold).count() == n_rows

    # same contract → merges fine
    run(8)
    assert spark.read.parquet(gold).count() >= n_rows


def test_gold_upsert_adoption_validates_bucket_layout(spark, sf_dir, tmp_path):
    """r8 (VERDICT r7 task 2): adopting a PRE-META gold table (meta
    file lost/never written) under the caller's n_buckets re-opened
    the silent key-split hazard — a 16-bucket table adopted as 64
    strands old rows in old buckets while new rows hash elsewhere.
    Adoption now recomputes the bucket function over the existing
    rows and refuses when any stored _bucket disagrees; a matching
    contract still adopts (and re-persists the meta)."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = tmp_path / "agold_in"
    stream_dir.mkdir()
    gold = str(tmp_path / "agold_out")

    def land(df, name):
        staging = tmp_path / f"agstage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        for i, f in enumerate(staging.glob("part-*.parquet")):
            f.rename(stream_dir / f"{name}_{i}.parquet")

    def run(n_buckets, ckpt_name):
        stream = stream_events.read_event_stream(
            spark, str(stream_dir), src.schema
        )
        counts = stream.groupBy("event_type").count()
        stream_events.run_upsert_to_gold(
            counts,
            gold,
            str(tmp_path / ckpt_name),
            keys=["event_type"],
            n_buckets=n_buckets,
        )

    # build a 16-bucket table, then simulate meta loss
    land(src.limit(200), "b1")
    run(16, "ck1")
    meta = stream_events.read_gold_meta(spark, gold)
    assert meta == {"n_buckets": 16, "keys": ["event_type"]}
    fs, meta_path = stream_events._gold_meta_path(spark, gold)
    fs.delete(meta_path, False)
    assert stream_events.read_gold_meta(spark, gold) is None
    before = spark.read.parquet(gold).count()

    # adoption under a DIFFERENT bucket count must refuse (today's
    # hazard: it silently split keys)
    land(src.limit(300), "b2")
    with pytest.raises(Exception, match="cannot adopt"):
        run(64, "ck2")
    assert spark.read.parquet(gold).count() == before
    assert stream_events.read_gold_meta(spark, gold) is None

    # adoption under the ORIGINAL contract validates and proceeds,
    # re-persisting the meta
    run(16, "ck3")
    assert stream_events.read_gold_meta(spark, gold) == {
        "n_buckets": 16,
        "keys": ["event_type"],
    }
    assert spark.read.parquet(gold).count() >= before


def test_gold_upsert_adoption_rejects_foreign_table(spark, sf_dir, tmp_path):
    """r9 ADVICE: a pre-meta table that lacks the _bucket or key
    columns entirely (a genuinely foreign parquet directory at the
    gold path) must refuse adoption with the same descriptive
    cannot-adopt ValueError — not surface as an AnalysisException
    from the layout recompute."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = tmp_path / "fgold_in"
    stream_dir.mkdir()
    gold = str(tmp_path / "fgold_out")

    # a foreign table: has the key column but no _bucket
    src.limit(50).select("event_type").write.parquet(gold)

    staging = tmp_path / "fgstage"
    src.limit(100).coalesce(1).write.parquet(str(staging))
    for i, f in enumerate(staging.glob("part-*.parquet")):
        f.rename(stream_dir / f"b1_{i}.parquet")

    stream = stream_events.read_event_stream(spark, str(stream_dir), src.schema)
    counts = stream.groupBy("event_type").count()
    with pytest.raises(Exception, match="lacks column"):
        stream_events.run_upsert_to_gold(
            counts,
            gold,
            str(tmp_path / "fgold_ckpt"),
            keys=["event_type"],
            n_buckets=8,
        )


def test_gold_upsert_soak_bounded_files_and_bytes(spark, sf_dir, tmp_path):
    """r7 soak (VERDICT r6 stretch): 50 micro-batches of upserts into
    a 16-bucket gold table must keep (a) at most ONE parquet file per
    bucket partition after every batch (no small-file explosion from
    repeated dynamic overwrites — the pre-write _bucket repartition's
    contract), (b) every untouched bucket byte-identical across each
    batch (bytes moved stays O(touched buckets)), and (c) the final
    table equal to the batch-computed aggregate over the full input."""
    import hashlib
    from collections import defaultdict
    from pathlib import Path

    src = load_table(spark, sf_dir, "events")
    types = [r[0] for r in src.select("event_type").distinct().collect()]
    stream_dir = tmp_path / "soak_in"
    stream_dir.mkdir()
    gold = str(tmp_path / "soak_out")
    ckpt = str(tmp_path / "soak_ckpt")
    n_buckets = 16

    rows = src.limit(600).collect()
    chunk = len(rows) // 50

    def land(batch_rows, name):
        df = spark.createDataFrame(batch_rows, src.schema)
        staging = tmp_path / f"soakstage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        for i, f in enumerate(staging.glob("part-*.parquet")):
            f.rename(stream_dir / f"{name}_{i}.parquet")

    def run():
        stream = stream_events.read_event_stream(
            spark, str(stream_dir), src.schema
        )
        counts = stream.groupBy("event_type").count()
        stream_events.run_upsert_to_gold(
            counts, gold, ckpt, keys=["event_type"], n_buckets=n_buckets
        )

    def inventory():
        by_bucket: dict[str, list[tuple[str, str]]] = defaultdict(list)
        for p in Path(gold).rglob("*.parquet"):
            rel = str(p.relative_to(gold))
            bucket = rel.split("/")[0]
            by_bucket[bucket].append(
                (rel, hashlib.md5(p.read_bytes()).hexdigest())
            )
        return by_bucket

    bucket_of = {
        t: spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(t)), F.lit(n_buckets)).cast("int").alias("b")
        )
        .first()[0]
        for t in types
    }

    prev = None
    for b in range(50):
        batch_rows = rows[b * chunk : (b + 1) * chunk]
        if not batch_rows:
            break
        land(batch_rows, f"b{b:03d}")
        run()
        inv = inventory()
        # (a) one file per bucket, always
        for bucket, files in inv.items():
            assert len(files) == 1, (b, bucket, [f for f, _ in files])
        # (b) buckets this batch did not touch are byte-identical
        touched = {
            f"_bucket={bucket_of[r.event_type]}" for r in batch_rows
        }
        if prev is not None:
            for bucket, files in prev.items():
                if bucket not in touched:
                    assert inv.get(bucket) == files, (b, bucket)
        prev = inv

    # (c) final semantics = batch aggregate over everything landed
    n_landed = 50 * chunk
    expected = {
        r.event_type: r["count"]
        for r in spark.createDataFrame(rows[:n_landed], src.schema)
        .groupBy("event_type")
        .count()
        .collect()
    }
    got = {
        r.event_type: r["count"]
        for r in spark.read.parquet(gold).collect()
    }
    assert got == expected


def test_hll_registers_live_parity_and_max_merge(spark, sf_dir, tmp_path):
    """The streaming HLL register state (1) reproduces the batch
    per-day registers EXACTLY — same md5 register/rho arithmetic,
    order-insensitive MAX state; (2) max-merges across days into the
    corpus register set, the time-partitioned mergeability the CMS
    sum-merge test pins for counts; (3) the merged registers fold
    through the shared estimate template to within the m=256 error
    envelope of true distinct."""
    import math

    from mspr2_back_spark.operators.sketches import (
        HLL_M,
        HLL_RHO_MAX,
        HLL_SCALE,
        hll_register_cols,
    )

    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_stream_hll")
    src.write.mode("overwrite").parquet(stream_dir)
    stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
    live = stream_events.hll_registers_live(stream)
    stream_events.run_to_memory(live, "hll_live", mode="update")

    got = {}
    for r in spark.table("hll_live").collect():
        # update mode re-emits a (day, reg) on every raise; keep max
        k = (r.day, r.reg)
        got[k] = max(got.get(k, 0), r.mj)
    reg, rho = hll_register_cols(F.col("user_id"))
    batch = {
        (r.day, r.reg): r.mj
        for r in src.filter(F.col("user_id").isNotNull())
        .select(F.col("ts").cast("date").alias("day"), reg.alias("reg"), rho.alias("rho"))
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("mj"))
        .collect()
    }
    assert got == batch

    # max-merge the drained days -> corpus registers
    merged: dict[int, int] = {}
    for (_, r), mj in got.items():
        merged[r] = max(merged.get(r, 0), mj)
    corpus = {
        r.reg: r.mj
        for r in src.filter(F.col("user_id").isNotNull())
        .select(reg.alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("mj"))
        .collect()
    }
    assert merged == corpus

    # fold merged registers through the estimate and bound vs truth
    zero = HLL_M - len(merged)
    sum_scaled = (
        sum(1 << (HLL_RHO_MAX - mj) for mj in merged.values()) + zero * HLL_SCALE
    )
    alpha = 0.7213 / (1 + 1.079 / 256)
    raw = alpha * 65536.0 * float(HLL_SCALE) / float(sum_scaled)
    est = 256.0 * math.log(256.0 / zero) if (raw <= 640.0 and zero > 0) else raw
    exact = (
        src.filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(est - exact) < 0.26 * exact + 3
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_state_store_partitions_frozen_at_first_start(spark, sf_dir, tmp_path):
    """r19 (VERDICT r18 task 7): AQE cannot resize stream shuffles, so
    a stateful query's state-store partition count is fixed by
    spark.sql.shuffle.partitions AT FIRST START and persisted in the
    checkpoint — a restart under a DIFFERENT session conf keeps the
    original count. This is the deployment contract the module
    docstring documents (size SPARK_GRAFT_CPUS for peak state volume
    before the first production start); the pin fails if a Spark
    upgrade ever changes the freeze semantics."""
    src = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_state_pin")
    ckpt = str(tmp_path / "state_pin_ckpt")
    src.limit(200).write.mode("overwrite").parquet(stream_dir)

    def run_once():
        stream = stream_events.read_event_stream(spark, stream_dir, src.schema)
        agg = stream_events.windowed_event_counts(stream)
        q = (
            agg.writeStream.format("memory")
            .queryName("state_pin_sink")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # the last progress can be a no-data batch with no state
        # operators — scan the run's progress history for one
        for prog in reversed(q.recentProgress):
            if prog["stateOperators"]:
                return prog["stateOperators"][0]["numShufflePartitions"]
        raise AssertionError("expected a stateful operator in the progress")

    start_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert run_once() == start_parts
    # restart the SAME checkpoint under a different conf, with fresh
    # input so the restarted run executes a real batch: frozen at the
    # first start's count (Spark logs the pin: "Updating the value of
    # conf 'spark.sql.streaming.internal.stateStore.partitions'")
    src.limit(400).write.mode("append").parquet(stream_dir)
    spark.conf.set("spark.sql.shuffle.partitions", str(start_parts * 2))
    try:
        assert run_once() == start_parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(start_parts))
    shutil.rmtree(stream_dir, ignore_errors=True)
