"""Streaming parity + ML smoke tests (SURVEY §5 strategy #5)."""

from __future__ import annotations

import shutil

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
