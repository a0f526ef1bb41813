"""ML surface: feature pipeline + regression metrics + autoregressive
forecasting (SURVEY §2.9 M1-M8, re-expressed on MLlib + pandas UDFs).

- ``train_rf_metrics``: StringIndexer/OneHot/MinMaxScaler feature
  pipeline into a RandomForestRegressor with R²/RMSE/MAE evaluation —
  the reference's sklearn metrics endpoint (ref app/routes/metrics.py:21-42)
  and encoders (ref predict_france_with_model.py:33-36,67-69).
- ``autoregressive_forecast``: per-group sequential forecasting under
  ``applyInPandas`` — one group per series, parallel across groups,
  sequential inside (the reference's LSTM loop shape, ref
  app/routes/predict_france_with_model.py:90-101). The default model
  is a deterministic ridge-regularized linear AR fit in numpy; a
  torch LSTM drops into the same seam when the library exists
  (absent in this container — kept behind a try-import, same policy
  as the multimodal codecs).

Scale: training data prep is all DataFrame ops; the forecast
parallelism is the number of series, each group fitting in one
worker's pandas frame — the layout a 1000-executor cluster wants.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.ml import Pipeline
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import MinMaxScaler, OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - torch is not shipped in this container
    import torch  # noqa: F401

    HAVE_TORCH = True
except Exception:
    HAVE_TORCH = False


def build_rf_pipeline(
    numeric_features: Iterable[str],
    categorical_features: Iterable[str],
    label: str,
    seed: int = 42,
):
    """The feature pipeline (StringIndexer → OneHot → MinMaxScaler →
    assemble) + RandomForestRegressor as an unfit MLlib Pipeline."""
    numeric_features = list(numeric_features)
    categorical_features = list(categorical_features)
    stages = []
    cat_vecs = []
    for c in categorical_features:
        stages.append(StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep"))
        stages.append(OneHotEncoder(inputCol=f"{c}_idx", outputCol=f"{c}_vec"))
        cat_vecs.append(f"{c}_vec")
    stages.append(
        VectorAssembler(inputCols=numeric_features, outputCol="num_raw")
    )
    stages.append(MinMaxScaler(inputCol="num_raw", outputCol="num_scaled"))
    stages.append(
        VectorAssembler(inputCols=["num_scaled", *cat_vecs], outputCol="features")
    )
    stages.append(
        RandomForestRegressor(
            featuresCol="features", labelCol=label, numTrees=30, seed=seed
        )
    )
    return Pipeline(stages=stages)


def train_rf_metrics(
    df: DataFrame,
    numeric_features: Iterable[str],
    categorical_features: Iterable[str],
    label: str,
    seed: int = 42,
    test_fraction: float = 0.25,
) -> dict[str, float]:
    """Fit the feature pipeline + RF on a train split, evaluate on the
    held-out split (r2 / rmse / mae, mirroring ref metrics.py:37-40
    and the MAE backtest at predict_france_with_model.py:107-110)."""
    train, test = df.randomSplit([1 - test_fraction, test_fraction], seed=seed)
    model = build_rf_pipeline(numeric_features, categorical_features, label, seed).fit(
        train
    )
    pred = model.transform(test)
    out = {}
    for metric in ("r2", "rmse", "mae"):
        out[metric] = RegressionEvaluator(
            labelCol=label, predictionCol="prediction", metricName=metric
        ).evaluate(pred)
    return out


def predict_single(model, spark, features: dict[str, object]) -> float:
    """Single-row inference (SURVEY M7, the reference's JSON-features
    predict endpoint recovered from bytecode): one feature dict → one
    prediction, via the same fitted pipeline that serves batches — no
    separate serving path to drift."""
    row_df = spark.createDataFrame([features])
    return float(model.transform(row_df).select("prediction").first()[0])


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class NumpyLSTM:
    """CPU forward pass of the reference's forecasting network — two
    stacked LSTM(128) layers + a dense 1-unit head (ref
    app/train_lstm_multipays (1).py:80-117 builds it; ref
    app/routes/predict_france_with_model.py:39-47 serves it).

    Weight layout matches ``torch.nn.LSTM``: per layer ``W_ih`` is
    ``[4H, in]``, ``W_hh`` is ``[4H, H]``, biases ``[4H]``, gate order
    (i, f, g, o) — so a state_dict exported from the reference's
    ``.pth`` loads directly via :meth:`load_torch_state`. Absent real
    weights (torch is not in this container), a seeded
    uniform(-1/√H, 1/√H) init — torch's default — stands in, keeping
    the whole path deterministic and testable.
    """

    def __init__(
        self,
        input_size: int = 1,
        hidden_size: int = 128,
        num_layers: int = 2,
        seed: int = 7,
    ):
        rng = np.random.default_rng(seed)
        self.hidden_size = hidden_size
        self.layers: list[dict[str, np.ndarray]] = []
        k = 1.0 / np.sqrt(hidden_size)
        for layer in range(num_layers):
            in_sz = input_size if layer == 0 else hidden_size
            self.layers.append(
                {
                    "W_ih": rng.uniform(-k, k, (4 * hidden_size, in_sz)),
                    "W_hh": rng.uniform(-k, k, (4 * hidden_size, hidden_size)),
                    "b_ih": rng.uniform(-k, k, 4 * hidden_size),
                    "b_hh": rng.uniform(-k, k, 4 * hidden_size),
                }
            )
        self.W_fc = rng.uniform(-k, k, (1, hidden_size))
        self.b_fc = rng.uniform(-k, k, 1)

    def load_torch_state(self, state: dict[str, np.ndarray]) -> None:
        """Load a torch state_dict (values as numpy arrays) with the
        reference's parameter names: ``lstm.weight_ih_l{n}``,
        ``lstm.weight_hh_l{n}``, ``lstm.bias_ih_l{n}``,
        ``lstm.bias_hh_l{n}``, ``fc.weight``, ``fc.bias``."""
        for n, layer in enumerate(self.layers):
            layer["W_ih"] = np.asarray(state[f"lstm.weight_ih_l{n}"], dtype=np.float64)
            layer["W_hh"] = np.asarray(state[f"lstm.weight_hh_l{n}"], dtype=np.float64)
            layer["b_ih"] = np.asarray(state[f"lstm.bias_ih_l{n}"], dtype=np.float64)
            layer["b_hh"] = np.asarray(state[f"lstm.bias_hh_l{n}"], dtype=np.float64)
        self.W_fc = np.asarray(state["fc.weight"], dtype=np.float64)
        self.b_fc = np.asarray(state["fc.bias"], dtype=np.float64)

    def forward(self, seq: np.ndarray) -> float:
        """One scaled input window ``(T,)`` → one scalar prediction
        (the head reads the last timestep's top-layer hidden state,
        as the reference does)."""
        H = self.hidden_size
        x = np.asarray(seq, dtype=np.float64).reshape(-1, 1)
        for layer in self.layers:
            h = np.zeros(H)
            c = np.zeros(H)
            outs = np.empty((x.shape[0], H))
            for t in range(x.shape[0]):
                gates = (
                    layer["W_ih"] @ x[t]
                    + layer["b_ih"]
                    + layer["W_hh"] @ h
                    + layer["b_hh"]
                )
                i = _sigmoid(gates[0:H])
                f = _sigmoid(gates[H : 2 * H])
                g = np.tanh(gates[2 * H : 3 * H])
                o = _sigmoid(gates[3 * H : 4 * H])
                c = f * c + i * g
                h = o * np.tanh(c)
                outs[t] = h
            x = outs
        return (self.W_fc @ x[-1] + self.b_fc).item()


_DEFAULT_LSTM: NumpyLSTM | None = None


def _default_lstm() -> NumpyLSTM:
    """Shared seeded stand-in weights — building a fresh model per
    applyInPandas group would regenerate identical ~2.5 MB weights
    once per group."""
    global _DEFAULT_LSTM
    if _DEFAULT_LSTM is None:
        _DEFAULT_LSTM = NumpyLSTM()
    return _DEFAULT_LSTM


def _fit_predict_lstm(
    y: np.ndarray, lookback: int, horizon: int, model: NumpyLSTM | None = None
) -> np.ndarray:
    """Autoregressive multi-step forecast through the LSTM forward —
    the reference's serving loop (predict_france_with_model.py:90-101):
    min-max scale the history, feed the last ``lookback`` steps, append
    each prediction, inverse-scale at the end. With torch absent the
    network runs the seeded stand-in weights; the loop, scaling and
    topology are the reference's."""
    model = model or _default_lstm()
    lo, hi = float(np.min(y)), float(np.max(y))
    span = (hi - lo) or 1.0
    scaled = (np.asarray(y, dtype=np.float64) - lo) / span
    window = scaled[-min(lookback, len(scaled)) :].copy()
    preds = []
    for _ in range(horizon):
        nxt = model.forward(window)
        preds.append(nxt)
        window = np.append(window[1:], nxt)
    return np.array(preds) * span + lo


def _fit_predict_ar(y: np.ndarray, lookback: int, horizon: int) -> np.ndarray:
    """Deterministic linear AR(lookback) forecast, fed back
    autoregressively — the reference's predict loop with the LSTM
    swapped for a closed-form model."""
    lookback = min(lookback, max(len(y) - 1, 1))
    rows = len(y) - lookback
    if rows < 2:
        return np.repeat(y[-1] if len(y) else 0.0, horizon)
    X = np.stack([y[i : i + lookback] for i in range(rows)])
    t = y[lookback:]
    Xb = np.hstack([X, np.ones((rows, 1))])
    # ridge for conditioning; fixed lambda keeps it deterministic
    w = np.linalg.solve(Xb.T @ Xb + 1e-6 * np.eye(lookback + 1), Xb.T @ t)
    window = y[-lookback:].astype(np.float64).copy()
    preds = []
    for _ in range(horizon):
        nxt = float(np.dot(window, w[:-1]) + w[-1])
        preds.append(nxt)
        window = np.append(window[1:], nxt)
    return np.array(preds)


def autoregressive_forecast(
    series: DataFrame,
    group_col: str = "user_id",
    time_col: str = "day",
    value_col: str = "value",
    lookback: int = 14,
    horizon: int = 7,
    model: str = "ar",
) -> DataFrame:
    """Forecast `horizon` steps per group.

    Input: one row per (group, time) with a numeric value (prepare
    with a groupBy upstream). Output: (group, step, forecast_day,
    forecast_value). Sequential inside a group by nature of
    autoregression; distributed across groups by applyInPandas.

    ``model``: 'ar' (closed-form linear AR, the fast default) or
    'lstm' (the reference-topology NumpyLSTM forward)."""
    if model not in ("ar", "lstm"):
        raise ValueError(f"model must be 'ar' or 'lstm', got {model!r}")
    predict = _fit_predict_ar if model == "ar" else _fit_predict_lstm
    schema = (
        f"{group_col} LONG, step INT, forecast_day DATE, forecast_value DOUBLE"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        last_day = pd.Timestamp(pdf[time_col].iloc[-1])
        preds = predict(y, lookback, horizon)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[0],
                "step": np.arange(1, horizon + 1, dtype=np.int32),
                "forecast_day": [
                    (last_day + pd.Timedelta(days=int(s))).date()
                    for s in range(1, horizon + 1)
                ],
                "forecast_value": preds,
            }
        )

    return series.groupBy(group_col).applyInPandas(run, schema=schema)


def predict_weekly_statistics(
    weekly: DataFrame, horizon_weeks: int = 4, lookback: int = 12
) -> DataFrame:
    """Materialize the table the reference serves but never creates
    (``predicted_weekly_statistics``, SURVEY §2.10; ref
    app/routes/data.py:63-66): per-country weekly new-case forecasts,
    same grain as weekly_statistics.

    Input is the warehouse fact (country_short_code, date_of_report,
    week_new_reported_cases); output one row per (country, future
    week). Grouped autoregression under applyInPandas — the
    reference's per-country LSTM loop shape with the deterministic AR
    stand-in."""
    schema = (
        "country_short_code STRING, date_of_report DATE, "
        "predicted_new_cases DOUBLE, step INT"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("date_of_report")
        y = pdf["week_new_reported_cases"].fillna(0).to_numpy(dtype=np.float64)
        preds = _fit_predict_ar(y, lookback, horizon_weeks)
        last = pd.Timestamp(pdf["date_of_report"].iloc[-1])
        return pd.DataFrame(
            {
                "country_short_code": pdf["country_short_code"].iloc[0],
                "date_of_report": [
                    (last + pd.Timedelta(weeks=s)).date()
                    for s in range(1, horizon_weeks + 1)
                ],
                "predicted_new_cases": preds,
                "step": np.arange(1, horizon_weeks + 1, dtype=np.int32),
            }
        )

    return weekly.groupBy("country_short_code").applyInPandas(run, schema=schema)


def daily_user_series(events: DataFrame) -> DataFrame:
    """Events → dense per-(user, day) value series (forecast input)."""
    return (
        events.groupBy(
            "user_id", F.col("ts").cast("date").alias("day")
        )
        .agg(F.sum("value").alias("value"))
    )
