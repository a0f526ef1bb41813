"""DuckDB oracles for the time-series / behavioral batch.

Every tunable constant and every floating-point formula comes from
plans/timeseries.py (zscore_sql / trend_*_sql are formatted into both
engines' plans verbatim), so the two sides cannot drift
independently.
"""

from __future__ import annotations

from mspr2_back_spark.functions.numeric import METRIC
from mspr2_back_spark.plans.timeseries import (
    ANOM_WINDOW_DAYS,
    ANOM_Z_THRESHOLD,
    ATTR_NO_TOUCH,
    ATTR_TOUCH_TYPES,
    ATTR_WINDOW_DAYS,
    DEBOUNCE_MINUTES,
    DECOMP_HALF_WINDOW,
    SEASON_PERIOD,
    TREND_EPOCH,
    TREND_MOMENT_SCALE,
    assoc_lift_sql,
    ewma_step_sql,
    spine_calendar_sql,
    trend_intercept_sql,
    trend_slope_sql,
    ts_operating_window_sql,
    zscore_sql,
)

TIMESERIES_ORACLE_SQL: dict[str, str] = {}

TIMESERIES_ORACLE_SQL["gapfill_user_daily"] = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value FROM events
  WHERE {spine_calendar_sql("ts")}
),
daily AS (
  SELECT user_id, day, COUNT(*) AS n_raw,
         CAST(SUM(CAST(value AS {METRIC})) AS DOUBLE) AS daily_value
  FROM ev GROUP BY 1, 2
),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM ev GROUP BY 1)
)
SELECT s.user_id, s.day,
       COALESCE(n_raw, 0) AS n_events,
       ROUND(last_value(daily_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS value_filled,
       n_raw IS NULL AS is_gap
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
ORDER BY 1, 2
"""

TIMESERIES_ORACLE_SQL["daily_anomaly_scores"] = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, day, n_events,
         COUNT(*) OVER w AS cnt_w,
         SUM(n_events) OVER w AS sum_w,
         SUM(n_events * n_events) OVER w AS ss_w
  FROM daily
  WINDOW w AS (
    PARTITION BY event_type
    ORDER BY date_diff('day', DATE '{TREND_EPOCH}', day)
    RANGE BETWEEN {ANOM_WINDOW_DAYS} PRECEDING AND 1 PRECEDING
  )
),
scored AS (
  SELECT event_type, day, n_events,
         CASE WHEN cnt_w = {ANOM_WINDOW_DAYS} THEN {zscore_sql()} END
           AS z_score
  FROM win
)
SELECT event_type, day, n_events, z_score,
       abs(z_score) > {ANOM_Z_THRESHOLD} AS is_anomaly
FROM scored
ORDER BY event_type, day
"""

TIMESERIES_ORACLE_SQL["event_transition_matrix"] = """
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
           AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       ROUND(CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
                    AS DOUBLE), 6) AS transition_prob
FROM c
ORDER BY from_type, to_type
"""

_TOUCH_LIST = ", ".join(f"'{t}'" for t in ATTR_TOUCH_TYPES)

TIMESERIES_ORACLE_SQL["attribution_last_touch"] = f"""
WITH touches AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ({_TOUCH_LIST})
),
p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
att AS (
  SELECT p.value,
         CASE WHEN t.ts IS NOT NULL
                   AND date_diff('day', CAST(t.ts AS DATE),
                                 CAST(p.ts AS DATE)) <= {ATTR_WINDOW_DAYS}
              THEN t.event_type ELSE '{ATTR_NO_TOUCH}' END AS touch_type
  FROM p ASOF LEFT JOIN touches t
    ON p.user_id = t.user_id AND t.ts <= p.ts
)
SELECT touch_type, COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS {METRIC})) AS DOUBLE) AS total_value
FROM att
GROUP BY 1
ORDER BY 1
"""

TIMESERIES_ORACLE_SQL["daily_value_trend"] = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS {METRIC})) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
moments AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(x * x) AS sxx,
         CAST(SUM(CAST(y AS {TREND_MOMENT_SCALE})) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS {TREND_MOMENT_SCALE})) AS DOUBLE) AS sxy
  FROM (SELECT event_type, y,
               date_diff('day', DATE '{TREND_EPOCH}', day) AS x
        FROM daily)
  GROUP BY 1
)
SELECT event_type, n AS n_days,
       ROUND({trend_slope_sql()}, 6) AS slope_per_day,
       ROUND({trend_intercept_sql()}, 6) AS intercept
FROM moments
ORDER BY event_type
"""

TIMESERIES_ORACLE_SQL["ewma_daily_value"] = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS {METRIC})) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
arr AS (
  SELECT event_type, COUNT(*) AS n_days, list(y ORDER BY day) AS ys
  FROM daily GROUP BY 1
)
SELECT event_type, n_days,
       ROUND(list_reduce(ys, (acc, x) -> {ewma_step_sql()}), 6)
         AS ewma_value,
       ROUND(ys[-1], 6) AS last_value
FROM arr
ORDER BY event_type
"""

_DECOMP_SPAN = 2 * DECOMP_HALF_WINDOW + 1

TIMESERIES_ORACLE_SQL["seasonal_decompose_daily"] = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS {METRIC})) AS DOUBLE) AS y,
         date_diff('day', DATE '{TREND_EPOCH}', CAST(ts AS DATE)) AS x
  FROM events GROUP BY 1, 2, 4
),
win AS (
  SELECT event_type, day, y,
         ((x % {SEASON_PERIOD}) + {SEASON_PERIOD}) % {SEASON_PERIOD} AS wd,
         COUNT(*) OVER w AS cnt_w,
         ROUND(CAST(SUM(CAST(y AS {TREND_MOMENT_SCALE})) OVER w AS DOUBLE)
               / {_DECOMP_SPAN}, 6) AS trend
  FROM daily
  WINDOW w AS (
    PARTITION BY event_type ORDER BY x
    RANGE BETWEEN {DECOMP_HALF_WINDOW} PRECEDING
          AND {DECOMP_HALF_WINDOW} FOLLOWING
  )
),
dt AS (
  SELECT event_type, day, y, wd, trend, ROUND(y - trend, 6) AS detrended
  FROM win WHERE cnt_w = {_DECOMP_SPAN}
),
seas AS (
  SELECT event_type, wd,
         ROUND(CAST(SUM(CAST(detrended AS {TREND_MOMENT_SCALE})) AS DOUBLE)
               / COUNT(*), 6) AS seasonal
  FROM dt GROUP BY 1, 2
)
SELECT dt.event_type, day, y, trend, seasonal,
       ROUND(detrended - seasonal, 6) AS residual
FROM dt JOIN seas ON dt.event_type = seas.event_type AND dt.wd = seas.wd
ORDER BY dt.event_type, day
"""

TIMESERIES_ORACLE_SQL["event_debounce"] = f"""
WITH l AS (
  SELECT event_id, user_id, event_type, ts,
         LAG(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id)
           AS prev_ts
  FROM events
  WHERE {ts_operating_window_sql("ts")}
)
SELECT event_id, user_id, event_type, ts
FROM l
WHERE prev_ts IS NULL
   OR ts > prev_ts + INTERVAL {DEBOUNCE_MINUTES} MINUTE
ORDER BY user_id, event_type, ts
"""


def _contingency_oracle_sql() -> str:
    from mspr2_back_spark.plans.timeseries import chisq_cell_sql

    return f"""
WITH cells AS (
  SELECT event_type,
         ((date_diff('day', DATE '{TREND_EPOCH}', CAST(ts AS DATE)) % 7)
          + 7) % 7 AS weekday,
         COUNT(*) AS observed
  FROM events GROUP BY 1, 2
),
enriched AS (
  SELECT event_type, weekday, observed,
         SUM(observed) OVER (PARTITION BY event_type) AS row_tot,
         SUM(observed) OVER (PARTITION BY weekday) AS col_tot,
         SUM(observed) OVER () AS n
  FROM cells
)
SELECT event_type, weekday, observed,
       ROUND(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
             / CAST(n AS DOUBLE), 6) AS expected,
       {chisq_cell_sql()} AS chisq_contrib
FROM enriched
ORDER BY event_type, weekday
"""


TIMESERIES_ORACLE_SQL["event_weekday_contingency"] = _contingency_oracle_sql()


TIMESERIES_ORACLE_SQL["event_association_rules"] = f"""
WITH baskets AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events
),
n AS (
  SELECT COUNT(*) AS n_baskets
  FROM (SELECT DISTINCT user_id, day FROM baskets)
),
item AS (SELECT event_type, COUNT(*) AS c FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS c12
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, c12,
       ROUND(CAST(c12 AS DOUBLE) / n_baskets, 6) AS support,
       ROUND(CAST(c12 AS DOUBLE) / c1, 6) AS confidence_a_to_b,
       {assoc_lift_sql()} AS lift
FROM pairs
JOIN (SELECT event_type AS type_a, c AS c1 FROM item) USING (type_a)
JOIN (SELECT event_type AS type_b, c AS c2 FROM item) USING (type_b)
CROSS JOIN n
ORDER BY type_a, type_b
"""


def _funnel_latency_oracle_sql() -> str:
    from mspr2_back_spark.plans.workloads import FUNNEL_STAGES
    from mspr2_back_spark.plans.workloads_oracle import _LIST_COLS, _STEP_CTES

    last = len(FUNNEL_STAGES) - 1
    return f"""
WITH s0 AS (
  SELECT user_id,
         MIN(ts) FILTER (WHERE event_type = '{FUNNEL_STAGES[0]}') AS t_0,
         {_LIST_COLS}
  FROM events GROUP BY 1
),
{_STEP_CTES},
conv AS (
  SELECT CAST(floor(epoch(t_{last})) AS BIGINT)
         - CAST(floor(epoch(t_0)) AS BIGINT) AS latency_sec
  FROM s{last} WHERE t_{last} IS NOT NULL
),
ranked AS (
  SELECT latency_sec,
         ROW_NUMBER() OVER (ORDER BY latency_sec) AS rn,
         COUNT(*) OVER () AS n
  FROM conv
),
q AS (
  SELECT
    CAST(MIN(CASE WHEN rn >= CEIL(0.25 * n) THEN latency_sec END) AS BIGINT)
      AS p25_sec,
    CAST(MIN(CASE WHEN rn >= CEIL(0.50 * n) THEN latency_sec END) AS BIGINT)
      AS p50_sec,
    CAST(MIN(CASE WHEN rn >= CEIL(0.75 * n) THEN latency_sec END) AS BIGINT)
      AS p75_sec
  FROM ranked
),
e AS (
  SELECT COUNT(*) AS n_converted,
         MIN(latency_sec) AS min_sec, MAX(latency_sec) AS max_sec
  FROM conv
)
SELECT n_converted, min_sec, p25_sec, p50_sec, p75_sec, max_sec
FROM e, q
"""


TIMESERIES_ORACLE_SQL["funnel_latency"] = _funnel_latency_oracle_sql()


def _rau_oracle_sql() -> str:
    from mspr2_back_spark.plans.timeseries import WAU_WINDOW_DAYS

    w = WAU_WINDOW_DAYS
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
  WHERE {spine_calendar_sql("ts")}
),
dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
targets AS (
  SELECT DISTINCT user_id, day + CAST(k AS INT) AS day
  FROM ud, unnest(generate_series(0, {w - 1})) AS t(k)
),
wau AS (SELECT day, COUNT(*) AS wau FROM targets GROUP BY 1),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
spine AS (
  SELECT d0, d0 + CAST(k AS INT) AS day
  FROM bounds,
       unnest(generate_series(0,
         CAST(date_diff('day', d0, d1) AS BIGINT))) AS t(k)
)
SELECT s.day,
       CAST(COALESCE(dau, 0) AS BIGINT) AS dau,
       CAST(COALESCE(wau, 0) AS BIGINT) AS wau,
       ROUND(CAST(COALESCE(dau, 0) AS DOUBLE)
             / NULLIF(CAST(COALESCE(wau, 0) AS DOUBLE), 0), 6)
         AS stickiness,
       s.day >= d0 + {w - 1} AS full_window
FROM spine s LEFT JOIN dau USING (day) LEFT JOIN wau USING (day)
ORDER BY 1
"""


TIMESERIES_ORACLE_SQL["rolling_active_users"] = _rau_oracle_sql()
