"""DuckDB oracles for the customer-analytics batch. Constants come
from plans/customer.py; the RFM quintile cutpoints use the
rank-window formulation that operators/quantiles.binned_quantiles
matches bit-for-bit (same contract as the equidepth oracle)."""

from __future__ import annotations

from mspr2_back_spark.plans.customer import (
    PATH_SEP,
    PATH_STEPS,
    PATH_TOP_K,
    RFM_QS,
    RFM_REF_DATE,
)

CUSTOMER_ORACLE_SQL: dict[str, str] = {}


def _rfm_oracle_sql() -> str:
    def cuts(dim: str) -> str:
        sel = ", ".join(
            f"MIN(CASE WHEN rn >= CEIL({p} * n) THEN v END)"
            f" AS {dim}_p{round(p * 100)}"
            for p in RFM_QS
        )
        return (
            f"(SELECT {sel} FROM ("
            f"SELECT {dim} AS v, ROW_NUMBER() OVER (ORDER BY {dim}) AS rn,"
            f" COUNT(*) OVER () AS n FROM pc)) {dim}_q"
        )

    def score(dim: str, alias: str) -> str:
        bands = " ".join(
            f"WHEN {dim} <= {dim}_p{round(p * 100)} THEN {i + 1}"
            for i, p in enumerate(RFM_QS)
        )
        return f"CASE {bands} ELSE 5 END AS {alias}"

    return f"""
WITH pc AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                   DATE '{RFM_REF_DATE}') AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS monetary
  FROM orders GROUP BY 1
),
scored AS (
  SELECT {score('recency_days', 'r_score')},
         {score('frequency', 'f_score')},
         {score('monetary', 'm_score')},
         monetary
  FROM pc, {cuts('recency_days')}, {cuts('frequency')},
       {cuts('monetary')}
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(monetary AS DECIMAL(28,2))) AS DOUBLE), 2)
         AS total_monetary
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


CUSTOMER_ORACLE_SQL["rfm_segments"] = _rfm_oracle_sql()

CUSTOMER_ORACLE_SQL["session_paths"] = f"""
WITH s AS (
  SELECT array_to_string(
           list(event_type ORDER BY ts, event_id)[1:{PATH_STEPS}],
           '{PATH_SEP}') AS path
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
c AS (SELECT path, COUNT(*) AS n_sessions FROM s GROUP BY 1),
t AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS n_total FROM c)
SELECT path, n_sessions,
       ROUND(CAST(n_sessions AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
         AS share
FROM c, t
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOP_K}
"""

CUSTOMER_ORACLE_SQL["cohort_ltv"] = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS event_week,
         value
  FROM events
),
cohorts AS (
  SELECT user_id, MIN(event_week) AS cohort_week FROM ev GROUP BY 1
),
weekly AS (
  SELECT cohort_week,
         CAST(FLOOR(date_diff('day', cohort_week, event_week) / 7) AS INT)
           AS week_offset,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS wv
  FROM ev JOIN cohorts USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_week, week_offset,
       ROUND(wv, 6) AS week_value,
       ROUND(SUM(wv) OVER (PARTITION BY cohort_week ORDER BY week_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS cum_value
FROM weekly
ORDER BY 1, 2
"""
