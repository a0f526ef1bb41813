"""DuckDB oracle SQL — one ANSI-SQL statement per query in
``plans/queries.py``, runnable over the same parquet tables
(pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings).

Determinism contract shared with the Spark side (functions/numeric.py):
- money/metric SUMs aggregate in DECIMAL (exact, order-independent)
  and cast to DOUBLE at the output boundary;
- float ratios divide identical exact intermediates, so both engines
  produce bit-identical doubles;
- timestamps are emitted as DATE or formatted strings;
- every computed column carries the same alias as the Spark plan.
"""

from __future__ import annotations

ORACLE_SQL: dict[str, str] = {}


ORACLE_SQL["pricing_summary"] = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
"""

ORACLE_SQL["global_totals"] = """
SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_base_price,
       COUNT(*) AS n_lineitems
FROM lineitem
"""

ORACLE_SQL["weekly_rollup"] = """
SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS week_total_price
FROM orders
GROUP BY 1, 2
"""

ORACLE_SQL["daily_timeseries"] = """
SELECT CAST(o_orderdate AS DATE) AS order_date,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
FROM orders
GROUP BY 1
ORDER BY order_date
"""

ORACLE_SQL["avg_by_segment"] = """
SELECT c_mktsegment,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_acctbal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_acctbal,
       COUNT(*) AS n_customers
FROM customer
WHERE c_acctbal > 0
GROUP BY c_mktsegment
"""

ORACLE_SQL["distinct_counts"] = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_orderstatus
"""

ORACLE_SQL["max_year_orders"] = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE year(o_orderdate) = (SELECT MAX(year(o_orderdate)) FROM orders)
GROUP BY o_orderstatus
"""

ORACLE_SQL["last_value_sum"] = """
WITH last AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_last_value,
       COUNT(*) AS n_users
FROM last WHERE rn = 1
"""

ORACLE_SQL["revenue_by_nation"] = """
SELECT n_name,
       r_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""

ORACLE_SQL["year_week_rollup_join"] = """
WITH weekly AS (
  SELECT o_custkey AS w_custkey,
         year(o_orderdate) AS w_year,
         weekofyear(o_orderdate) AS w_week,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS weekly_spend,
         COUNT(*) AS weekly_orders
  FROM orders
  GROUP BY 1, 2, 3
)
SELECT o_orderkey,
       o_custkey,
       w_year AS order_year,
       w_week AS order_week,
       weekly_spend,
       weekly_orders
FROM orders
LEFT JOIN weekly
  ON o_custkey = w_custkey
 AND year(o_orderdate) = w_year
 AND weekofyear(o_orderdate) = w_week
"""

ORACLE_SQL["urgent_semijoin"] = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
)
GROUP BY o_orderpriority
"""

ORACLE_SQL["latest_order_per_customer"] = """
WITH last AS (
  SELECT o_custkey,
         CAST(o_orderdate AS DATE) AS last_order_date,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS last_order_price,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT c_custkey, c_name, c_mktsegment, last_order_date, last_order_price
FROM last
JOIN customer ON o_custkey = c_custkey
WHERE rn = 1
"""

ORACLE_SQL["value_lag_diff"] = """
SELECT event_id,
       user_id,
       COALESCE(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                value) AS value_delta
FROM events
"""

ORACLE_SQL["yearly_orders_lag"] = """
WITH yearly AS (
  SELECT year(o_orderdate) AS order_year,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
         COUNT(*) AS n_orders
  FROM orders
  GROUP BY 1
)
SELECT order_year,
       total_price,
       n_orders,
       COALESCE(total_price - LAG(total_price) OVER (ORDER BY order_year), 0.0) AS yoy_delta,
       total_price / NULLIF(LAG(total_price) OVER (ORDER BY order_year), 0.0) AS yoy_ratio
FROM yearly
ORDER BY order_year
"""

ORACLE_SQL["region_yearly_lag"] = """
WITH yearly AS (
  SELECT r_name AS region,
         year(o_orderdate) AS order_year,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT region,
       order_year,
       revenue,
       COALESCE(revenue - LAG(revenue) OVER (PARTITION BY region ORDER BY order_year),
                0.0) AS yoy_delta
FROM yearly
"""

ORACLE_SQL["brand_surrogate_ids"] = """
SELECT CAST(ROW_NUMBER() OVER (ORDER BY brand) AS INT) AS brand_id, brand
FROM (SELECT DISTINCT p_brand AS brand FROM part)
UNION ALL
SELECT 0 AS brand_id, 'unknown' AS brand
"""

ORACLE_SQL["rolling_sum3"] = """
SELECT event_id,
       user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling3_value
FROM events
"""

ORACLE_SQL["top5_customers"] = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
         COUNT(*) AS n_orders
  FROM orders
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, total_spend, n_orders
FROM spend JOIN customer ON o_custkey = c_custkey
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 5
"""

ORACLE_SQL["orders_page"] = """
SELECT o_orderkey,
       o_custkey,
       o_orderstatus,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
LIMIT 100 OFFSET 200
"""

ORACLE_SQL["pagination_meta"] = """
SELECT COUNT(*) AS total_rows,
       CAST(CEIL(COUNT(*) / 100.0) AS BIGINT) AS total_pages
FROM orders
"""

ORACLE_SQL["table_preview"] = """
SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) AS o_orderdate
FROM orders
ORDER BY o_orderkey
LIMIT 100
"""

ORACLE_SQL["segment_decode"] = """
SELECT CASE
         WHEN c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') THEN 'INDUSTRIAL'
         WHEN c_mktsegment IN ('BUILDING', 'FURNITURE') THEN 'CONSTRUCTION'
         ELSE 'OTHER'
       END AS segment_group,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
FROM customer
GROUP BY 1
"""

ORACLE_SQL["props_extract"] = """
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k,
       COUNT(*) AS n_events
FROM (
  SELECT event_type,
         TRY_CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS INT) AS k
  FROM events
)
GROUP BY event_type
"""

ORACLE_SQL["word_counts"] = """
SELECT word, COUNT(*) AS n_occurrences
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n_occurrences DESC, word ASC
LIMIT 20
"""

ORACLE_SQL["date_spine"] = """
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-02-10',
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM events
  GROUP BY 1
)
SELECT spine.day,
       COALESCE(n, 0) AS n_events,
       COALESCE(v, 0.0) AS total_value
FROM spine LEFT JOIN daily ON spine.day = daily.day
ORDER BY spine.day
"""

ORACLE_SQL["pct_negative_acctbal"] = """
SELECT n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
       ROUND(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2)
           AS pct_negative
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

ORACLE_SQL["events_filtered"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
WHERE event_type IN ('click', 'view')
  AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-25 23:59:59'
  AND value IS NOT NULL
GROUP BY event_type
"""

ORACLE_SQL["metric_projection"] = """
SELECT n_name,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS metric_value
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

ORACLE_SQL["hourly_events"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""

ORACLE_SQL["status_priority_rollup"] = """
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""
