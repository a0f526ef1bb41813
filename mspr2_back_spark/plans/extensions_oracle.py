"""DuckDB oracle SQL for plans/extensions.py.

Same determinism contract as plans/oracle.py: DECIMAL-exact sums cast
to DOUBLE at the boundary, discrete (non-interpolating) percentiles,
timestamp-space interval comparisons. ``approx_distinct_users`` has no
oracle by design (estimates are implementation-defined).
"""

from __future__ import annotations

from mspr2_back_spark.plans.timeseries import ts_operating_window_sql

EXTENSION_ORACLE_SQL: dict[str, str] = {}


EXTENSION_ORACLE_SQL["rollup_revenue"] = """
SELECT r_name,
       n_name,
       GROUPING(r_name, n_name) AS lvl,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


EXTENSION_ORACLE_SQL["cube_order_stats"] = """
SELECT o_orderstatus,
       o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS lvl,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


EXTENSION_ORACLE_SQL["grouping_sets_sales"] = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       o_orderpriority,
       GROUPING(EXTRACT(YEAR FROM o_orderdate), o_orderpriority) AS lvl,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((EXTRACT(YEAR FROM o_orderdate)), (o_orderpriority), ())
"""


EXTENSION_ORACLE_SQL["percentile_prices"] = """
WITH ranked AS (
    SELECT o_orderpriority,
           o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
)
SELECT o_orderpriority,
       MIN(CASE WHEN rn >= CEIL(0.25 * n) THEN o_totalprice END) AS p25,
       MIN(CASE WHEN rn >= CEIL(0.50 * n) THEN o_totalprice END) AS p50,
       MIN(CASE WHEN rn >= CEIL(0.75 * n) THEN o_totalprice END) AS p75,
       MAX(n) AS n_orders
FROM ranked
GROUP BY o_orderpriority
"""


EXTENSION_ORACLE_SQL["sessionize_events"] = """
WITH flagged AS (
    SELECT user_id,
           CASE
               WHEN LAG(ts) OVER w IS NULL THEN 1
               WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1
               ELSE 0
           END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(SUM(new_s) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(new_s) AS DOUBLE) AS events_per_session
FROM flagged
GROUP BY user_id
"""


EXTENSION_ORACLE_SQL["crud_upsert"] = """
WITH updates AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           '0-UPDATED' AS o_orderpriority
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01'
),
merged AS (
    SELECT o.* FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)
    UNION ALL
    SELECT * FROM updates
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM merged
GROUP BY o_orderpriority
"""


EXTENSION_ORACLE_SQL["crud_delete"] = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderstatus IS DISTINCT FROM 'F'
GROUP BY o_orderstatus
"""


EXTENSION_ORACLE_SQL["crud_point_lookup"] = """
SELECT o_orderkey,
       o_custkey,
       o_orderstatus,
       o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderpriority
FROM orders
WHERE o_orderkey = 42
"""


EXTENSION_ORACLE_SQL["set_ops_nations"] = """
WITH c AS (
    SELECT DISTINCT CAST(c_nationkey AS INTEGER) AS nk
    FROM customer WHERE c_acctbal < 0
),
s AS (
    SELECT DISTINCT CAST(s_nationkey AS INTEGER) AS nk
    FROM supplier WHERE s_acctbal < 0
)
SELECT 'intersect' AS set_op,
       (SELECT COUNT(*) FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)) AS n_nations
UNION ALL
SELECT 'except',
       (SELECT COUNT(*) FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s))
UNION ALL
SELECT 'union',
       (SELECT COUNT(*) FROM (SELECT nk FROM c UNION SELECT nk FROM s))
"""


EXTENSION_ORACLE_SQL["customer_order_coverage"] = """
WITH early AS (
    SELECT o_custkey AS custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS early_total
    FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) <= 1997
    GROUP BY o_custkey
),
late AS (
    SELECT o_custkey AS custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS late_total
    FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) >= 2001
    GROUP BY o_custkey
)
SELECT COALESCE(early.custkey, late.custkey) AS custkey,
       early_total,
       late_total,
       CASE WHEN early_total IS NULL THEN 'late_only'
            WHEN late_total IS NULL THEN 'early_only'
            ELSE 'both' END AS presence
FROM early FULL OUTER JOIN late ON early.custkey = late.custkey
"""


EXTENSION_ORACLE_SQL["customers_no_jumbo_order"] = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
GROUP BY c_mktsegment
"""


EXTENSION_ORACLE_SQL["asof_event_value"] = f"""
WITH e AS (
    SELECT user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value
    FROM events
    WHERE {ts_operating_window_sql("ts")}
    GROUP BY user_id, ts
)
SELECT a.user_id, a.ts, a.value, b.value AS asof_value
FROM e a ASOF LEFT JOIN e b
  ON a.user_id = b.user_id AND b.ts <= a.ts - INTERVAL 30 MINUTE
"""


EXTENSION_ORACLE_SQL["events_in_windows"] = """
WITH windows AS (
    SELECT i AS window_id,
           TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 4 HOUR AS w_start,
           TIMESTAMP '2024-01-01 00:45:00' + i * INTERVAL 4 HOUR AS w_end
    FROM range(0, 180) t(i)
)
SELECT window_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e
JOIN windows w ON w.w_start <= e.ts AND e.ts < w.w_end
GROUP BY window_id
"""


EXTENSION_ORACLE_SQL["profile_orders"] = """
WITH stats AS (
    SELECT COUNT(*) AS n_rows,
           COUNT(o_custkey) AS ck_nn, COUNT(DISTINCT o_custkey) AS ck_nd,
           CAST(MIN(o_custkey) AS STRING) AS ck_min, CAST(MAX(o_custkey) AS STRING) AS ck_max,
           COUNT(o_orderstatus) AS st_nn, COUNT(DISTINCT o_orderstatus) AS st_nd,
           CAST(MIN(o_orderstatus) AS STRING) AS st_min, CAST(MAX(o_orderstatus) AS STRING) AS st_max,
           COUNT(o_totalprice) AS tp_nn, COUNT(DISTINCT o_totalprice) AS tp_nd,
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS STRING) AS tp_min,
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS STRING) AS tp_max
    FROM orders
)
SELECT 'o_custkey' AS col_name, n_rows - ck_nn AS n_nulls, ck_nd AS n_distinct,
       ck_min AS min_value, ck_max AS max_value FROM stats
UNION ALL
SELECT 'o_orderstatus', n_rows - st_nn, st_nd, st_min, st_max FROM stats
UNION ALL
SELECT 'o_totalprice', n_rows - tp_nn, tp_nd, tp_min, tp_max FROM stats
"""


EXTENSION_ORACLE_SQL["order_rank_metrics"] = """
SELECT o_orderpriority,
       o_orderkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 9) AS cume
FROM orders
WHERE o_totalprice > 350000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


EXTENSION_ORACLE_SQL["status_pivot"] = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
"""


EXTENSION_ORACLE_SQL["above_avg_orders"] = """
SELECT o_orderstatus, COUNT(*) AS n_above_avg
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(18,2)) > (
    SELECT AVG(CAST(i.o_totalprice AS DECIMAL(18,2)))
    FROM orders i
    WHERE i.o_custkey = o.o_custkey
)
GROUP BY o_orderstatus
"""


EXTENSION_ORACLE_SQL["window_frame_metrics"] = """
WITH yearly AS (
    SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
)
SELECT o_year,
       total,
       LAG(total) OVER w AS prev_total,
       LEAD(total) OVER w AS next_total,
       FIRST_VALUE(total) OVER wf AS first_year_total,
       LAST_VALUE(total) OVER wf AS last_year_total,
       NTH_VALUE(total, 2) OVER wf AS second_year_total
FROM yearly
WINDOW w AS (ORDER BY o_year),
       wf AS (ORDER BY o_year ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


EXTENSION_ORACLE_SQL["shipping_priority"] = """
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


EXTENSION_ORACLE_SQL["local_supplier_volume"] = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
GROUP BY n_name
"""


EXTENSION_ORACLE_SQL["top3_orders_per_segment"] = """
SELECT c_mktsegment, rn, o_orderkey, o_totalprice
FROM (
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rn <= 3
"""


# DuckDB widens SUM(INTEGER) to HUGEINT, which hash-mismatches the
# Spark query's LongType — every integer SUM in an oracle must CAST
# AS BIGINT.  k_min/k_max stay INTEGER on both engines (MIN/MAX never
# widen), so the bare INTEGER casts below are the aligned type, not an
# oversight.  (Trap history: COVERAGE.md "oracle traps".)
# json_valid guard mirrors the Spark side's try_parse_json (r15
# totality fix): on a malformed payload Spark yields NULL while bare
# json_extract would ABORT the oracle — the guard keeps dirty-corpus
# parity instead of erroring where Spark returns NULL (r15 ADVICE).
# Clean corpora are unaffected: every props is valid JSON, the CASE
# passes through, and the sf0.01 hash is unchanged (sim-verified).
EXTENSION_ORACLE_SQL["props_variant_stats"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN json_valid(props)
                     THEN TRY_CAST(json_extract(props, '$.k') AS INTEGER)
                END) AS BIGINT) AS k_sum,
       MIN(CASE WHEN json_valid(props)
                THEN TRY_CAST(json_extract(props, '$.k') AS INTEGER)
           END) AS k_min,
       MAX(CASE WHEN json_valid(props)
                THEN TRY_CAST(json_extract(props, '$.k') AS INTEGER)
           END) AS k_max
FROM events
GROUP BY event_type
"""


EXTENSION_ORACLE_SQL["price_histogram"] = """
SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
FROM orders
GROUP BY CAST(FLOOR(o_totalprice / 50000) AS BIGINT)
"""


EXTENSION_ORACLE_SQL["hot_shingles"] = """
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                  FOR i IN range(1, len(w) - 1)])
         END AS shingles
  FROM words
),
ex AS (
  SELECT doc_id, UNNEST(shingles) AS shingle FROM sh
)
SELECT shingle, COUNT(DISTINCT doc_id) AS doc_freq
FROM ex
GROUP BY shingle
HAVING COUNT(DISTINCT doc_id) >= 5
ORDER BY doc_freq DESC, shingle ASC
LIMIT 20
"""


EXTENSION_ORACLE_SQL["scaled_user_values"] = """
WITH per_row AS (
    SELECT user_id,
           ROUND((value - MIN(value) OVER g)
                 / NULLIF(MAX(value) OVER g - MIN(value) OVER g, 0.0), 9) AS scaled
    FROM events
    WINDOW g AS (PARTITION BY user_id)
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(scaled AS DECIMAL(18,9))) AS DOUBLE) AS scaled_sum,
       MIN(scaled) AS scaled_min,
       MAX(scaled) AS scaled_max
FROM per_row
GROUP BY user_id
"""


EXTENSION_ORACLE_SQL["pack_documents"] = """
WITH toks AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
    FROM documents
),
with_chunk AS (
    SELECT doc_id, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens) / 8192) AS BIGINT) AS chunk_id
    FROM toks
)
SELECT chunk_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
FROM with_chunk
GROUP BY chunk_id
"""


# Deterministic IVF: the SQL mirrors similarity.ivf_topk_deterministic
# step for step — hash-shard seed cells, decimal-mean centroids (one
# Lloyd refinement), left-fold distances, (dist, cell) tie-breaks —
# so every float matches bit-for-bit (see the determinism contract in
# plans/oracle.py).
_IVF_DIST = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> (CAST({v}[i] AS DOUBLE) - {c}[i]) * (CAST({v}[i] AS DOUBLE) - {c}[i])), "
    "(x, y) -> x + y)"
)
_IVF_CENT = """
  SELECT cell, d,
         CAST(SUM(CAST(CAST(embedding[d] AS DOUBLE) AS DECIMAL(27,12))) AS DOUBLE)
             / COUNT(*) AS c
  FROM {src}, (SELECT unnest(generate_series(1, 64)) AS d) dims
  GROUP BY cell, d
"""

EXTENSION_ORACLE_SQL["ann_ivf_topk"] = """
WITH cells0 AS (
  SELECT vec_id, vec_id % 8 AS cell, embedding FROM embeddings
),
cent0 AS ({cent0}),
cent0l AS (SELECT cell, list(c ORDER BY d) AS cvec FROM cent0 GROUP BY cell),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist_v_c0} ASC, c.cell ASC) AS rn
    FROM embeddings v, cent0l c
  ) WHERE rn = 1
),
cells1 AS (
  SELECT v.vec_id, a1.cell, v.embedding
  FROM embeddings v JOIN a1 ON v.vec_id = a1.vec_id
),
cent1 AS ({cent1}),
cent1l AS (SELECT cell, list(c ORDER BY d) AS cvec FROM cent1 GROUP BY cell),
a2 AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist_v_c1} ASC, c.cell ASC) AS rn
    FROM embeddings v, cent1l c
  ) WHERE rn = 1
),
probes AS (
  SELECT c.cell
  FROM embeddings q, cent1l c
  WHERE q.vec_id = 7
  ORDER BY {dist_q_c1} ASC, c.cell ASC
  LIMIT 3
),
nv AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
  FROM embeddings
),
q AS (SELECT embedding, nrm FROM nv WHERE vec_id = 7)
SELECT v.vec_id, a2.cell,
       ROUND({dot} / (v.nrm * q.nrm), 6) AS cosine_sim
FROM nv v
JOIN a2 ON v.vec_id = a2.vec_id, q
WHERE a2.cell IN (SELECT cell FROM probes) AND v.vec_id <> 7
ORDER BY cosine_sim DESC, v.vec_id ASC
LIMIT 10
""".format(
    cent0=_IVF_CENT.format(src="cells0"),
    cent1=_IVF_CENT.format(src="cells1"),
    dist_v_c0=_IVF_DIST.format(v="v.embedding", c="c.cvec"),
    dist_v_c1=_IVF_DIST.format(v="v.embedding", c="c.cvec"),
    dist_q_c1=_IVF_DIST.format(v="q.embedding", c="c.cvec"),
    dot=(
        "list_reduce(list_transform(generate_series(1, 64), "
        "i -> CAST(v.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), "
        "(x, y) -> x + y)"
    ),
)


EXTENSION_ORACLE_SQL["user_event_sequences"] = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts,
       array_to_string(list(event_type ORDER BY ts, event_id), '|')
           AS event_type_seq
FROM events
WHERE {ts_operating_window_sql("ts")}
GROUP BY user_id
"""


# Same oracle as percentile_prices: the refined (binned two-phase)
# plan must produce the identical exact discrete quantiles.
EXTENSION_ORACLE_SQL["percentile_prices_refined"] = EXTENSION_ORACLE_SQL[
    "percentile_prices"
]


EXTENSION_ORACLE_SQL["chunk_documents"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
),
nc AS (
  SELECT doc_id, w,
         1 + CAST(CEIL(GREATEST(len(w) - 32, 0) / 24.0) AS INT) AS n_chunks
  FROM toks
),
ex AS (
  SELECT doc_id, w, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
  FROM nc
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(len(list_slice(w, chunk_idx * 24 + 1, chunk_idx * 24 + 32)) AS INT)
           AS n_tokens,
       md5(array_to_string(list_slice(w, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' '))
           AS chunk_hash
FROM ex
"""


# skewed_join_topk (r7): the oracle is the PLAIN unsalted join +
# aggregate — salting must be a pure physical-plan rewrite, so any
# divergence (dropped salt column, replicated-dim dup, partial-merge
# bug in the two-phase distinct) breaks the hash. Sign-safe modulo on
# user_id mirrors the Spark side's pmod.
EXTENSION_ORACLE_SQL["skewed_join_topk"] = """
WITH seg AS (
  SELECT CASE WHEN ((user_id % 10) + 10) % 10 < 7 THEN 0
              ELSE ((user_id % 10) + 10) % 10 - 6 END AS seg_id,
         user_id, value
  FROM events
),
dim(seg_id, seg_name) AS (
  VALUES (0, 'organic'), (1, 'paid'), (2, 'referral'), (3, 'social')
),
agg AS (
  SELECT seg_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS total_value,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM seg GROUP BY 1
)
SELECT d.seg_name, n_events, total_value, n_users
FROM agg JOIN dim d ON agg.seg_id = d.seg_id
ORDER BY total_value DESC, d.seg_name
"""


def _morton_sql(gx: str, gy: str, bits: int) -> str:
    """The same bit interleave sources/zorder.morton_code generates,
    unrolled as DuckDB shift/mask arithmetic: column 0's bit i lands
    at position 2i, column 1's at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"((({gx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({gy} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# zorder_locality_audit (r7): the oracle recomputes the grid scaling
# and the FULL 32-term Morton interleave in SQL — a single misplaced
# bit position reshuffles rows across curve segments and breaks the
# hash. FLOOR on both engines (CAST rounds in DuckDB, truncates in
# Spark — the documented trap); grid levels = 2^16 - 1.
_Z_LEVELS = 65535
EXTENSION_ORACLE_SQL["zorder_locality_audit"] = f"""
WITH src AS (
  SELECT CAST(user_id AS DOUBLE) AS u, CAST(value AS DOUBLE) AS v,
         user_id, value
  FROM events
),
stats AS (
  SELECT MIN(u) AS mn_u, MAX(u) AS mx_u,
         MIN(v) AS mn_v, MAX(v) AS mx_v
  FROM src
),
gridded AS (
  SELECT user_id, value, mn_u, mx_u, mn_v, mx_v,
         CASE WHEN mx_u - mn_u = 0 THEN 0
              ELSE CAST(FLOOR((u - mn_u) / (mx_u - mn_u) * {_Z_LEVELS}
                              + 0.5) AS BIGINT) END AS gu,
         CASE WHEN mx_v - mn_v = 0 THEN 0
              ELSE CAST(FLOOR((v - mn_v) / (mx_v - mn_v) * {_Z_LEVELS}
                              + 0.5) AS BIGINT) END AS gv
  FROM src, stats
)
SELECT CAST(({_morton_sql("gu", "gv", 16)}) >> 26 AS INT) AS z_segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(MAX(user_id) - MIN(user_id) AS DOUBLE)
             / NULLIF(ANY_VALUE(mx_u) - ANY_VALUE(mn_u), 0.0), 6)
           AS user_box_frac,
       ROUND((MAX(value) - MIN(value))
             / NULLIF(ANY_VALUE(mx_v) - ANY_VALUE(mn_v), 0.0), 6)
           AS value_box_frac
FROM gridded
GROUP BY 1
ORDER BY 1
"""
