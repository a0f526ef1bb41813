"""DuckDB oracle SQL for plans/analytics.py — one entry per
ANALYTICS_QUERIES key, same column names and types as the Spark query
so the driver's sorted-columns value-hash comparison is exact.

Dialect discipline (COVERAGE.md "oracle traps"):
- every SUM over an integer column is CAST AS BIGINT (DuckDB SUM of
  INTEGER widens to HUGEINT, which hash-mismatches Spark's LongType);
- money sums go through DECIMAL(18,2) then CAST AS DOUBLE, mirroring
  functions/numeric.py so both engines emit identical doubles;
- array folds use list_reduce in index order, identical to Spark's
  aggregate() left fold (0.0 + x == x exactly, so no init prepend);
- the md5 shard bucket is character-identical to
  operators/sampling.py::portable_hash_bucket (first 4 hex nibbles).
"""

from __future__ import annotations

from mspr2_back_spark.plans.analytics import IDLE_CUTOFF_DATE

ANALYTICS_ORACLE_SQL: dict[str, str] = {}


ANALYTICS_ORACLE_SQL["customer_order_histogram"] = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""


ANALYTICS_ORACLE_SQL["min_cost_supplier_per_part"] = """
WITH li_small AS (
  SELECT l.l_partkey, l.l_extendedprice, l.l_suppkey, p.p_name
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_size <= 5
),
min_price AS (
  SELECT l_partkey, MIN(l_extendedprice) AS min_price
  FROM li_small GROUP BY l_partkey
),
best AS (
  SELECT s.l_partkey AS p_partkey, s.p_name, m.min_price,
         MIN(s.l_suppkey) AS best_suppkey
  FROM li_small s
  JOIN min_price m
    ON s.l_partkey = m.l_partkey AND s.l_extendedprice = m.min_price
  GROUP BY s.l_partkey, s.p_name, m.min_price
)
SELECT b.p_partkey, b.p_name, b.min_price, b.best_suppkey, su.s_name
FROM best b JOIN supplier su ON b.best_suppkey = su.s_suppkey
ORDER BY b.min_price, b.p_partkey
LIMIT 100
"""


ANALYTICS_ORACLE_SQL["revenue_share_by_nation"] = """
WITH rev AS (
  SELECT n.n_name,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
           AS d
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
),
per_nation AS (
  SELECT n_name, CAST(SUM(d) AS DOUBLE) AS nation_revenue
  FROM rev GROUP BY n_name
),
total AS (SELECT CAST(SUM(d) AS DOUBLE) AS total_revenue FROM rev)
SELECT n_name, nation_revenue,
       ROUND(nation_revenue / total_revenue, 6) AS revenue_share
FROM per_nation, total
WHERE nation_revenue / total_revenue >= 0.02
ORDER BY nation_revenue DESC, n_name
"""


ANALYTICS_ORACLE_SQL["brand_supplier_counts"] = """
SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#15' AND p.p_size <= 25
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
"""


ANALYTICS_ORACLE_SQL["or_of_ands_revenue"] = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2))
                - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


ANALYTICS_ORACLE_SQL["waiting_orders_by_supplier"] = """
WITH fli AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
  FROM lineitem l
  WHERE l.l_orderkey IN
        (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
),
ostats AS (
  SELECT l_orderkey, MAX(l_shipdate) AS max_ship,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM fli GROUP BY l_orderkey
),
unique_last AS (
  SELECT f.l_orderkey, MIN(f.l_suppkey) AS s_suppkey
  FROM fli f
  JOIN ostats s ON f.l_orderkey = s.l_orderkey
  WHERE s.n_supp >= 2 AND f.l_shipdate = s.max_ship
  GROUP BY f.l_orderkey
  HAVING MIN(f.l_suppkey) = MAX(f.l_suppkey)
)
SELECT u.s_suppkey, su.s_name, COUNT(*) AS numwait
FROM unique_last u JOIN supplier su ON u.s_suppkey = su.s_suppkey
GROUP BY u.s_suppkey, su.s_name
ORDER BY numwait DESC, su.s_name
LIMIT 20
"""


ANALYTICS_ORACLE_SQL["idle_customers_avg_bal"] = """
WITH t AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_pos_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c, t
WHERE c.c_acctbal > t.avg_pos_bal
  AND c.c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '{cutoff}')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""".format(cutoff=IDLE_CUTOFF_DATE)


# Engine-portable md5 shard, character-identical to
# operators/sampling.py::portable_hash_bucket (same idiom as the
# source_mixture_sample oracle in pipeline_oracle.py).
_NIB = "(strpos('0123456789abcdef', substring(h, {i}, 1)) - 1)"
_MD5_16 = (
    "(" + _NIB.format(i=1) + " * 4096 + " + _NIB.format(i=2) + " * 256 + "
    + _NIB.format(i=3) + " * 16 + " + _NIB.format(i=4) + ") % 16"
)

ANALYTICS_ORACLE_SQL["corpus_shuffle"] = """
WITH sharded AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR) || '|shuffle42') AS h
  FROM documents
),
with_shard AS (
  SELECT doc_id, h, CAST({shard} AS INT) AS shard FROM sharded
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS INT) AS pos
FROM with_shard
""".format(shard=_MD5_16)


ANALYTICS_ORACLE_SQL["ivf_cell_stats"] = """
WITH cells0 AS (
  SELECT vec_id, vec_id % 8 AS cell, embedding FROM embeddings
),
cent0 AS (
  SELECT cell, d,
         CAST(SUM(CAST(CAST(embedding[d] AS DOUBLE) AS DECIMAL(27,12)))
              AS DOUBLE) / COUNT(*) AS c
  FROM cells0, (SELECT unnest(generate_series(1, 64)) AS d) dims
  GROUP BY cell, d
),
cent0l AS (SELECT cell, list(c ORDER BY d) AS cvec FROM cent0 GROUP BY cell),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist} ASC, c.cell ASC) AS rn
    FROM embeddings v, cent0l c
  ) WHERE rn = 1
),
cells1 AS (
  SELECT v.vec_id, a1.cell, v.embedding
  FROM embeddings v JOIN a1 ON v.vec_id = a1.vec_id
),
cent1 AS (
  SELECT cell, d,
         CAST(SUM(CAST(CAST(embedding[d] AS DOUBLE) AS DECIMAL(27,12)))
              AS DOUBLE) / COUNT(*) AS c
  FROM cells1, (SELECT unnest(generate_series(1, 64)) AS d) dims
  GROUP BY cell, d
),
cent1l AS (SELECT cell, list(c ORDER BY d) AS cvec FROM cent1 GROUP BY cell),
a2 AS (
  SELECT vec_id, cell, dist FROM (
    SELECT v.vec_id, c.cell, {dist} AS dist,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist} ASC, c.cell ASC) AS rn
    FROM embeddings v, cent1l c
  ) WHERE rn = 1
),
cells AS (
  SELECT cell, COUNT(*) AS n_vectors,
         CAST(SUM(CAST(dist AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*)
           AS raw_avg
  FROM a2 GROUP BY cell
),
tot AS (SELECT COUNT(*) AS n_total FROM a2)
SELECT cell, n_vectors,
       ROUND(n_vectors / n_total, 6) AS share,
       ROUND(raw_avg, 6) AS avg_sq_dist
FROM cells, tot
ORDER BY cell
""".format(
    dist=(
        "list_reduce(list_transform(generate_series(1, 64), "
        "i -> (CAST(v.embedding[i] AS DOUBLE) - c.cvec[i])"
        " * (CAST(v.embedding[i] AS DOUBLE) - c.cvec[i])), "
        "(x, y) -> x + y)"
    )
)


ANALYTICS_ORACLE_SQL["bigram_pmi"] = """
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
),
idx AS (
  SELECT w, unnest(generate_series(1, GREATEST(len(w) - 1, 0))) AS i
  FROM toks
),
bigrams AS (SELECT w[i] AS w1, w[i + 1] AS w2 FROM idx),
unigrams AS (SELECT unnest(w) AS tok FROM toks),
uni_counts AS (SELECT tok, COUNT(*) AS c FROM unigrams GROUP BY tok),
bi_counts AS (
  SELECT w1, w2, COUNT(*) AS c_xy FROM bigrams GROUP BY w1, w2
),
tot AS (
  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni_counts) AS n_unigrams,
         (SELECT COUNT(*) FROM bigrams) AS n_bigrams
)
SELECT b.w1, b.w2, b.c_xy,
       ROUND((b.c_xy / t.n_bigrams)
             / ((u1.c / t.n_unigrams) * (u2.c / t.n_unigrams)), 6)
         AS pmi_lift
FROM bi_counts b
JOIN uni_counts u1 ON b.w1 = u1.tok
JOIN uni_counts u2 ON b.w2 = u2.tok, tot t
WHERE b.c_xy >= 5
ORDER BY pmi_lift DESC, b.w1, b.w2
LIMIT 50
"""


ANALYTICS_ORACLE_SQL["embedding_norm_stats"] = """
WITH nv AS (
  SELECT label,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
              (a, b) -> a + b)) AS nrm
  FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vectors,
       ROUND(CAST(SUM(CAST(nrm AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6)
         AS avg_norm,
       ROUND(MIN(nrm), 6) AS min_norm,
       ROUND(MAX(nrm), 6) AS max_norm
FROM nv
GROUP BY label
ORDER BY label
"""
