"""DuckDB oracles for the round-5 workload queries.

The BM25 scoring expression and every tunable constant are imported
from the query side (one source of truth — ADVICE r4); the funnel
stage chain is generated from the same FUNNEL_STAGES tuple the Spark
plan iterates.
"""

from __future__ import annotations

from mspr2_back_spark.operators.retrieval import bm25_score_sql
from mspr2_back_spark.plans.pipeline_oracle import PIPELINE_ORACLE_SQL
from mspr2_back_spark.plans.workloads import (
    ANN_BATCH_K,
    ANN_BATCH_QUERIES,
    BM25_K,
    BM25_TERMS,
    FUNNEL_STAGES,
    FUNNEL_WINDOW_DAYS,
)

WORKLOAD_ORACLE_SQL: dict[str, str] = {}

_TF_COLS = ",\n         ".join(
    f"len(list_filter(string_split(text, ' '), w -> w = '{t}')) AS tf_{i}"
    for i, t in enumerate(BM25_TERMS)
)
_DF_COLS = ",\n         ".join(
    f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
    for i in range(len(BM25_TERMS))
)
_SCORE = " + ".join(bm25_score_sql(i) for i in range(len(BM25_TERMS)))

WORKLOAD_ORACLE_SQL["bm25_topk"] = f"""
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS dl,
         {_TF_COLS}
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl,
         {_DF_COLS}
  FROM base
)
SELECT doc_id, score FROM (
  SELECT doc_id, ROUND({_SCORE}, 6) AS score FROM base, stats
) WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT {BM25_K}
"""

_BATCH_DOT = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST(v.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), "
    "(x, y) -> x + y)"
)

WORKLOAD_ORACLE_SQL["ann_batch_topk"] = f"""
WITH v AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, embedding, nrm FROM v WHERE vec_id < {ANN_BATCH_QUERIES}),
scored AS (
  SELECT q.q_id, v.vec_id,
         ROUND({_BATCH_DOT} / (v.nrm * q.nrm), 6) AS cosine_sim
  FROM v, q WHERE v.vec_id >= {ANN_BATCH_QUERIES}
)
SELECT q_id, CAST(rank AS INT) AS rank, vec_id, cosine_sim FROM (
  SELECT q_id, vec_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {ANN_BATCH_K}
ORDER BY q_id, rank
"""

WORKLOAD_ORACLE_SQL["retention_cohorts"] = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS event_week
  FROM events
),
cohorts AS (
  SELECT user_id, MIN(event_week) AS cohort_week FROM ev GROUP BY 1
)
SELECT cohort_week,
       CAST(FLOOR(date_diff('day', cohort_week, event_week) / 7) AS INT)
         AS week_offset,
       COUNT(DISTINCT ev.user_id) AS active_users
FROM ev JOIN cohorts USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""

_LIST_COLS = ",\n         ".join(
    f"list(ts ORDER BY ts) FILTER (WHERE event_type = '{s}') AS ts_{s}"
    for s in FUNNEL_STAGES[1:]
)
_STEP_CTES = ",\n".join(
    f"s{i} AS (SELECT *, list_filter(ts_{s}, x -> x > t_{i - 1}"
    f" AND CAST(x AS DATE) <= CAST(t_0 AS DATE) + {FUNNEL_WINDOW_DAYS})[1]"
    f" AS t_{i} FROM s{i - 1})"
    for i, s in enumerate(FUNNEL_STAGES[1:], start=1)
)
_REACHED = ",\n       ".join(
    f"COUNT(t_{i}) AS reached_{s}" for i, s in enumerate(FUNNEL_STAGES)
)

WORKLOAD_ORACLE_SQL["event_funnel"] = f"""
WITH s0 AS (
  SELECT user_id,
         MIN(ts) FILTER (WHERE event_type = '{FUNNEL_STAGES[0]}') AS t_0,
         {_LIST_COLS}
  FROM events GROUP BY 1
),
{_STEP_CTES}
SELECT COUNT(*) AS n_users,
       {_REACHED}
FROM s{len(FUNNEL_STAGES) - 1}
"""

# Engine-portable md5 bucket over doc_id with the 'qw' salt —
# character-identical to operators/sampling.portable_hash_bucket
# (same construction as pipeline_oracle._MD5_BUCKET).
_QW_NIB = "(strpos('0123456789abcdef', substring(h, {i}, 1)) - 1)"
_QW_BUCKET = (
    _QW_NIB.format(i=1) + " * 4096 + " + _QW_NIB.format(i=2) + " * 256 + "
    + _QW_NIB.format(i=3) + " * 16 + " + _QW_NIB.format(i=4)
)

WORKLOAD_ORACLE_SQL["quality_weighted_sample"] = f"""
WITH tq AS (SELECT * FROM ({PIPELINE_ORACLE_SQL["text_quality"]})),
hashed AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR) || '|qw') AS h
  FROM documents
)
SELECT hashed.doc_id, hashed.source, tq.quality_score
FROM hashed JOIN tq USING (doc_id)
WHERE {_QW_BUCKET} < CAST(FLOOR(tq.quality_score * 65536) AS INT)
"""

WORKLOAD_ORACLE_SQL["equidepth_price_bands"] = """
WITH ranked AS (
    SELECT o_orderpriority,
           o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
),
cuts AS (
    SELECT o_orderpriority,
           MIN(CASE WHEN rn >= CEIL(0.25 * n) THEN o_totalprice END) AS p25,
           MIN(CASE WHEN rn >= CEIL(0.50 * n) THEN o_totalprice END) AS p50,
           MIN(CASE WHEN rn >= CEIL(0.75 * n) THEN o_totalprice END) AS p75
    FROM ranked
    GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CASE WHEN o_totalprice <= p25 THEN 0
            WHEN o_totalprice <= p50 THEN 1
            WHEN o_totalprice <= p75 THEN 2
            ELSE 3 END AS band,
       COUNT(*) AS n_in_band,
       MIN(o_totalprice) AS band_min,
       MAX(o_totalprice) AS band_max,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_total
FROM orders o JOIN cuts USING (o_orderpriority)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _quant_oracle_sql(dim: int = 64) -> str:
    from mspr2_back_spark.operators.quantize import quant_err_term_sql

    mins = ", ".join(f"MIN(xs[{i}])" for i in range(1, dim + 1))
    maxs = ", ".join(f"MAX(xs[{i}])" for i in range(1, dim + 1))
    term = quant_err_term_sql("xs[i]", "mn[i]", "mx[i]")
    return f"""
WITH x AS (
  SELECT label, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS xs
  FROM embeddings
),
stats AS (SELECT [{mins}] AS mn, [{maxs}] AS mx FROM x),
err AS (
  SELECT label,
         ROUND(list_reduce(list_transform(generate_series(1, {dim}),
               i -> {term}), (a, b) -> a + b), 6) AS verr
  FROM x, stats
)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(CAST(verr AS DECIMAL(18,6))) AS DOUBLE) AS total_abs_err,
       MAX(verr) AS max_abs_err
FROM err
GROUP BY label
ORDER BY label
"""


WORKLOAD_ORACLE_SQL["embedding_quantize_stats"] = _quant_oracle_sql()


def _fk_oracle_sql() -> str:
    from mspr2_back_spark.plans.workloads import FK_EDGES

    parts = []
    for child, fk, parent, pk in FK_EDGES:
        parts.append(f"""
SELECT '{child}->{parent}' AS relationship,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans,
       ROUND(CAST(CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS DOUBLE) / COUNT(*), 6) AS orphan_rate
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
  ON c.{fk} = p.{pk}""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY relationship"


WORKLOAD_ORACLE_SQL["fk_integrity_audit"] = _fk_oracle_sql()


def _corr_oracle_sql() -> str:
    from mspr2_back_spark.plans.workloads import CORR_COLS, CORR_SCALE, corr_sql

    keys = [k for k, _ in CORR_COLS]
    cols = dict(CORR_COLS)
    sums = []
    for i, a in enumerate(keys):
        sums.append(
            f"CAST(SUM(CAST({cols[a]} AS {CORR_SCALE})) AS DOUBLE) AS s_{a}"
        )
        for b in keys[i:]:
            sums.append(
                f"CAST(SUM(CAST({cols[a]} * {cols[b]} AS {CORR_SCALE})) AS DOUBLE)"
                f" AS ss_{a}{b}"
            )
    corrs = []
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            corrs.append(f"{corr_sql(a, b)} AS corr_{a}{b}")
    return f"""
WITH moments AS (
  SELECT l_returnflag, COUNT(*) AS n,
         {', '.join(sums)}
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n, {', '.join(corrs)}
FROM moments
ORDER BY l_returnflag
"""


WORKLOAD_ORACLE_SQL["lineitem_corr_matrix"] = _corr_oracle_sql()


def _sliding_oracle_sql() -> str:
    from mspr2_back_spark.plans.timeseries import ts_operating_window_sql
    from mspr2_back_spark.plans.workloads import SLIDE_STEP_MIN, SLIDE_WIDTH_MIN

    step_s = SLIDE_STEP_MIN * 60
    n_hops = SLIDE_WIDTH_MIN // SLIDE_STEP_MIN
    # Spark's window(ts, w, s) assigns ts to starts
    # {floor_to_step(ts) - k*step : k in 0..w/s-1}; epoch alignment
    # matches Spark's 1970-01-01 origin. to_timestamp yields
    # TIMESTAMPTZ — cast back to naive (session is UTC).
    return f"""
WITH ex AS (
  SELECT CAST(to_timestamp(FLOOR(epoch(ts) / {step_s}) * {step_s}
              - k * {step_s}) AS TIMESTAMP) AS window_start,
         event_type, value
  FROM events, unnest(generate_series(0, {n_hops - 1})) AS t(k)
  WHERE {ts_operating_window_sql("ts")}
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM ex
GROUP BY 1, 2
ORDER BY 1, 2
"""


WORKLOAD_ORACLE_SQL["sliding_event_rates"] = _sliding_oracle_sql()


def _scd2_oracle_sql() -> str:
    from mspr2_back_spark.plans.workloads import (
        SCD2_BASE_FROM,
        SCD2_EFFECTIVE,
        SCD2_NEW_SEGMENT,
    )

    return f"""
WITH upd AS (
  SELECT c_custkey, '{SCD2_NEW_SEGMENT}' AS new_seg
  FROM customer WHERE c_acctbal < 0
),
joined AS (
  SELECT c.c_custkey, c.c_mktsegment, u.new_seg
  FROM customer c LEFT JOIN upd u USING (c_custkey)
)
SELECT c_custkey, c_mktsegment,
       CAST('{SCD2_BASE_FROM}' AS DATE) AS valid_from,
       CASE WHEN new_seg IS NOT NULL
            THEN CAST('{SCD2_EFFECTIVE}' AS DATE) END AS valid_to,
       new_seg IS NULL AS is_current
FROM joined
UNION ALL
SELECT c_custkey, new_seg AS c_mktsegment,
       CAST('{SCD2_EFFECTIVE}' AS DATE) AS valid_from,
       CAST(NULL AS DATE) AS valid_to,
       TRUE AS is_current
FROM joined WHERE new_seg IS NOT NULL
ORDER BY c_custkey, valid_from
"""


WORKLOAD_ORACLE_SQL["scd2_customer_merge"] = _scd2_oracle_sql()


def _ann_quant_oracle_sql(dim: int = 64) -> str:
    from mspr2_back_spark.operators.quantize import quant_recon_sql
    from mspr2_back_spark.plans.workloads import ANN_QUANT_K, ANN_QUANT_QUERY_ID

    mins = ", ".join(f"MIN(xs[{i}])" for i in range(1, dim + 1))
    maxs = ", ".join(f"MAX(xs[{i}])" for i in range(1, dim + 1))
    recon = quant_recon_sql("xs[i]", "mn[i]", "mx[i]")
    norm = (
        "sqrt(list_reduce(list_transform({v}, e -> e * e), (a, b) -> a + b))"
    )
    dot = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> d.dq[i] * q.dq[i]), (a, b) -> a + b)"
    )
    return f"""
WITH x AS (
  SELECT vec_id, label, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS xs
  FROM embeddings
),
stats AS (SELECT [{mins}] AS mn, [{maxs}] AS mx FROM x),
dq AS (
  SELECT vec_id, label,
         list_transform(generate_series(1, {dim}), i -> {recon}) AS dq
  FROM x, stats
),
q AS (SELECT dq, {norm.format(v='dq')} AS nrm FROM dq
      WHERE vec_id = {ANN_QUANT_QUERY_ID})
SELECT d.vec_id, d.label,
       ROUND({dot} / ({norm.format(v='d.dq')} * q.nrm), 6) AS cosine_sim
FROM dq d, q
WHERE d.vec_id <> {ANN_QUANT_QUERY_ID}
ORDER BY cosine_sim DESC, d.vec_id ASC
LIMIT {ANN_QUANT_K}
"""


WORKLOAD_ORACLE_SQL["ann_quantized_topk"] = _ann_quant_oracle_sql()


def _hybrid_oracle_sql() -> str:
    from mspr2_back_spark.plans.pipeline_oracle import PIPELINE_ORACLE_SQL as P
    from mspr2_back_spark.plans.workloads import HYBRID_TOPK, rrf_score_sql

    return f"""
WITH kw0 AS (SELECT * FROM ({WORKLOAD_ORACLE_SQL["bm25_topk"]})),
kw AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS kw_rank
  FROM kw0
),
vec0 AS (SELECT * FROM ({P["ann_topk"]})),
vec AS (
  SELECT vec_id AS doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, vec_id) AS INT)
           AS vec_rank
  FROM vec0
),
fused AS (
  SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id, kw_rank, vec_rank
  FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
)
SELECT doc_id, kw_rank, vec_rank, {rrf_score_sql()} AS rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id
LIMIT {HYBRID_TOPK}
"""


WORKLOAD_ORACLE_SQL["hybrid_search_rrf"] = _hybrid_oracle_sql()
