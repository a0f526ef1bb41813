"""DuckDB oracles for the sketch / text-relevance batch.

The CMS grid is reproduced cell-for-cell: the oracle evaluates the
SAME md5-nibble bucket arithmetic as
operators/sampling.portable_hash_bucket (4 hex nibbles → value %
width), per hash-row salt. The TF-IDF score evaluates the shared
template from plans/sketches.py verbatim.
"""

from __future__ import annotations

from mspr2_back_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH
from mspr2_back_spark.plans.pipeline_oracle import PIPELINE_ORACLE_SQL
from mspr2_back_spark.plans.sketches import (
    CMS_TOP,
    EDIT_MAX_DIST,
    EDIT_PREFIX_LEN,
    TFIDF_TOP_PER_DOC,
    WS_BUCKETS,
    WS_MIN_WEIGHT,
    WS_SAMPLE_K,
    tfidf_score_sql,
    ws_key_sql,
)

SKETCH_ORACLE_SQL: dict[str, str] = {}


def _md5_bucket_sql(key_sql: str, salt: str, width: int, nibbles: int = 4) -> str:
    """Nibble-decode of md5(key || '|salt')'s first ``nibbles`` hex
    chars, mod width — character-identical to
    operators/sampling.portable_hash_bucket."""
    h = f"md5(CAST({key_sql} AS VARCHAR) || '|{salt}')"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (nibbles - 1 - i)}"
        for i in range(nibbles)
    )
    return f"(({terms}) % {width})"


def _cms_oracle_sql() -> str:
    build = "\n    UNION ALL\n    ".join(
        f"SELECT {i} AS h,"
        f" {_md5_bucket_sql('user_id', f'cms{i}', CMS_WIDTH)} AS bucket"
        f" FROM events"
        for i in range(CMS_DEPTH)
    )
    probe = "\n    UNION ALL\n    ".join(
        f"SELECT user_id, {i} AS h,"
        f" {_md5_bucket_sql('user_id', f'cms{i}', CMS_WIDTH)} AS bucket"
        f" FROM probes"
        for i in range(CMS_DEPTH)
    )
    return f"""
WITH cells AS (
  SELECT h, bucket, COUNT(*) AS cnt FROM (
    {build}
  ) GROUP BY 1, 2
),
probes AS (SELECT DISTINCT user_id FROM events),
pcells AS (
    {probe}
),
est AS (
  SELECT user_id, MIN(COALESCE(cnt, 0)) AS est_count
  FROM pcells LEFT JOIN cells USING (h, bucket)
  GROUP BY 1
),
exact AS (SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY 1)
SELECT user_id, est_count, exact_count,
       est_count - exact_count AS overcount
FROM est JOIN exact USING (user_id)
ORDER BY est_count DESC, user_id
LIMIT {CMS_TOP}
"""


SKETCH_ORACLE_SQL["cms_heavy_hitters"] = _cms_oracle_sql()

SKETCH_ORACLE_SQL["tfidf_top_terms"] = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfx AS (SELECT word, COUNT(*) AS dfc FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.word AS word, tf, {tfidf_score_sql()} AS tfidf
  FROM tf JOIN dfx ON tf.word = dfx.word, n
),
ranked AS (
  SELECT doc_id, word, tf, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, word) AS INT) AS rank
  FROM scored
)
SELECT doc_id, word, tf, tfidf, rank
FROM ranked WHERE rank <= {TFIDF_TOP_PER_DOC}
ORDER BY doc_id, rank
"""

def _bloom_oracle_sql() -> str:
    from mspr2_back_spark.operators.bloomfilter import BLOOM_BITS, BLOOM_HASHES

    bits_ctes = ",\n".join(
        f"bits{i} AS (SELECT DISTINCT"
        f" {_md5_bucket_sql('key', f'bf{i}', BLOOM_BITS)} AS pos FROM risk)"
        for i in range(BLOOM_HASHES)
    )
    pass_expr = " AND ".join(
        f"b{i}.pos IS NOT NULL" for i in range(BLOOM_HASHES)
    )
    probe_joins = "\n  ".join(
        f"LEFT JOIN bits{i} b{i}"
        f" ON {_md5_bucket_sql('p.key', f'bf{i}', BLOOM_BITS)} = b{i}.pos"
        for i in range(BLOOM_HASHES)
    )
    return f"""
WITH risk AS (
  SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal < 0
),
{bits_ctes},
probe AS (SELECT o_custkey AS key FROM orders),
flags AS (
  SELECT p.key,
         ({pass_expr}) AS pass_bloom,
         (r.key IS NOT NULL) AS is_true
  FROM probe p
  {probe_joins}
  LEFT JOIN risk r ON p.key = r.key
),
a AS (
  SELECT COUNT(*) AS n_probe,
         CAST(SUM(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass_bloom,
         CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true_match,
         CAST(SUM(CASE WHEN pass_bloom AND NOT is_true THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_positive
  FROM flags
)
SELECT n_probe, n_pass_bloom, n_true_match, n_false_positive,
       ROUND(CAST(n_false_positive AS DOUBLE)
             / NULLIF(CAST(n_probe - n_true_match AS DOUBLE), 0),
             6) AS fp_rate
FROM a
"""


SKETCH_ORACLE_SQL["bloom_prefilter_audit"] = _bloom_oracle_sql()

SKETCH_ORACLE_SQL["dedup_edit_distance"] = f"""
WITH b AS (
  SELECT doc_id, text, length(text) AS tlen,
         md5(substring(text, 1, {EDIT_PREFIX_LEN})) AS pbucket
  FROM documents
)
SELECT a.doc_id AS doc_id_1, c.doc_id AS doc_id_2,
       levenshtein(a.text, c.text) AS edit_dist
FROM b a JOIN b c
  ON a.pbucket = c.pbucket AND a.doc_id < c.doc_id
WHERE abs(a.tlen - c.tlen) <= {EDIT_MAX_DIST}
  AND levenshtein(a.text, c.text) <= {EDIT_MAX_DIST}
ORDER BY 1, 2
"""


def _ws_oracle_sql() -> str:
    bucket = _md5_bucket_sql("d.doc_id", "ws", WS_BUCKETS)
    return f"""
WITH tq AS (SELECT * FROM ({PIPELINE_ORACLE_SQL["text_quality"]})),
scored AS (
  SELECT d.doc_id AS doc_id, d.source,
         tq.quality_score AS quality_score,
         (CAST({bucket} AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / CAST({WS_BUCKETS} AS DOUBLE) AS u,
         GREATEST(tq.quality_score, CAST({WS_MIN_WEIGHT} AS DOUBLE)) AS w
  FROM documents d JOIN tq ON d.doc_id = tq.doc_id
)
SELECT doc_id, source, quality_score,
       ROUND({ws_key_sql()}, 6) AS sample_key
FROM scored
ORDER BY ROUND({ws_key_sql()}, 6) DESC, doc_id
LIMIT {WS_SAMPLE_K}
"""


SKETCH_ORACLE_SQL["weighted_sample_fixed_k"] = _ws_oracle_sql()


def _surprisal_oracle_sql() -> str:
    from mspr2_back_spark.plans.sketches import surprisal_term_sql

    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
  FROM documents
),
vocab AS (SELECT word, COUNT(*) AS c FROM toks GROUP BY 1),
totals AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM vocab),
scored AS (
  SELECT t.doc_id, {surprisal_term_sql()} AS s
  FROM toks t JOIN vocab v ON t.word = v.word, totals
)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_surprisal
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


SKETCH_ORACLE_SQL["unigram_surprisal"] = _surprisal_oracle_sql()


def _bigram_surprisal_oracle_sql() -> str:
    """Mirror of plans/sketches.bigram_surprisal: the head column is
    recovered as the first token of the bigram string (tokens are
    space-split, so they contain no spaces), and the per-bigram term
    evaluates the SAME shared template (rounded pre-sum) so the
    decimal per-document sums are engine-identical."""
    from mspr2_back_spark.plans.sketches import bigram_term_sql

    return f"""
WITH dw AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
),
vv AS (
  SELECT COUNT(DISTINCT word) AS v
  FROM (SELECT unnest(w) AS word FROM dw)
),
pr AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 1),
                i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM dw WHERE len(w) >= 2
),
pr2 AS (SELECT doc_id, string_split(bigram, ' ')[1] AS head, bigram FROM pr),
cbt AS (SELECT bigram, COUNT(*) AS cb FROM pr2 GROUP BY 1),
cht AS (SELECT head, COUNT(*) AS ch FROM pr2 GROUP BY 1),
scored AS (
  SELECT p.doc_id, {bigram_term_sql()} AS s
  FROM pr2 p JOIN cbt USING (bigram) JOIN cht USING (head), vv
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_surprisal,
       ROUND(exp(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)), 6)
         AS perplexity
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


SKETCH_ORACLE_SQL["bigram_surprisal"] = _bigram_surprisal_oracle_sql()


def _datacard_oracle_sql() -> str:
    tq = PIPELINE_ORACLE_SQL["text_quality"]
    pl = PIPELINE_ORACLE_SQL["text_lang_id"]
    return f"""
WITH tq AS (SELECT * FROM ({tq})),
pl AS (SELECT * FROM ({pl})),
feats AS (
  SELECT d.source, d.doc_id, tq.n_words AS n_tokens,
         tq.quality_score AS q, pl.predicted_lang AS plang,
         md5(substring(d.text, 1, {EDIT_PREFIX_LEN})) AS h
  FROM documents d
  JOIN tq ON d.doc_id = tq.doc_id
  JOIN pl ON d.doc_id = pl.doc_id
),
base AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         ROUND(CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
           AS mean_quality
  FROM feats GROUP BY 1
),
ranked AS (
  SELECT source, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM feats
),
med AS (
  SELECT source,
         CAST(MIN(CASE WHEN rn >= CEIL(0.50 * n) THEN n_tokens END)
              AS BIGINT) AS median_tokens
  FROM ranked GROUP BY 1
),
copies AS (
  SELECT source, COUNT(*) OVER (PARTITION BY h) AS copies FROM feats
),
dup AS (
  SELECT source, COUNT(*) AS n_dup_docs FROM copies
  WHERE copies > 1 GROUP BY 1
),
lc AS (SELECT source, plang, COUNT(*) AS cl FROM feats GROUP BY 1, 2),
top AS (
  SELECT source, plang AS top_lang, cl FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY cl DESC, plang) AS rk
    FROM lc
  ) WHERE rk = 1
)
SELECT b.source, n_docs, total_tokens, mean_quality, median_tokens,
       ROUND(CAST(COALESCE(n_dup_docs, 0) AS DOUBLE) / n_docs, 6)
         AS dup_candidate_rate,
       top_lang,
       ROUND(CAST(cl AS DOUBLE) / n_docs, 6) AS top_lang_share
FROM base b
JOIN med USING (source)
JOIN top USING (source)
LEFT JOIN dup USING (source)
ORDER BY b.source
"""


SKETCH_ORACLE_SQL["corpus_datacard"] = _datacard_oracle_sql()


def _hll_oracle_sql(with_exact: bool = True) -> str:
    """Register-for-register HLL twin: the same md5-nibble register
    pick and leading-zero rho as plans/sketches.hll_distinct_users,
    the same exact-integer register fold, and the SAME estimate
    template string (hll_estimate_sql) verbatim. ``with_exact=False``
    drops the COUNT(DISTINCT) companion — the oracle for the
    registered 100 TB sketch-only shape (r9, VERDICT r8 task 3)."""
    from mspr2_back_spark.plans.sketches import (
        HLL_M,
        HLL_RHO_MAX,
        HLL_SCALE,
        HLL_SUFFIX_NIBBLES,
        hll_estimate_sql,
    )

    nv = "(strpos('0123456789abcdef', substring(sfx, lz + 1, 1)) - 1)"
    ex_cte = (
        """, ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)"""
        if with_exact
        else ""
    )
    ex_col = " ex.exact_users," if with_exact else ""
    ex_join = (
        " JOIN ex ON agg.event_type = ex.event_type" if with_exact else ""
    )
    return f"""
WITH h AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events WHERE user_id IS NOT NULL
),
nib AS (
  SELECT event_type,
         (strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) AS reg,
         substring(h, 3, {HLL_SUFFIX_NIBBLES}) AS sfx
  FROM h
),
lzc AS (
  SELECT event_type, reg, sfx,
         length(regexp_extract(sfx, '^(0*)', 1)) AS lz
  FROM nib
),
rho AS (
  SELECT event_type, reg,
         CASE WHEN lz >= {HLL_SUFFIX_NIBBLES} THEN {HLL_RHO_MAX}
              ELSE lz * 4 + (CASE WHEN {nv} >= 8 THEN 0
                                  WHEN {nv} >= 4 THEN 1
                                  WHEN {nv} >= 2 THEN 2
                                  ELSE 3 END) + 1 END AS rho
  FROM lzc
),
regs AS (SELECT event_type, reg, MAX(rho) AS mj FROM rho GROUP BY 1, 2),
agg AS (
  SELECT event_type,
         CAST({HLL_M} - COUNT(*) AS INT) AS zero_regs,
         CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - mj))
              + ({HLL_M} - COUNT(*)) * CAST({HLL_SCALE} AS BIGINT)
              AS BIGINT) AS sum_scaled
  FROM regs GROUP BY 1
){ex_cte}
SELECT agg.event_type,{ex_col}
       agg.zero_regs, agg.sum_scaled,
       {hll_estimate_sql()} AS hll_estimate
FROM agg{ex_join}
ORDER BY agg.event_type
"""


SKETCH_ORACLE_SQL["hll_distinct_users"] = _hll_oracle_sql()
SKETCH_ORACLE_SQL["hll_distinct_users_sketch_only"] = _hll_oracle_sql(
    with_exact=False
)
