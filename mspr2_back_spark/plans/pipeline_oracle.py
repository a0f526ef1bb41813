"""DuckDB oracles for the pipeline queries.

Several statements are program-generated so the md5-nibble hash logic
is character-identical to the Spark expressions (SimHash bits,
LSH hyperplane signs). List folds use ``list_reduce`` (left fold) to
match Spark's ``aggregate`` summation order bit-for-bit.
"""

from __future__ import annotations

from mspr2_back_spark.plans.pipeline_queries import (
    COSINE_PAIR_THRESHOLD,
    EMB_CELL_PLANES,
    EMB_LSH_BANDS,
    EMB_LSH_PLANES,
    MINHASH_THRESHOLD,
    NGRAM_JACCARD_THRESHOLD,
    TOKEN_BUDGET_PER_SOURCE,
)

PIPELINE_ORACLE_SQL: dict[str, str] = {}

_WORDS_CTE = """
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
)
"""

_SHINGLE_PAIRS = (
    _WORDS_CTE
    + """
, sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) >= 3 THEN
           list_transform(generate_series(1, len(w) - 2),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE [array_to_string(w, ' ')] END) AS shingles
  FROM words
),
ex AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         COUNT(*) AS shared, ANY_VALUE(a.n) AS n1, ANY_VALUE(b.n) AS n2
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_1, doc_id_2, jaccard FROM (
  SELECT doc_id_1, doc_id_2,
         CAST(shared AS DOUBLE) / (n1 + n2 - shared) AS jaccard
  FROM pairs
) WHERE jaccard >= {threshold}
"""
)

PIPELINE_ORACLE_SQL["dedup_exact"] = """
SELECT md5(text) AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_id
FROM documents
GROUP BY 1
"""

PIPELINE_ORACLE_SQL["dedup_ngram_jaccard"] = _SHINGLE_PAIRS.format(
    threshold=NGRAM_JACCARD_THRESHOLD
)

# MinHash+LSH with 32 bands x 2 rows has recall 1-2e-13 at j>=0.8, and
# the Spark side verifies candidates with exact Jaccard — so the exact
# thresholded pair set IS the expected output.
PIPELINE_ORACLE_SQL["dedup_minhash_lsh"] = _SHINGLE_PAIRS.format(
    threshold=MINHASH_THRESHOLD
)

_HEX = "'0123456789abcdef'"

_SIMHASH_BITSUM = (
    "list_sum(list_transform(dw, t -> CASE WHEN strpos({hex}, substring(md5(t), i + 1, 1)) - 1 >= 8 "
    "THEN 1 ELSE -1 END))"
).format(hex=_HEX)

PIPELINE_ORACLE_SQL["dedup_simhash"] = (
    _WORDS_CTE
    + """
, dwords AS (SELECT doc_id, list_distinct(w) AS dw FROM words)
SELECT doc_id,
       CAST(list_sum(list_transform(generate_series(0, 15),
            i -> CASE WHEN {bitsum} > 0 THEN 1 << i ELSE 0 END)) AS INT) AS simhash
FROM dwords
""".format(bitsum=_SIMHASH_BITSUM)
)

_NORM_CTE = """
WITH v AS (
  SELECT vec_id, label, embedding,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
  FROM embeddings
)
"""

_PAIR_DOT = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y)"
)

PIPELINE_ORACLE_SQL["dedup_embedding_cosine"] = (
    _NORM_CTE
    + """
SELECT vec_id_1, vec_id_2, cosine_sim FROM (
  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         ROUND({dot} / (a.nrm * b.nrm), 6) AS cosine_sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id
) WHERE cosine_sim >= {threshold}
""".format(dot=_PAIR_DOT, threshold=COSINE_PAIR_THRESHOLD)
)

_Q_DOT = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST(v.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), (x, y) -> x + y)"
)

PIPELINE_ORACLE_SQL["ann_topk"] = (
    _NORM_CTE
    + """
, q AS (SELECT embedding, nrm FROM v WHERE vec_id = 0)
SELECT v.vec_id, v.label, ROUND({dot} / (v.nrm * q.nrm), 6) AS cosine_sim
FROM v, q
WHERE v.vec_id <> 0
ORDER BY cosine_sim DESC, v.vec_id ASC
LIMIT 10
""".format(dot=_Q_DOT)
)


def _hyperplane_sign_sql(plane: int, vec: str = "embedding") -> str:
    """±1-hyperplane projection sign — mirrors similarity._hyperplane_sign
    (plane component i is +1 iff md5('{p}_{i}') first nibble >= 8)."""
    proj = (
        f"list_reduce(list_transform(generate_series(1, 64), i -> "
        f"CASE WHEN strpos({_HEX}, substring(md5('{plane}_' || (i - 1)), 1, 1)) - 1 >= 8 "
        f"THEN CAST({vec}[i] AS DOUBLE) ELSE -CAST({vec}[i] AS DOUBLE) END), (x, y) -> x + y)"
    )
    return f"CASE WHEN {proj} > 0 THEN 1 ELSE 0 END"


_BUCKET = " + ".join(f"({_hyperplane_sign_sql(p)} * {1 << p})" for p in range(8))

PIPELINE_ORACLE_SQL["ann_lsh_topk"] = (
    _NORM_CTE
    + """
, vb AS (SELECT vec_id, label, embedding, nrm, CAST({bucket} AS INT) AS bucket FROM v),
q AS (SELECT embedding, nrm, bucket FROM vb WHERE vec_id = 0)
SELECT v.vec_id, v.bucket, ROUND({dot} / (v.nrm * q.nrm), 6) AS cosine_sim
FROM vb v, q
WHERE v.vec_id <> 0 AND v.bucket = q.bucket
ORDER BY cosine_sim DESC, v.vec_id ASC
LIMIT 5
""".format(bucket=_BUCKET, dot=_Q_DOT)
)

_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "los", "y", "las"),
}


def _score(lang: str) -> str:
    members = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"len(list_filter(w, t -> t IN ({members})))"


def _lang_case(min_ratio: float = 0.02) -> str:
    branches = []
    for lang in _MARKERS:
        others = ", ".join(_score(o) for o in _MARKERS if o != lang)
        branches.append(
            f"WHEN {_score(lang)} >= greatest({others}) "
            f"AND CAST({_score(lang)} AS DOUBLE) / len(w) >= {min_ratio} THEN '{lang}'"
        )
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


PIPELINE_ORACLE_SQL["text_lang_id"] = (
    _WORDS_CTE.replace("SELECT doc_id,", "SELECT doc_id, lang,")
    + f"""
SELECT doc_id, lang AS labeled_lang, {_lang_case()} AS predicted_lang
FROM words
"""
)

PIPELINE_ORACLE_SQL["text_quality"] = (
    _WORDS_CTE.replace("SELECT doc_id,", "SELECT doc_id, length(text) AS n_chars,")
    + f"""
SELECT doc_id,
       len(w) AS n_words,
       ROUND(CAST(n_chars - (len(w) - 1) AS DOUBLE) / len(w), 6) AS avg_word_len,
       ROUND(CAST({_score("en")} AS DOUBLE) / len(w), 6) AS stopword_ratio,
       ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6) AS type_token_ratio,
       ROUND(least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.4
             + least(CAST({_score("en")} AS DOUBLE) / len(w) * 10.0, 1.0) * 0.3
             + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.3, 6) AS quality_score
FROM words
"""
)

PIPELINE_ORACLE_SQL["text_token_stats"] = (
    _WORDS_CTE.replace("SELECT doc_id,", "SELECT doc_id, text,")
    + r"""
SELECT doc_id,
       len(w) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens,
       CAST(length(text) AS INT) AS n_chars_measured
FROM words
"""
)

PIPELINE_ORACLE_SQL["text_fingerprints"] = (
    _WORDS_CTE.replace("SELECT doc_id,", "SELECT doc_id, text,")
    + r"""
SELECT doc_id,
       md5(text) AS content_hash,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS normalized_hash,
       md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS bag_hash
FROM words
"""
)

PIPELINE_ORACLE_SQL["multimodal_meta"] = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(ascii(substring(text, 1, 1)) AS INT) AS first_byte,
       CAST(64 + (ascii(substring(text, 1, 1)) % 32) AS INT) AS width,
       CAST(64 + (ascii(substring(text, 2, 1)) % 32) AS INT) AS height,
       'fake/deterministic' AS format
FROM documents
"""

# multimodal_frames: intentionally no oracle — md5 over blob slices is
# not expressible in the oracle dialect; the driver records rows-only.


# --- round 2: corpus-curation additions ---------------------------------

# Connected components via transitive closure (the oracle can afford
# closure at sf scale; the engine runs label propagation instead).
PIPELINE_ORACLE_SQL["dedup_clusters"] = (
    "WITH RECURSIVE pairs AS (\n"
    "  SELECT doc_id_1, doc_id_2 FROM (\n"
    + PIPELINE_ORACLE_SQL["dedup_minhash_lsh"]
    + "  )\n"
    "),\n"
    "edges AS (\n"
    "  SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs\n"
    "  UNION SELECT doc_id_2, doc_id_1 FROM pairs\n"
    "),\n"
    "reach AS (\n"
    "  SELECT src, dst FROM edges\n"
    "  UNION\n"
    "  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src\n"
    "),\n"
    "lab AS (SELECT src AS node, LEAST(src, MIN(dst)) AS cluster FROM reach GROUP BY src)\n"
    "SELECT node AS doc_id, cluster AS cluster_id,\n"
    "       COUNT(*) OVER (PARTITION BY cluster) AS cluster_size\n"
    "FROM lab\n"
)

# leakage_safe_splits: the dedup_clusters component labels (LEFT
# join so singletons label themselves), then the SAME md5-nibble
# bucket arithmetic as the Spark side (first 4 nibbles mod 20 →
# 18/1/1 train/val/test) on the cluster label — a pure function of
# the label, so the no-cluster-spans-splits invariant holds in the
# oracle by the same construction.
PIPELINE_ORACLE_SQL["leakage_safe_splits"] = (
    PIPELINE_ORACLE_SQL["dedup_clusters"].replace(
        "SELECT node AS doc_id, cluster AS cluster_id,\n"
        "       COUNT(*) OVER (PARTITION BY cluster) AS cluster_size\n"
        "FROM lab\n",
        "",
    )
    + """,
assigned AS (
  SELECT d.doc_id,
         COALESCE(lab.cluster, d.doc_id) AS cluster_id,
         d.text
  FROM documents d LEFT JOIN lab ON d.doc_id = lab.node
),
bk AS (
  SELECT doc_id, cluster_id, text,
         ((strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 4, 1)) - 1)) % 20
           AS bucket
  FROM assigned
)
SELECT doc_id, cluster_id,
       CASE WHEN bucket < 18 THEN 'train'
            WHEN bucket = 18 THEN 'val'
            ELSE 'test' END AS split,
       CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
            AS INT) AS n_tokens
FROM bk
ORDER BY doc_id
"""
)

# dedup_keep_best: the same transitive-closure labels, joined to the
# text_quality blended score, then one window per cluster ranks
# members (quality DESC, doc_id ASC) — rank 1 is the kept survivor
# and FIRST_VALUE over the full frame is every member's canonical id.
PIPELINE_ORACLE_SQL["dedup_keep_best"] = (
    PIPELINE_ORACLE_SQL["dedup_clusters"].replace(
        "SELECT node AS doc_id, cluster AS cluster_id,\n"
        "       COUNT(*) OVER (PARTITION BY cluster) AS cluster_size\n"
        "FROM lab\n",
        "",
    )
    + f""",
qsc AS (
  SELECT doc_id,
         ROUND(least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.4
               + least(CAST({_score("en")} AS DOUBLE) / len(w) * 10.0, 1.0) * 0.3
               + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.3, 6)
           AS quality_score
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS w
        FROM documents)
),
member AS (
  SELECT lab.node AS doc_id, lab.cluster AS cluster_id, q.quality_score
  FROM lab JOIN qsc q ON lab.node = q.doc_id
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       quality_score,
       (ROW_NUMBER() OVER (PARTITION BY cluster_id
            ORDER BY quality_score DESC, doc_id ASC) = 1) AS kept,
       FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
            ORDER BY quality_score DESC, doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS canonical_id
FROM member
ORDER BY doc_id
"""
)

# split_contamination_audit: the same closure + split chain, then the
# standard distinct-3-gram shingle CTEs carrying the split label, a
# per-shingle in-train verdict (MAX over the flag — the oracle's form
# of the Spark side's partial-agg'ed verdict), and the per-doc /
# per-split folds.
PIPELINE_ORACLE_SQL["split_contamination_audit"] = (
    PIPELINE_ORACLE_SQL["dedup_clusters"].replace(
        "SELECT node AS doc_id, cluster AS cluster_id,\n"
        "       COUNT(*) OVER (PARTITION BY cluster) AS cluster_size\n"
        "FROM lab\n",
        "",
    )
    + """,
assigned2 AS (
  SELECT d.doc_id,
         COALESCE(lab.cluster, d.doc_id) AS cluster_id,
         d.text
  FROM documents d LEFT JOIN lab ON d.doc_id = lab.node
),
sp AS (
  SELECT doc_id, text,
         CASE WHEN b < 18 THEN 'train'
              WHEN b = 18 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id, text,
           ((strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 4, 1)) - 1)) % 20
             AS b
    FROM assigned2
  )
),
w2 AS (
  SELECT doc_id, split,
         list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM sp
),
sh2 AS (
  SELECT doc_id, split,
         list_distinct(CASE WHEN len(w) >= 3 THEN
           list_transform(generate_series(1, len(w) - 2),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE [array_to_string(w, ' ')] END) AS shingles
  FROM w2
),
ex2 AS (SELECT doc_id, split, unnest(shingles) AS s FROM sh2),
verdict AS (
  SELECT s, MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train
  FROM ex2 GROUP BY s
),
per_doc AS (
  SELECT e.split, e.doc_id,
         COUNT(*) AS n_spans,
         SUM(v.in_train) AS n_shared
  FROM ex2 e JOIN verdict v ON e.s = v.s
  WHERE e.split <> 'train'
  GROUP BY e.split, e.doc_id
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaking_docs,
       ROUND(AVG(CAST(n_shared AS DOUBLE) / n_spans), 6)
         AS mean_span_overlap
FROM per_doc GROUP BY split ORDER BY split
"""
)

_EX_CTE = """
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) >= 3 THEN
           list_transform(generate_series(1, len(w) - 2),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE [array_to_string(w, ' ')] END) AS shingles
  FROM words
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh)
"""

PIPELINE_ORACLE_SQL["repeated_spans"] = (
    _EX_CTE
    + """
, shared AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) > 1),
totals AS (SELECT doc_id, COUNT(*) AS n_spans FROM ex GROUP BY doc_id),
rep AS (
  SELECT doc_id, COUNT(*) AS n_repeated FROM ex
  WHERE s IN (SELECT s FROM shared) GROUP BY doc_id
)
SELECT t.doc_id, t.n_spans,
       COALESCE(r.n_repeated, 0) AS n_repeated,
       ROUND(CAST(COALESCE(r.n_repeated, 0) AS DOUBLE) / t.n_spans, 6)
           AS repeated_ratio
FROM totals t LEFT JOIN rep r USING (doc_id)
"""
)

PIPELINE_ORACLE_SQL["contamination_screen"] = (
    _EX_CTE
    + """
, bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 50 = 0),
cand AS (SELECT * FROM ex WHERE doc_id % 50 <> 0),
totals AS (SELECT doc_id, COUNT(*) AS n_spans FROM cand GROUP BY doc_id),
hits AS (
  SELECT doc_id, COUNT(*) AS n_contaminated FROM cand
  WHERE s IN (SELECT s FROM bench) GROUP BY doc_id
)
SELECT t.doc_id, t.n_spans, h.n_contaminated,
       ROUND(CAST(h.n_contaminated AS DOUBLE) / t.n_spans, 6) AS contamination
FROM totals t JOIN hits h USING (doc_id)
"""
)

# PII patterns: character-identical to functions/pii.py (the portable
# Java-regex/RE2 subset); redaction order email -> phone -> ip and the
# 'g' flag mirror Spark's replace-all semantics.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"
_PII_IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
_PII_REDACTED = (
    "regexp_replace(regexp_replace(regexp_replace(text, '"
    + _PII_EMAIL + "', '[EMAIL]', 'g'), '"
    + _PII_PHONE + "', '[PHONE]', 'g'), '"
    + _PII_IPV4 + "', '[IP]', 'g')"
)

PIPELINE_ORACLE_SQL["pii_scrub"] = (
    """
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
         AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '""" + _PII_EMAIL + """')) AS n_email,
       len(regexp_extract_all(text, '""" + _PII_PHONE + """')) AS n_phone,
       len(regexp_extract_all(text, '""" + _PII_IPV4 + """')) AS n_ipv4,
       md5(""" + _PII_REDACTED + """) AS redacted_hash,
       length(""" + _PII_REDACTED + """) AS redacted_len
FROM injected
"""
)


PIPELINE_ORACLE_SQL["dedup_incremental"] = (
    _WORDS_CTE
    + """
, sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) >= 3 THEN
           list_transform(generate_series(1, len(w) - 2),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE [array_to_string(w, ' ')] END) AS shingles
  FROM words
),
exn AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
pairs AS (
  SELECT a.doc_id AS corpus_doc_id, b.doc_id AS batch_doc_id,
         COUNT(*) AS shared, ANY_VALUE(a.n) AS n1, ANY_VALUE(b.n) AS n2
  FROM exn a JOIN exn b
    ON a.s = b.s AND a.doc_id % 10 <> 7 AND b.doc_id % 10 = 7
  GROUP BY 1, 2
)
SELECT corpus_doc_id, batch_doc_id, jaccard FROM (
  SELECT corpus_doc_id, batch_doc_id,
         CAST(shared AS DOUBLE) / (n1 + n2 - shared) AS jaccard
  FROM pairs
) WHERE jaccard >= {threshold}
""".format(threshold=NGRAM_JACCARD_THRESHOLD)
)

# Engine-portable md5 bucket: first 4 hex nibbles of
# md5(key || '|mix') — character-identical to
# operators/sampling.py::portable_hash_bucket.
_NIB = "(strpos('0123456789abcdef', substring(h, {i}, 1)) - 1)"
_MD5_BUCKET = (
    _NIB.format(i=1) + " * 4096 + " + _NIB.format(i=2) + " * 256 + "
    + _NIB.format(i=3) + " * 16 + " + _NIB.format(i=4)
)

PIPELINE_ORACLE_SQL["source_mixture_sample"] = """
WITH hashed AS (
  SELECT source, md5(CAST(doc_id AS VARCHAR) || '|mix') AS h FROM documents
),
rated AS (
  SELECT source, {bucket} AS bucket,
         CASE WHEN TRY_CAST(substring(source, 4) AS INT) < 5 THEN 1.0
              WHEN TRY_CAST(substring(source, 4) AS INT) < 10 THEN 0.5
              WHEN TRY_CAST(substring(source, 4) AS INT) < 15 THEN 0.25
              ELSE 0.1 END AS rate
  FROM hashed
),
kept AS (
  SELECT source, COUNT(*) AS n_kept FROM rated
  WHERE bucket < CAST(FLOOR(rate * 65536) AS INT) GROUP BY source
),
totals AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source)
SELECT t.source, t.n_total,
       COALESCE(k.n_kept, 0) AS n_kept,
       ROUND(CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / t.n_total, 6) AS kept_ratio
FROM totals t LEFT JOIN kept k USING (source)
""".format(bucket=_MD5_BUCKET)

PIPELINE_ORACLE_SQL["quality_filter"] = (
    "WITH q AS (SELECT * FROM (" + PIPELINE_ORACLE_SQL["text_quality"] + ")),\n"
    "t AS (SELECT * FROM (" + PIPELINE_ORACLE_SQL["text_token_stats"] + ")),\n"
    "l AS (SELECT * FROM (" + PIPELINE_ORACLE_SQL["text_lang_id"] + ")),\n"
    "k AS (SELECT md5(COALESCE(text, '')) AS ch, MIN(doc_id) AS keeper_id FROM documents GROUP BY 1),\n"
    "h AS (SELECT doc_id, md5(COALESCE(text, '')) AS ch FROM documents),\n"
    "dup AS (SELECT h.doc_id, (h.doc_id <> k.keeper_id) AS is_dup FROM h JOIN k USING (ch))\n"
    "SELECT q.doc_id, q.quality_score, t.n_ws_tokens,\n"
    "       CASE WHEN dup.is_dup THEN 'duplicate'\n"
    "            WHEN t.n_ws_tokens < 25 THEN 'too_short'\n"
    "            WHEN t.n_ws_tokens > 90 THEN 'too_long'\n"
    "            WHEN q.quality_score < 0.55 THEN 'low_quality'\n"
    "            WHEN l.predicted_lang <> l.labeled_lang THEN 'lang_mismatch'\n"
    "            ELSE 'keep' END AS verdict\n"
    "FROM q JOIN t USING (doc_id) JOIN l USING (doc_id) JOIN dup USING (doc_id)\n"
)

# Reuse the registered SimHash oracle verbatim: one definition, so
# dedup_simhash and dedup_gate can never silently diverge.
_SIMHASH_SQL = PIPELINE_ORACLE_SQL["dedup_simhash"]

PIPELINE_ORACLE_SQL["dedup_gate"] = (
    "WITH fp AS (SELECT * FROM ("
    + _SIMHASH_SQL
    + """))
, corpus AS (
  SELECT simhash, COUNT(*) AS matches_corpus FROM fp
  WHERE doc_id % 2 = 0 GROUP BY simhash
)
SELECT b.doc_id, b.simhash,
       COALESCE(c.matches_corpus, 0) AS matches_corpus
FROM fp b LEFT JOIN corpus c USING (simhash)
WHERE b.doc_id % 2 = 1
"""
)


# Frame sampling: byte-offset arithmetic mirrored in SQL. This build
# of the oracle engine has no BLOB substring/md5, so the slice is
# taken on the VARCHAR — byte-identical to the Spark side because the
# corpus is pure ASCII (octet_length == length; asserted by the
# parity run itself: any multibyte text would hash-diverge loudly).
PIPELINE_ORACLE_SQL["multimodal_frames"] = """
WITH f AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
),
idx AS (SELECT unnest(generate_series(0, 3)) AS frame_idx),
framed AS (
  SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
         CAST(LEAST(frame_idx * GREATEST(n // 4, 1),
                    GREATEST(n - 1, 0)) AS INT) AS frame_offset,
         CAST(GREATEST(n // 4, 1) AS INT) AS step
  FROM f, idx
)
SELECT fr.doc_id, fr.frame_idx, fr.frame_offset,
       md5(substring(f.text, fr.frame_offset + 1, fr.step)) AS frame_hash
FROM framed fr JOIN f ON fr.doc_id = f.doc_id
"""


# Corpus after dedup: reuse the cluster-closure oracle; losers are
# cluster members that are not their cluster's min-id representative.
PIPELINE_ORACLE_SQL["dedup_corpus_summary"] = (
    "WITH clusters AS (SELECT * FROM ("
    + PIPELINE_ORACLE_SQL["dedup_clusters"]
    + """)),
losers AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
kept AS (
  SELECT d.source FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
),
totals AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
kc AS (SELECT source, COUNT(*) AS n_kept FROM kept GROUP BY source)
SELECT t.source, t.n_docs,
       COALESCE(kc.n_kept, 0) AS n_kept,
       ROUND(CAST(COALESCE(kc.n_kept, 0) AS DOUBLE) / t.n_docs, 6) AS kept_ratio
FROM totals t LEFT JOIN kc USING (source)
"""
)



# Per-source token-budget curation: whole-md5-bucket selection in
# bucket order while the cumulative token count fits the budget —
# bucket expression character-identical to portable_hash_bucket
# (n_buckets = 65536, so the full 4-nibble value IS the bucket).
PIPELINE_ORACLE_SQL["token_budget_sample"] = """
WITH toks AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
              AS INT) AS n_tokens,
         CAST({bucket} AS INT) AS bucket
  FROM (
    SELECT source, doc_id, text,
           md5(CAST(doc_id AS VARCHAR) || '|budget') AS h
    FROM documents
  )
),
hist AS (
  SELECT source, bucket, CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
  FROM toks GROUP BY source, bucket
),
cum AS (
  SELECT source, bucket,
         SUM(bucket_tokens) OVER (PARTITION BY source ORDER BY bucket)
           AS cum_tokens
  FROM hist
),
cutoffs AS (
  SELECT source, MAX(bucket) AS cutoff_bucket
  FROM cum WHERE cum_tokens <= {budget} GROUP BY source
)
SELECT t.source, t.doc_id, t.n_tokens, t.bucket
FROM toks t JOIN cutoffs c ON t.source = c.source
WHERE t.bucket <= c.cutoff_bucket
""".format(bucket=_MD5_BUCKET, budget=TOKEN_BUDGET_PER_SOURCE)


# Bucketed embedding near-dup: banded sign-LSH candidates (bands of
# EMB_LSH_PLANES // EMB_LSH_BANDS md5-derived planes — same sign
# rule as ann_lsh_topk's _BUCKET) + exact fold-order cosine verify.
# Band geometry and threshold are formatted from the SAME constants
# the registered query passes to similarity.lsh_cosine_pairs.
_LSH_ROWS = EMB_LSH_PLANES // EMB_LSH_BANDS


def _band_bucket_sql(band: int, rows: int = _LSH_ROWS, vec: str = "embedding") -> str:
    return " + ".join(
        f"({_hyperplane_sign_sql(band * rows + r, vec)} * {1 << r})"
        for r in range(rows)
    )


PIPELINE_ORACLE_SQL["dedup_embedding_lsh"] = """
WITH conf AS (
  -- mirrors the Spark side's scan-side conformance filter (r17):
  -- NULL / wrong-dim / empty embeddings are excluded before banding
  -- on BOTH engines, so dirty-corpus parity holds; clean-data
  -- results are unchanged (every clean row conforms)
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
sb AS (
  SELECT vec_id,
         {band_cols}
  FROM conf
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2
  FROM sb a JOIN sb b
    ON a.vec_id < b.vec_id
   AND ({band_match})
),
nv AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
              (x, y) -> x + y)) AS nrm
  FROM conf
)
SELECT c.vec_id_1, c.vec_id_2,
       ROUND({dot} / (v1.nrm * v2.nrm), 6) AS cosine_sim
FROM cand c
JOIN nv v1 ON c.vec_id_1 = v1.vec_id
JOIN nv v2 ON c.vec_id_2 = v2.vec_id
WHERE ROUND({dot} / (v1.nrm * v2.nrm), 6) >= {threshold}
""".format(
    band_cols=",\n         ".join(
        f"CAST({_band_bucket_sql(b)} AS INT) AS b{b}"
        for b in range(EMB_LSH_BANDS)
    ),
    band_match=" OR ".join(f"a.b{b} = b.b{b}" for b in range(EMB_LSH_BANDS)),
    threshold=COSINE_PAIR_THRESHOLD,
    dot=(
        "list_reduce(list_transform(generate_series(1, 64), i -> "
        "CAST(v1.embedding[i] AS DOUBLE) * CAST(v2.embedding[i] AS DOUBLE)), "
        "(x, y) -> x + y)"
    ),
)


# Cell-bucketed exact pairs: EMB_CELL_PLANES-plane hyperplane cells
# (same sign rule as _BUCKET), exact cosine over the Hamming-1
# multi-probe candidate set — a pair is a candidate iff its cells'
# sign distance is ≤ 2 (each side replicates to its cell plus all
# Hamming-1 probes; the balls intersect exactly when
# bit_count(xor) ≤ 2). Plane count and threshold from the same
# constants as the registered query.
_CELL4 = " + ".join(
    f"({_hyperplane_sign_sql(p)} * {1 << p})" for p in range(EMB_CELL_PLANES)
)
PIPELINE_ORACLE_SQL["dedup_embedding_cells"] = (
    _NORM_CTE
    + """
, vc AS (SELECT vec_id, embedding, nrm, CAST({cell} AS INT) AS cell FROM v)
SELECT vec_id_1, vec_id_2, cosine_sim FROM (
  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         ROUND({dot} / (a.nrm * b.nrm), 6) AS cosine_sim
  FROM vc a JOIN vc b
    ON bit_count(xor(a.cell, b.cell)) <= 2 AND a.vec_id < b.vec_id
) WHERE cosine_sim >= {threshold}
""".format(cell=_CELL4, dot=_PAIR_DOT, threshold=COSINE_PAIR_THRESHOLD)
)


# Exact-fingerprint dup buckets over the simhash table.
PIPELINE_ORACLE_SQL["simhash_bucket_stats"] = (
    "WITH fp AS (SELECT * FROM ("
    + _SIMHASH_SQL
    + """))
SELECT simhash, COUNT(*) AS bucket_size, MIN(doc_id) AS min_doc_id
FROM fp GROUP BY simhash
"""
)


# SimHash Hamming-ball degree: the oracle takes the O(N^2)
# inequality join (cheap at oracle scale) over the same fingerprint
# CTE; the Spark side's banded candidates are COMPLETE for
# hamming <= 2 by pigeonhole, so both sides aggregate the identical
# pair set.
PIPELINE_ORACLE_SQL["simhash_near_degree"] = (
    "WITH fp AS (SELECT * FROM ("
    + _SIMHASH_SQL
    + """)),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
),
sym AS (
  SELECT d1 AS doc_id, hamming FROM pairs
  UNION ALL
  SELECT d2 AS doc_id, hamming FROM pairs
)
SELECT doc_id, COUNT(*) AS n_near, CAST(MIN(hamming) AS INT) AS min_hamming
FROM sym GROUP BY doc_id
"""
)

# 64-bit fingerprint CTE: bit i votes by bit (i % 4) of md5 nibble
# (i // 4); bit 63 is the BIGINT sign bit, which DuckDB's << refuses
# to produce (overflow error) — the CASE substitutes the min-BIGINT
# literal, identical to Spark's shiftleft(1L, 63) two's-complement
# value. COALESCE(..., 0) matches Spark's aggregate-with-0-init on
# empty word lists (DuckDB list_sum([]) is NULL).
_SIMHASH64_SQL = (
    _WORDS_CTE
    + """
, dwords AS (SELECT doc_id, list_distinct(w) AS dw FROM words),
nibs AS (SELECT doc_id, list_transform(dw, t -> list_transform(generate_series(0, 15),
         n -> strpos('0123456789abcdef', substring(md5(t), n + 1, 1)) - 1)) AS na FROM dwords)
SELECT doc_id,
  CAST(list_sum(list_transform(generate_series(0, 63), i ->
    CASE WHEN COALESCE(list_sum(list_transform(na, a ->
         CASE WHEN ((a[(i // 4) + 1] >> (i % 4)) & 1) = 1 THEN 1 ELSE -1 END)), 0) > 0
    THEN (CASE WHEN i = 63 THEN (-9223372036854775807 - 1) ELSE (1::BIGINT << CAST(i AS INT)) END)
    ELSE 0 END)) AS BIGINT) AS simhash
FROM nibs
"""
)

# Production-width near-dup degree: same O(N^2) oracle shape as the
# 16-bit query, over the 64-bit fingerprint CTE (xor/bit_count are
# two's-complement on both engines — verified including the sign
# bit).
PIPELINE_ORACLE_SQL["simhash64_near_degree"] = (
    "WITH fp AS (SELECT * FROM ("
    + _SIMHASH64_SQL
    + """)),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
),
sym AS (
  SELECT d1 AS doc_id, hamming FROM pairs
  UNION ALL
  SELECT d2 AS doc_id, hamming FROM pairs
)
SELECT doc_id, COUNT(*) AS n_near, CAST(MIN(hamming) AS INT) AS min_hamming
FROM sym GROUP BY doc_id
"""
)


def _ar2_oracle_sql() -> str:
    """ml_forecast_ar_exact mirror: the Cramer weight solve and the
    unrolled 7-step recursion come verbatim from pipeline_queries'
    ar2_weight_sqls / ar2_step_sql templates, so every double on the
    oracle side traverses the identical IEEE operation chain."""
    from mspr2_back_spark.plans.pipeline_queries import (
        AR2_HORIZON,
        AR2_SCALE,
        ar2_step_sql,
        ar2_weight_sqls,
    )
    from mspr2_back_spark.plans.timeseries import ts_operating_window_sql

    det, d1, d2, d3 = ar2_weight_sqls()
    ok = f"(n >= 3 AND {det} <> CAST(0.0 AS DOUBLE))"

    def m(expr: str, name: str) -> str:
        return (
            f"CAST(SUM(CASE WHEN x2 IS NOT NULL THEN"
            f" CAST({expr} AS {AR2_SCALE}) END) AS DOUBLE) AS {name}"
        )

    steps = []
    prev2, prev1 = "pa", "pc"
    for k in range(1, AR2_HORIZON + 1):
        src = "wts" if k == 1 else f"st{k - 1}"
        steps.append(
            f"st{k} AS (SELECT *, {ar2_step_sql(prev1, prev2)} AS f{k}"
            f" FROM {src})"
        )
        prev2, prev1 = prev1, f"f{k}"
    case = " ".join(
        f"WHEN {k} THEN f{k}" for k in range(1, AR2_HORIZON + 1)
    )
    steps_sql = ",\n".join(steps)
    return f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
  FROM events WHERE {ts_operating_window_sql("ts")} GROUP BY 1, 2
),
lagged AS (
  SELECT user_id, day, y,
         LAG(y, 1) OVER w AS x1, LAG(y, 2) OVER w AS x2
  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day)
),
agg AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN x2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n,
         {m("x1", "sx1")},
         {m("x2", "sx2")},
         {m("y", "sy")},
         {m("x1 * x1", "s11")},
         {m("x1 * x2", "s12")},
         {m("x2 * x2", "s22")},
         {m("x1 * y", "s1y")},
         {m("x2 * y", "s2y")},
         max_by(y, day) AS pc,
         max_by(x1, day) AS pa_raw,
         MAX(day) AS last_day
  FROM lagged GROUP BY 1
),
wts AS (
  SELECT user_id, last_day, pc,
         COALESCE(pa_raw, CAST(0.0 AS DOUBLE)) AS pa,
         CASE WHEN {ok} THEN {d1} / {det}
              ELSE CAST(0.0 AS DOUBLE) END AS ww1,
         CASE WHEN {ok} THEN {d2} / {det}
              ELSE CAST(0.0 AS DOUBLE) END AS ww2,
         CASE WHEN {ok} THEN {d3} / {det} ELSE pc END AS bb
  FROM agg
),
{steps_sql}
SELECT user_id, CAST(k AS INT) AS step,
       last_day + CAST(k AS INT) AS forecast_day,
       ROUND(CASE k {case} END, 6) AS forecast_value
FROM st{AR2_HORIZON}, unnest(generate_series(1, {AR2_HORIZON})) AS t(k)
ORDER BY user_id, step
"""


PIPELINE_ORACLE_SQL["ml_forecast_ar_exact"] = _ar2_oracle_sql()


# multimodal_decode_stats: the decoder-falsifying closed form. The
# Spark side ENCODES a gradient image per doc_id (even ids → BMP, odd
# ids → PNG with scanline filter (id//2)%5, covering every unfilter
# path — r7) and reports stats from the DECODED pixel array; this
# oracle recomputes the same stats straight from the channel
# definitions R=(7·id+r·c)%256, G=(3·id+r+c)%256, B=(id+r·w+c)%256 —
# a stride/BGR/bottom-up/deflate/unfilter bug in either codec shifts
# at least one channel sum and breaks the hash. The codec label is
# pure doc_id arithmetic on both sides.
PIPELINE_ORACLE_SQL["multimodal_decode_stats"] = """
WITH d AS (
  -- sign-safe modulo throughout: SQL % returns negatives for
  -- negative doc_ids where the Python side's % never does — the
  -- corpus has no negative ids today, but the invariant should be
  -- enforced, not assumed (same hardening as the weekday oracles)
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'bmp24'
              ELSE 'png/f' || CAST(((doc_id // 2) % 5 + 5) % 5 AS VARCHAR)
         END AS codec,
         CAST(8 + ((doc_id % 9) + 9) % 9 AS INT) AS width,
         CAST(8 + ((doc_id % 7) + 7) % 7 AS INT) AS height
  FROM documents
),
px AS (
  SELECT doc_id, codec, width, height,
         (((doc_id * 7 + r.k * c.k) % 256) + 256) % 256 AS pr,
         (((doc_id * 3 + r.k + c.k) % 256) + 256) % 256 AS pg,
         (((doc_id + r.k * width + c.k) % 256) + 256) % 256 AS pb
  FROM d,
       unnest(generate_series(0, height - 1)) AS r(k),
       unnest(generate_series(0, width - 1)) AS c(k)
)
SELECT doc_id, codec, width, height,
       CAST(COUNT(*) AS BIGINT) AS n_pixels,
       CAST(SUM(pr) AS BIGINT) AS sum_r,
       CAST(SUM(pg) AS BIGINT) AS sum_g,
       CAST(SUM(pb) AS BIGINT) AS sum_b,
       CAST(SUM(pb) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_b,
       CAST((((doc_id * 7) % 256) + 256) % 256 AS BIGINT) AS first_r,
       CAST((((doc_id * 3) % 256) + 256) % 256 AS BIGINT) AS first_g,
       CAST(((doc_id % 256) + 256) % 256 AS BIGINT) AS first_b,
       CAST((((doc_id + width * height - 1) % 256) + 256) % 256
            AS BIGINT) AS last_b
FROM px
GROUP BY 1, 2, 3, 4
ORDER BY 1
"""

# multimodal_jpeg_meta (r8): the JPEG marker-path falsifier. The
# Spark side encodes a closed-form image per doc_id (profile id%3,
# restart interval id%4), re-parses the emitted bytes (SOF0 dims,
# DRI segment, RSTn census) and decodes; this oracle recomputes the
# dims, the MCU grid (4:2:0 halves both axes → 16-px MCUs), and the
# restart-marker count n_rst = floor((n_mcus-1)/dri) straight from
# the arithmetic. dri_parity/err_ok assert the decode invariants
# (DRI streams decode bit-identically to plain ones; lossy pixels
# stay within the documented ringing bound) — closed-form TRUE.
PIPELINE_ORACLE_SQL["multimodal_jpeg_meta"] = """
WITH d AS (
  SELECT doc_id,
         CAST(13 + ((doc_id % 23) + 23) % 23 AS INT) AS width,
         CAST(9 + ((doc_id % 17) + 17) % 17 AS INT) AS height,
         ((doc_id % 3) + 3) % 3 AS mode,
         CAST(((doc_id % 4) + 4) % 4 AS INT) AS dri
  FROM documents
),
g AS (
  SELECT doc_id, width, height, mode, dri,
         CASE WHEN mode = 2
              THEN CAST(FLOOR((width + 15) / 16.0) AS BIGINT)
                   * CAST(FLOOR((height + 15) / 16.0) AS BIGINT)
              ELSE CAST(FLOOR((width + 7) / 8.0) AS BIGINT)
                   * CAST(FLOOR((height + 7) / 8.0) AS BIGINT)
         END AS n_mcus
  FROM d
)
SELECT doc_id, width, height,
       CASE WHEN mode = 0 THEN 'jpeg/gray8'
            ELSE 'jpeg/baseline' END AS format,
       dri,
       CAST(n_mcus AS BIGINT) AS n_mcus,
       CAST(CASE WHEN dri = 0 THEN 0
                 ELSE FLOOR((n_mcus - 1) / CAST(dri AS DOUBLE))
            END AS BIGINT) AS n_rst,
       TRUE AS dri_parity,
       TRUE AS err_ok
FROM g
ORDER BY doc_id
"""


def _wav_oracle_sql() -> str:
    """multimodal_wav_stats (r9): the WAV/PCM falsifier. The Spark
    side synthesizes a closed-form waveform per doc_id, writes a real
    RIFF/WAVE file (with JUNK/cue chunks and word-align pads), decodes
    it back, and reports exact sample stats plus the payload byte
    length; this oracle recomputes the samples from
    v(i,ch) = f_bits(7·id+3·i+11·ch) over generate_series and the
    byte length from the chunk-assembly arithmetic (header 12 + each
    chunk's 8+size+pad). PCM is lossless, so every column is exact —
    any fmt-parse, interleave, dtype, or chunk-walk defect in either
    codec half shifts a sum or the length and breaks the hash."""

    def f_bits(x: str) -> str:
        # sign-safe modulo per house style (corpus ids are non-negative
        # today; the invariant is enforced, not assumed)
        return (
            f"CASE bits WHEN 8 THEN (({x}) % 256 + 256) % 256"
            f" WHEN 16 THEN (({x}) % 4096 + 4096) % 4096 - 2048"
            f" ELSE (({x}) % 65536 + 65536) % 65536 - 32768 END"
        )

    return f"""
WITH d AS (
  SELECT doc_id,
         CAST(1 + ((doc_id % 3) + 3) % 3 AS INT) AS channels,
         CAST(CASE ((doc_id // 3) % 3 + 3) % 3
              WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 32 END AS INT) AS bits,
         CAST(8000 * (1 + ((doc_id % 4) + 4) % 4) AS INT) AS sample_rate,
         CAST(40 + ((doc_id % 61) + 61) % 61 AS BIGINT) AS n
  FROM documents
),
sz AS (
  SELECT doc_id, channels, bits, sample_rate, n,
         n * channels * (bits // 8) AS dsize,
         1 + ((doc_id % 6) + 6) % 6 AS jsize,
         4 + ((doc_id % 5) + 5) % 5 AS csize
  FROM d
),
s AS (
  SELECT doc_id, channels, bits,
         {f_bits("doc_id * 7 + i.k * 3 + ch.k * 11")} AS v
  FROM sz,
       unnest(generate_series(0, n - 1)) AS i(k),
       unnest(generate_series(0, channels - 1)) AS ch(k)
),
agg AS (
  SELECT doc_id,
         CAST(SUM(v) AS BIGINT) AS sum_all,
         CAST(SUM(v * v) AS BIGINT) AS sumsq_all,
         CAST(MAX(ABS(v)) AS BIGINT) AS peak
  FROM s GROUP BY doc_id
)
SELECT sz.doc_id,
       'wav/pcm' || CAST(bits AS VARCHAR) AS fmt,
       channels, sample_rate, bits,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n AS DOUBLE) * CAST(1000 AS DOUBLE)
         / CAST(sample_rate AS DOUBLE) AS duration_ms,
       CAST(12
            + CASE WHEN ((sz.doc_id % 2) + 2) % 2 = 1
                   THEN 8 + jsize + jsize % 2 ELSE 0 END
            + 24
            + 8 + dsize + dsize % 2
            + CASE WHEN ((sz.doc_id % 4) + 4) % 4 = 2
                   THEN 8 + csize + csize % 2 ELSE 0 END
            AS BIGINT) AS n_bytes,
       TRUE AS riff_ok,
       agg.sum_all, agg.sumsq_all, agg.peak,
       CAST({f_bits("sz.doc_id * 7")} AS BIGINT) AS first_c0,
       CAST({f_bits("sz.doc_id * 7 + (n - 1) * 3")} AS BIGINT) AS last_c0
FROM sz JOIN agg ON sz.doc_id = agg.doc_id
ORDER BY sz.doc_id
"""


PIPELINE_ORACLE_SQL["multimodal_wav_stats"] = _wav_oracle_sql()


def _audio_feature_oracle_sql() -> str:
    """audio_feature_stats (r12): the audio-feature falsifier. The
    Spark side synthesizes k(i,ch) = ((1231·id + 2749·i + 997·ch)
    mod 4001) − 2000 per doc, encodes real RIFF/WAVE, and runs the
    ``audio_feature_row`` descriptor chain; this oracle regenerates
    the samples over generate_series and recomputes every descriptor
    closed-form. The mono mix is the dyadic rational mnum/65536
    (mnum = 2·k mono, k₀+k₁ stereo), so sums of squares are EXACT in
    any accumulation order and rms/peak/zcr are bit-equal doubles —
    any normalize, interleave, sign, or windowing defect in the
    feature chain breaks the hash."""

    def k(expr: str) -> str:
        # sign-safe modulo per house style
        return f"((({expr}) % 4001 + 4001) % 4001 - 2000)"

    base = "1231 * d.doc_id + 2749 * i.k"
    return f"""
WITH d AS (
  SELECT doc_id,
         CAST(1 + ((doc_id % 2) + 2) % 2 AS INT) AS channels,
         CAST(8000 * (1 + ((doc_id % 3) + 3) % 3) AS INT) AS sample_rate,
         CAST(32 + ((doc_id % 41) + 41) % 41 AS BIGINT) AS n
  FROM documents
),
s AS (
  SELECT d.doc_id, i.k AS i,
         CASE WHEN d.channels = 1 THEN 2 * {k(base)}
              ELSE {k(base)} + {k(base + " + 997")} END AS mnum
  FROM d, unnest(generate_series(0, n - 1)) AS i(k)
),
agg AS (
  SELECT doc_id,
         SUM((CAST(mnum AS DOUBLE) / 65536.0)
             * (CAST(mnum AS DOUBLE) / 65536.0)) AS sumsq,
         MAX(ABS(mnum)) AS peaknum
  FROM s GROUP BY doc_id
),
fl AS (
  SELECT doc_id,
         COUNT(*) FILTER (WHERE prev IS NOT NULL AND sg <> prev) AS nflips
  FROM (
    SELECT doc_id, sg, LAG(sg) OVER (PARTITION BY doc_id ORDER BY i) AS prev
    FROM (
      SELECT doc_id, i, CASE WHEN mnum > 0 THEN 1 ELSE -1 END AS sg
      FROM s WHERE mnum <> 0
    ) nz
  ) lagged
  GROUP BY doc_id
)
SELECT d.doc_id,
       'wav/pcm16' AS fmt,
       d.channels,
       d.sample_rate,
       CAST(d.n AS INT) AS n_samples,
       CAST(d.n AS DOUBLE) * CAST(1000 AS DOUBLE)
         / CAST(d.sample_rate AS DOUBLE) AS duration_ms,
       SQRT(agg.sumsq / CAST(d.n AS DOUBLE)) AS rms,
       CAST(agg.peaknum AS DOUBLE) / 65536.0 AS peak,
       CAST(COALESCE(fl.nflips, 0) AS DOUBLE)
         / CAST(d.n - 1 AS DOUBLE) AS zero_cross_rate
FROM d
JOIN agg ON d.doc_id = agg.doc_id
LEFT JOIN fl ON d.doc_id = fl.doc_id
ORDER BY d.doc_id
"""


PIPELINE_ORACLE_SQL["audio_feature_stats"] = _audio_feature_oracle_sql()


def _adpcm_oracle_sql() -> str:
    """multimodal_adpcm_stats (r13): the compressed-WAV container
    falsifier. The Spark side synthesizes int16 PCM per doc, encodes
    it through one of four compressed framings cycling on id%4
    (IMA-ADPCM / plain MS-ADPCM / EXTENSIBLE MS-ADPCM / G.711), runs
    the full ``decode_wav``, and reports the lossless-through-lossy
    columns; this oracle recomputes every one closed-form — most
    load-bearing, n_bytes reassembles the ENTIRE container per
    framing: RIFF header (12) + fmt chunk (8 + 20 IMA / 8 + 50 MS
    plain with the 7-pair coefficient table / 8 + 40 EXTENSIBLE
    GUID layouts / 8 + 16 plain G.711) + fact chunk (12, ADPCM only)
    + data chunk (8 + n_blocks*block_align for the block codecs with
    spb samples per block, 8 + channels*n bytes for G.711) + the
    RIFF word-align pad (EXTENSIBLE MS-ADPCM is the mono odd
    block_align = 11+4q case). Any drift in block quantization,
    fact-chunk trim, fmt-extension size, or pad emission breaks the
    hash. Decoder bits stays the container's nibble/byte width
    (4 ADPCM, 8 G.711); duration_ms is the shared single-division
    idiom."""
    return """
WITH d AS (
  SELECT doc_id,
         ((doc_id % 4) + 4) % 4 AS sel,
         CAST(1 + ((doc_id % 2) + 2) % 2 AS INT) AS channels,
         CAST(8000 * (1 + ((doc_id % 3) + 3) % 3) AS INT) AS sample_rate,
         50 + ((doc_id % 101) + 101) % 101 AS n,
         ((doc_id % 3) + 3) % 3 AS m,
         ((doc_id % 5) + 5) % 5 AS q
  FROM documents
),
blk AS (
  SELECT *,
         CASE sel WHEN 0 THEN 9 + 8 * m
                  WHEN 1 THEN 6 + 4 * q
                  WHEN 2 THEN 10 + 8 * q END AS spb,
         CASE sel WHEN 0 THEN 8 + 4 * m
                  WHEN 1 THEN 18 + 4 * q
                  WHEN 2 THEN 11 + 4 * q END AS ba
  FROM d
),
sz AS (
  -- FLOOR division, not //: the statement stays Spark-parseable
  -- (test_sql_surface runs it verbatim on both engines; operands
  -- are small non-negative ints so the double division is exact)
  SELECT *, CAST(FLOOR((n + spb - 1) / spb) AS BIGINT) AS nb FROM blk
)
SELECT doc_id,
       CASE sel WHEN 0 THEN 'wav/ima-adpcm4'
                WHEN 1 THEN 'wav/ms-adpcm4'
                WHEN 2 THEN 'wav/ms-adpcm4'
                ELSE CASE WHEN ((doc_id % 8) + 8) % 8 < 4
                          THEN 'wav/ulaw8' ELSE 'wav/alaw8' END
       END AS fmt,
       channels,
       sample_rate,
       CAST(CASE WHEN sel = 3 THEN 8 ELSE 4 END AS INT) AS bits,
       CAST(n AS INT) AS n_samples,
       CAST(n AS DOUBLE) * CAST(1000 AS DOUBLE)
         / CAST(sample_rate AS DOUBLE) AS duration_ms,
       CAST(CASE sel
              WHEN 0 THEN 60 + nb * ba
              WHEN 1 THEN 90 + nb * ba
              WHEN 2 THEN 80 + nb * ba + (nb * ba) % 2
              ELSE 28 + CASE WHEN q < 2 THEN 40 ELSE 16 END
                   + channels * n
            END AS BIGINT) AS n_bytes,
       TRUE AS riff_ok
FROM sz
ORDER BY doc_id
"""


PIPELINE_ORACLE_SQL["multimodal_adpcm_stats"] = _adpcm_oracle_sql()
