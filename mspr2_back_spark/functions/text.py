"""Text-analysis column functions for corpus curation.

All pure Spark SQL expressions (codegen'd, engine-portable): language
ID by stopword density, quality scoring, token counting, and content
fingerprinting. No UDFs — at 100 TB these run scan-side with zero
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# array_remove (plain JVM expression) instead of a filter() lambda:
# the lambda is interpreted per word; this is codegen-friendly.
WORDS = "array_remove(split(text, ' '), '')"

# Minimal per-language stopword markers for the heuristic language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "los", "y", "las"),
}


def _marker_hits(lang: str) -> str:
    members = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"size(filter({WORDS}, w -> w IN ({members})))"


def lang_scores() -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    return {lang: F.expr(_marker_hits(lang)) for lang in LANG_MARKERS}


def predicted_lang(min_ratio: float = 0.02) -> Column:
    """Argmax-by-marker-density language guess with a deterministic
    tie order (en > fr > de > es > und)."""
    n_words = F.expr(f"size({WORDS})")
    scores = lang_scores()
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        s = scores[lang]
        cond = (s >= F.greatest(*[scores[o] for o in LANG_MARKERS if o != lang])) & (
            s.cast("double") / F.nullif(n_words, F.lit(0)) >= min_ratio
        )
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred


def token_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letter runs,
    digit runs, single punctuation — the shape of a byte-pair
    pre-tokenizer)."""
    return docs.select(
        F.col(id_col),
        F.expr(f"size({WORDS})").alias("n_ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")
        ).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


def quality_score_col() -> Column:
    """The blended quality score as a standalone column expression —
    single source of truth for `quality_features` and any single-pass
    consumer (e.g. the quality_filter verdict ladder)."""
    n_words = F.expr(f"size({WORDS})")
    n_stop = F.expr(_marker_hits("en"))
    n_distinct = F.expr(f"size(array_distinct({WORDS}))")
    denom = F.nullif(n_words, F.lit(0))
    stop_ratio = n_stop.cast("double") / denom
    ttr = n_distinct.cast("double") / denom
    return F.round(
        F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 10.0, F.lit(1.0)) * 0.3
        + ttr * 0.3,
        6,
    )


def quality_features(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: length, mean word length, stopword
    ratio, type-token ratio, and a blended quality score.

    Every ratio divides exact integers, so scores are deterministic
    across engines and partitionings."""
    n_words = F.expr(f"size({WORDS})")
    n_stop = F.expr(_marker_hits("en"))
    n_distinct = F.expr(f"size(array_distinct({WORDS}))")
    n_chars = F.length("text")
    # ANSI mode makes x/0 an ERROR, not NULL — a single empty document
    # would kill a 100 TB job. nullif() restores null-ratio semantics.
    denom = F.nullif(n_words, F.lit(0))
    avg_word_len = (n_chars - (n_words - 1)).cast("double") / denom
    stop_ratio = n_stop.cast("double") / denom
    ttr = n_distinct.cast("double") / denom
    score = quality_score_col()
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(ttr, 6).alias("type_token_ratio"),
        score.alias("quality_score"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: raw digest, whitespace-normalized digest,
    and an order-insensitive bag-of-words digest (near-dup blocking
    key for shuffled/reordered copies)."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    bag = F.expr(
        f"array_join(array_sort(array_distinct({WORDS})), ' ')"
    )
    return docs.select(
        F.col(id_col),
        F.md5("text").alias("content_hash"),
        F.md5(normalized).alias("normalized_hash"),
        F.md5(bag).alias("bag_hash"),
    )


def repair_encoding(docs: DataFrame, bytes_col: str, out_col: str = "text") -> DataFrame:
    """Decode raw bytes with the reference's fallback chain —
    utf-8 → latin-1 → cp1252 (ref app/routes/tables.py:13-22).

    Spark reads UTF-8 natively, so this exists only for parity with
    the reference's defensive decoding of legacy exports. It is the
    one deliberately-Python text function here: charset sniffing has
    no JVM expression form, so it runs as an Arrow-batched pandas
    iterator over the binary column (off the hot path by design —
    run once at ingest, not per query).
    """
    import pandas as pd

    def decode(batches):
        def one(b: bytes | None) -> str | None:
            if b is None:
                return None
            for enc in ("utf-8", "latin-1", "cp1252"):
                try:
                    return bytes(b).decode(enc)
                except (UnicodeDecodeError, ValueError):
                    continue
            return bytes(b).decode("utf-8", errors="replace")

        for pdf in batches:
            out = pdf.drop(columns=[bytes_col])
            out[out_col] = [one(b) for b in pdf[bytes_col]]
            yield out

    out_fields = [f"{f.name} {f.dataType.simpleString()}"
                  for f in docs.schema.fields if f.name != bytes_col]
    schema = ", ".join(out_fields + [f"{out_col} string"])
    return docs.mapInPandas(decode, schema=schema)
