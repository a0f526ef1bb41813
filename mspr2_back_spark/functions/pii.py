"""PII detection and redaction for training-data curation.

A corpus pipeline must find and scrub personally identifiable
information before training. Detection and redaction are pure
regexp expressions (JVM-side, whole-stage codegen — no Python in the
scan), so the scrub runs at full scan throughput and composes with
the rest of the plan.

Pattern portability: the patterns below use only constructs with
identical semantics in Java regex (Spark) and RE2 (DuckDB, Go
tooling) — character classes, bounded repetition, alternation; no
lookaround, no backreferences — so an oracle engine scrubs byte-
identically. That is also the portable subset you'd want for a
multi-engine curation stack.

Scale: per-row expressions, zero shuffle, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Portable subset: no lookaround (RE2 has none), no \b word anchors
# (semantics differ at string edges across engines' matchers).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

# Redaction order matters and must match the oracle: emails first
# (their local part may contain digits/dots), then phones, then IPs.
_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ipv4", IPV4_RE, "[IP]"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts (``n_email``/``n_phone``/``n_ipv4``)."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        for kind, pat, _ in _RULES
    }


def redact_pii(col: Column) -> Column:
    """All PII kinds replaced by their redaction tokens, applied in
    the fixed rule order."""
    out = col
    for _, pat, token in _RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII audit: kind counts + md5 of the redacted text
    (the hash pins the exact redaction output without shipping the
    scrubbed corpus through the result)."""
    counts = pii_counts(F.col(text_col))
    # counts/length cast to long: the oracle engine's len()/length()
    # are 64-bit, and the driver compares schemas.
    return docs.select(
        id_col,
        *[c.cast("long").alias(name) for name, c in counts.items()],
        F.md5(redact_pii(F.col(text_col))).alias("redacted_hash"),
        F.length(redact_pii(F.col(text_col))).cast("long").alias("redacted_len"),
    )
