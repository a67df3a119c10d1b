"""PII detection and redaction for corpus curation.

A pretraining pipeline drops or scrubs documents carrying emails,
phone numbers, bare IPs, or SSN-shaped identifiers before the corpus
ships (the C4/Dolma-style scrub step).  Both operators are pure JVM
column expressions — regexp_count / regexp_replace inside whole-stage
codegen, zero shuffles, zero Python — so they run at scan speed on
100 TB and compose with the rest of the curation pipeline
(`curation.curate`) as cheap projections.

Pattern discipline: every pattern is RE2-compatible (no lookarounds,
no backreferences) so the SAME string runs identically under Spark's
Java regex and DuckDB's RE2 — which is what lets the oracle harness
hash-match the outputs bit-for-bit (see `pii_oracle_sql`).  They are
deliberately precision-leaning (anchored with \\b, fixed shapes):
a scrubber that eats "3.14.15" as an IP is worse than one that misses
an exotic phone format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement token) — order matters for redaction:
# emails first so their dotted hosts aren't half-eaten by the IP rule.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IPV4]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """{kind: count-of-matches} column per PII kind."""
    return {
        name: F.regexp_count(text, F.lit(pat))
        for name, pat, _ in PII_PATTERNS
    }


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_email, n_phone, n_ssn, n_ipv4, has_pii) per document —
    the filter/report input (drop `has_pii` rows, or weight by count)."""
    counts = pii_counts(F.col(text_col))
    cols = [
        c.cast("long").alias(f"n_{name}") for name, c in counts.items()
    ]
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(F.col(id_col), *cols, (total > 0).alias("has_pii"))


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text_redacted, n_redacted): every PII match replaced by its
    bracket token, applied in PII_PATTERNS order (emails before IPs so
    dotted mail hosts don't get half-rewritten)."""
    text = F.col(text_col)
    red = text
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    counts = pii_counts(text)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        red.alias("text_redacted"),
        total.cast("long").alias("n_redacted"),
    )


def pii_oracle_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twins of the count/redact expressions over ``text_expr``
    (RE2 syntax — identical match semantics to the Spark patterns)."""
    counts = {
        name: f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for name, pat, _ in PII_PATTERNS
    }
    red = text_expr
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return {"counts": counts, "redacted": red}
