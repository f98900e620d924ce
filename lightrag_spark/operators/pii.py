"""PII redaction — the scrubbing pass of a web-corpus curation pipeline
(the C4/RefinedWeb-style step between quality filtering and packing; the
reference has no equivalent because it never republishes corpus text —
this is one of the beyond-the-reference training-data operators).

Five conservative, deterministic detectors applied in a FIXED order so
overlapping digit shapes resolve identically everywhere: email -> SSN ->
payment-card -> IPv4 -> phone.  Each stage counts its matches on the
text as produced by the previous stage, then rewrites them to a typed
placeholder ("[EMAIL]", ...), so a card number is never double-counted
as a phone number.

Scale shape: the whole operator is a chain of ``regexp_count`` /
``regexp_replace`` column expressions — one narrow projection inside
whole-stage codegen, zero Python, zero shuffle; it fuses with whatever
scan or filter precedes it.  Patterns are RE2-compatible (no lookaround,
no backrefs) so the DuckDB oracle can state the identical rewrite chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["PII_PATTERNS", "redact_pii"]

# (kind, pattern, placeholder) — ORDER IS THE CONTRACT (see module doc).
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "[SSN]",
    ),
    (
        "card",
        r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b|\b\d{16}\b",
        "[CARD]",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "[IP]",
    ),
    (
        "phone",
        r"\b(?:\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b",
        "[PHONE]",
    ),
]


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, redacted text, n_<kind> per detector, n_pii total).

    One projection: counts and rewrites chain left-to-right over the same
    column, so each detector sees the previous detector's placeholders —
    the fixed-order contract that keeps Spark and the SQL twin identical.
    """
    cur = F.col(text_col)
    out = docs.select(F.col(id_col).alias("doc_id"), cur.alias("_t0"))
    prev = "_t0"
    count_cols = []
    for i, (kind, pattern, placeholder) in enumerate(PII_PATTERNS):
        cname, tname = f"n_{kind}", f"_t{i + 1}"
        out = out.withColumn(
            cname, F.regexp_count(F.col(prev), F.lit(pattern)).cast("long")
        ).withColumn(tname, F.regexp_replace(F.col(prev), pattern, placeholder))
        count_cols.append(cname)
        prev = tname
    total = None
    for c in count_cols:
        total = F.col(c) if total is None else total + F.col(c)
    return out.select(
        "doc_id",
        F.col(prev).alias("text"),
        *count_cols,
        total.alias("n_pii"),
    )
