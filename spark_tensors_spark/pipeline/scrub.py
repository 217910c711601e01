"""PII detection / redaction operators — the scrubbing pass every
training-data pipeline runs before packing text into batches.

Patterns are deliberately restricted to the regex subset with identical
semantics in Java regex (Spark, executor-side codegen) and RE2 (DuckDB
oracle): character classes, bounded repetition, non-capturing groups,
ASCII word boundaries.  Detection (`pii_count_col`) and redaction
(`scrub_pii_col`, chained regexp_replace) are pure scan-side codegen —
a document row never leaves the JVM, so this runs at parquet-scan
speed at 100 TB.

Cross-engine parity of the pattern subset itself is pinned by
tests/test_scrub.py, which replays crafted strings through DuckDB's
regexp_replace and compares the redacted output byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: applied in this sequence when scrubbing (email before phone
# so the digits inside a redacted email can't re-match).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}",
}


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_count_col(text: Column | str, kind: str) -> Column:
    """Occurrence count of one PII pattern (codegen regexp_count)."""
    return F.regexp_count(_col(text), F.lit(PII_PATTERNS[kind])).cast("long")


def scrub_pii_col(
    text: Column | str,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    replacement: str = "<PII>",
) -> Column:
    """Redact every matching span, chained in PII_PATTERNS order."""
    out = _col(text)
    for k in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[k], replacement)
    return out
