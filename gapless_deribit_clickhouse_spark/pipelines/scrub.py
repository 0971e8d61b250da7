"""PII scrubbing: redact emails / IPv4s / phone-like numbers from a
text column and count what was removed.

A standard pre-training curation step (alongside dedup, quality
filtering and contamination checks): pure ``regexp_replace`` /
``regexp_count`` column algebra — zero UDFs, stays inside whole-stage
codegen, scales as a map-only projection. Patterns are restricted to
syntax with identical semantics in Java regex (Spark) and RE2/DuckDB
(character classes, ``\\b``, bounded quantifiers — no lookarounds, no
backreferences), so the DuckDB oracle can verify the transform
value-for-value.

This is deliberately a HIGH-PRECISION scrubber (formats that are
near-certainly PII), not a recall-maximal one: aggressive patterns
(names, addresses) need NER models, which belong in the Arrow-kernel
tier, not regex.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied IN ORDER; order matters and
# the oracle must apply the same sequence
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # leading + keeps precision high (bare digit runs are usually not
    # phone numbers in prose)
    ("phone", r"\+\d[\d \-]{7,}\d", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Text with every PII match replaced by its ``<TYPE>`` token."""
    out = col
    for _name, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category match counts (before redaction)."""
    return {
        name: F.regexp_count(col, F.lit(pattern)).cast("long")
        for name, pattern, _repl in PII_PATTERNS
    }


def scrub_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One map-only projection: redacted text + per-category counts +
    total. Null text passes through as null with zero counts."""
    t = F.col(text_col)
    counts = pii_counts(t)
    total = None
    cols = [F.col(id_col), redact_pii(t).alias("clean_text")]
    for name, c in counts.items():
        c = F.coalesce(c, F.lit(0))
        cols.append(c.alias(f"n_{name}"))
        total = c if total is None else total + c
    cols.append(total.alias("n_pii_total"))
    return df.select(*cols)
