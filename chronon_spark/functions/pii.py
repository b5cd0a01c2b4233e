"""PII detection / redaction over text columns — pure codegen, no UDFs.

A 100 TB training-data pipeline scrubs personally-identifiable strings
before anything else touches the corpus.  Every detector here is a single
Java-regex column expression (`regexp_count` / `regexp_replace`), so the
whole scrub is one WholeStageCodegen projection: zero shuffles, zero
Python, scales linearly with input bytes and pushes column pruning down
to the parquet scan.

Portability: the patterns use only syntax shared by Java regex (Spark)
and RE2 (DuckDB) — character classes, bounded quantifiers, non-capturing
groups, `\\b` word boundaries; no lookaround, no backreferences — so the
DuckDB oracle reproduces counts and redacted text byte-for-byte.

The reference engine has no PII surface (its payload is ad-tech events);
this module is part of the LLM-training-data extension mandated by the
build brief, modeled on the C4 / RefinedWeb-style scrub stage.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# Detector patterns, applied (and redacted) in this fixed order.  Order
# matters: emails contain dots and digits, so they are removed before the
# looser numeric detectors; SSN (3-2-4) is removed before PHONE (3-3-4)
# so the two digit-run shapes never shadow each other.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ccnum", r"\b\d{13,16}\b"),
)

URL_PATTERN = r"https?://([A-Za-z0-9.-]+)(?:/[^\s]*)?"


def pii_counts(text: Column | str) -> list[Column]:
    """One `<kind>_n` int column per detector — `regexp_count` is a
    codegen builtin, so N detectors cost one pass over the string each,
    all inside the same projection."""
    t = _c(text)
    return [F.regexp_count(t, F.lit(pat)).alias(f"{kind}_n") for kind, pat in PII_PATTERNS]


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with `<KIND>`, applying detectors in the
    canonical PII_PATTERNS order (the order is part of the contract —
    the DuckDB oracle replays the same chain)."""
    out = _c(text)
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_counts_sql(text_expr: str) -> list[str]:
    """DuckDB oracle fragments mirroring pii_counts (RE2 syntax is a
    subset-compatible read of the same patterns)."""
    return [
        f"len(regexp_extract_all({text_expr}, '{pat}'))::INT AS {kind}_n"
        for kind, pat in PII_PATTERNS
    ]


def redact_pii_sql(text_expr: str) -> str:
    """DuckDB oracle fragment mirroring redact_pii ('g' = replace-all,
    matching Spark's regexp_replace semantics)."""
    out = text_expr
    for kind, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '<{kind.upper()}>', 'g')"
    return out


def extract_domains(text: Column | str) -> Column:
    """array<string> of URL host names found in the text — feeds the
    per-domain rollup (C4-style URL filtering needs domain frequencies
    before a blocklist join)."""
    return F.regexp_extract_all(_c(text), F.lit(URL_PATTERN), 1)
