"""PII scrubbing for training-data pipelines: regex redaction + per-type
counts, entirely as JVM-side SQL expressions.

A 100 TB pretraining corpus is filtered for emails/phones/IPs before
anything else ships; the operator must therefore be a NARROW map over
the text column — no shuffle, no Python in the hot path, codegen'd
`regexp_replace`/`regexp_count` only — so it fuses into the same scan
stage as tokenization and quality scoring (`docs_pipeline`-style
composition).

Pattern dialect contract: the default patterns use only syntax shared
by Java regex (Spark) and RE2 (DuckDB, the oracle engine) — character
classes, bounded quantifiers, ``\\b`` word boundaries; no lookaround,
no backreferences — so the oracle replays redaction byte-for-byte
(`text_pii_redact` hashes the redacted text on both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: replacement applies in this sequence (placeholders contain no
# digits or '@'/'.' runs, so earlier redactions can never create a later
# pattern's match)
DEFAULT_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4,10}", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """``(id, redacted, n_<type>...)`` — every pattern's matches
    replaced by its placeholder (all occurrences), plus a per-type
    match count measured on the ORIGINAL text (so counts are
    independent of redaction order). One narrow projection; at any
    corpus size this pipelines onto the scan."""
    pats = patterns or DEFAULT_PII_PATTERNS
    red: Column = F.col(text_col)
    counts = []
    for name, pat, rep in pats:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat))
            .cast("long")
            .alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, rep)
    return docs.select(
        F.col(id_col), red.alias("redacted"), *counts
    )
