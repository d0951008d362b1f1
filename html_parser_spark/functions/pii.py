"""PII detection / scrubbing for the training-data pipeline.

Before crawl text reaches a training corpus, personally identifiable
information is redacted in place (the standard pre-training hygiene pass —
e.g. the public BigScience ROOTS / Dolma pipelines scrub emails, phone
numbers, and IP addresses with exactly this regex-class approach). At
100 TB this must be a map-only pass: every rule here is a JVM-side
``regexp_extract_all`` / ``regexp_replace`` (whole-stage codegen, no
Python), so scrubbing rides the same scan as every other per-doc scalar —
zero shuffle, zero extra pass.

Pattern dialect note: the expressions avoid lookarounds and shorthand
classes that differ between engines, so the same pattern string runs
identically under Java regex (Spark) and RE2 (DuckDB oracle) — verified
by the ``pii_scrub`` driver query's exact twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["PII_PATTERNS", "pii_counts", "scrub_pii", "pii_scrub_table"]

# Ordered: scrub applies top-to-bottom (emails first — an address contains
# dots/digits a later pattern must not half-consume).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ipv4",  r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
]


def pii_counts(col: str | Column = "text") -> list[Column]:
    """One ``n_<kind>`` int column per PII rule (counts BEFORE scrubbing)."""
    u = F.col(col) if isinstance(col, str) else col
    return [
        F.size(F.regexp_extract_all(u, F.lit(pat), F.lit(0)))
        .alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]


def scrub_pii(col: str | Column = "text") -> Column:
    """Text with every PII match replaced by its typed placeholder.

    Rules apply in PII_PATTERNS order on the running result, mirroring the
    sequential `regexp_replace` chain of the SQL twin exactly."""
    u = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        u = F.regexp_replace(u, pat, repl)
    return u


def pii_scrub_table(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_phone, n_ipv4, scrubbed) per document —
    map-only, combinable with any other per-doc scoring in one pass."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *pii_counts(text_col),
        scrub_pii(text_col).alias("scrubbed"),
    )
