"""Spark-native text operators for the large-scale training-data pipeline.

All JVM-side (``pyspark.sql.functions`` only — no Python UDFs): these run in
WholeStageCodegen and scale linearly with executors. Each has an ANSI-SQL
twin in ``__spark_entry__.oracle_sql`` checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "token_count", "word_hits", "langid", "quality_score", "char_shingles",
    "doc_fingerprint", "EN_STOPWORDS", "ES_STOPWORDS",
]

# Small fixed stopword lists — shared verbatim with the SQL oracle.
EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "for", "with"]
ES_STOPWORDS = ["el", "la", "de", "que", "los", "las", "una", "para"]

_TOKEN_PATTERN = r"\w+"


def token_count(col: str = "text") -> Column:
    """Whitespace/word-regex token count (BPE-ish proxy)."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(_TOKEN_PATTERN), F.lit(0)))


def word_hits(col: str, words: list[str]) -> Column:
    """Count of occurrences of any word in ``words`` (word-bounded)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.col(col)), F.lit(pat), F.lit(0)))


def langid(col: str = "text") -> Column:
    """n-gram/stopword-heuristic language ID (en vs es)."""
    en = word_hits(col, EN_STOPWORDS)
    es = word_hits(col, ES_STOPWORDS)
    return F.when(es > en, F.lit("es")).otherwise(F.lit("en"))


def quality_score(col: str = "text") -> Column:
    """Length / punctuation / stopword-ratio quality heuristic in [0,1],
    rounded to 4 decimals (stable across engines)."""
    n_chars = F.length(F.col(col))
    n_tokens = token_count(col)
    stop = word_hits(col, EN_STOPWORDS)
    punct = F.size(F.regexp_extract_all(F.col(col), F.lit(r"[.,;:!?]"), F.lit(0)))
    stop_ratio = stop / F.greatest(n_tokens, F.lit(1))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (F.lit(0.5) * len_score
             + F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
             + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))))
    return F.round(score, 4)


def char_shingles(col: str = "text", width: int = 16, stride: int = 8) -> Column:
    """Distinct strided character shingles — the unit for n-gram Jaccard /
    MinHash dedup. Built-in-only: sequence + transform + array_distinct."""
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(F.col(col)) - F.lit(width - 1), F.lit(1)),
        F.lit(stride),
    )
    return F.array_distinct(
        F.transform(starts, lambda i: F.substring(F.col(col), i, width))
    )


def doc_fingerprint(col: str = "text") -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized text
    (rolling-hash analog; exact-dedup key)."""
    norm = F.lower(F.regexp_replace(F.col(col), r"\s+", " "))
    return F.md5(F.encode(norm, "utf-8"))
