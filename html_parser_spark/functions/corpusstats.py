"""Corpus-composition diagnostics for the training-data mixer.

Before sampling weights are chosen (see ``textops.hash_sample``), a
pipeline reports what the corpus IS: how concentrated it is by source
(entropy / HHI / top share drive re-balancing decisions) and how document
lengths distribute (log2 histogram — the packing/seq-length planner's
input). Both are one map-side-combinable groupBy plus an O(n_groups)
reduction, with exact ANSI-SQL twins in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["corpus_mix", "length_histogram"]


def corpus_mix(docs: DataFrame, key_col: str = "source") -> DataFrame:
    """One-row corpus-concentration summary over ``key_col``:
    ``(n_docs, n_groups, top_share, entropy, hhi)``.

    - ``top_share``: largest group's fraction (a single-source crawl →
      1.0);
    - ``entropy``: Shannon entropy of the group distribution in nats
      (ln-based, matching the SQL twin);
    - ``hhi``: Herfindahl–Hirschman index (sum of squared shares) — the
      mixer's standard concentration number.

    Plan: ONE combinable groupBy on the key (hot groups collapse to a row
    per map task), then an O(n_groups) single-row aggregate — no second
    pass over the corpus, no driver-side math.
    """
    per = docs.groupBy(F.col(key_col).alias("grp")) \
              .agg(F.count(F.lit(1)).alias("c"))
    return per.agg(
        F.sum("c").alias("n_docs"),
        F.count(F.lit(1)).alias("n_groups"),
        F.round(F.max(F.col("c")).cast("double")
                / F.sum("c"), 6).alias("top_share"),
        F.round(-F.sum(F.col("c") * F.log(F.col("c")))
                / F.sum("c") + F.log(F.sum("c")), 6).alias("entropy"),
        # Squares and the total² go through double BEFORE multiplying:
        # long*long wraps (or ANSI-throws) past ~3e9 docs — inside the
        # 10^12-doc design scale. HHI is a ratio statistic; double
        # precision is exact at test scale and ample beyond it.
        F.round(F.sum(F.col("c").cast("double") * F.col("c"))
                / (F.sum("c").cast("double") * F.sum("c")), 6).alias("hhi"),
    )


def length_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Log2-bucketed document-length distribution:
    ``(bucket, lo_chars, n_docs)`` where ``bucket`` is
    ``floor(log2(n_chars))`` (−1 for NULL/empty docs) and ``lo_chars`` the
    bucket's lower edge. The seq-length/packing planner's standard input;
    ONE map-side-combinable groupBy on an integer key.
    """
    # bucket b must satisfy the INTEGER invariant 2^b <= n < 2^(b+1).
    # Float floor(log2(n)) alone can misbucket at powers of two under a
    # 1-ulp log error (engines differ), so the float estimate is corrected
    # against the exact integer edges with shifts; the twin replays the
    # same correction so both engines bucket identically at any length.
    # (expr form: pyspark's shiftleft() only takes a literal bit count.)
    return (docs
            .select(F.length(F.col(text_col)).cast("long").alias("n"))
            .select(F.col("n"),
                    F.expr("CASE WHEN n > 0 THEN "
                           "CAST(FLOOR(LOG2(n)) AS INT) ELSE 0 END")
                    .alias("raw"))
            .select(F.expr(
                "CAST(CASE WHEN n IS NULL OR n <= 0 THEN -1 "
                "WHEN SHIFTLEFT(1L, raw + 1) <= n THEN raw + 1 "
                "WHEN SHIFTLEFT(1L, raw) > n THEN raw - 1 "
                "ELSE raw END AS BIGINT)").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select("bucket",
                    F.expr("CAST(CASE WHEN bucket < 0 THEN 0 ELSE "
                           "SHIFTLEFT(1L, CAST(bucket AS INT)) END "
                           "AS BIGINT)").alias("lo_chars"),
                    "n_docs"))
