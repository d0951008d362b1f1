"""Training-output shaping: sequence packing offsets and shard assignment.

The last mile of a crawl→training-data pipeline (after extraction, dedup
and filtering) is turning a document corpus into fixed-length training
sequences and balanced output shards. Both operators here are pure
DataFrame compositions with ANSI-SQL twins in ``__spark_entry__``.

``seq_pack`` implements GPT-style concat-and-chunk packing *offsets*: the
corpus is (logically) concatenated in ``doc_id`` order with one EOD token
per document and split into ``seq_len``-token blocks; each document gets
its global token offset and the block span it lands in. The naive
formulation is a running sum over a single global ordering — a
one-partition Window, the canonical scale anti-pattern. This one is the
standard two-pass distributed prefix sum instead:

1. map: per-doc token counts + a coarse order-preserving bucket key;
2. a tiny per-bucket total (map-side-combinable groupBy, one row per
   bucket) gets its own running sum — the only global-order Window runs
   over ``n_docs / bucket_width`` rows, not the corpus;
3. bucket prefixes broadcast back; a Window partitioned by bucket adds
   the within-bucket running sum in parallel across buckets.

So the corpus-sized data shuffles once (24-byte rows, hash-partitioned by
bucket — never the text), and every full-width stage is parallel. At
10^12 docs pick ``bucket_width`` ~2^20 so step 2 stays ~10^6 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .textops import bpe_token_count_of

__all__ = ["seq_pack", "shard_assign", "shard_of"]


def seq_pack(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", seq_len: int = 2048,
             bucket_width: int = 4096) -> DataFrame:
    """Global concat-and-chunk packing offsets per document.

    Returns ``(doc_id, n_tokens, start_offset, end_offset, first_block,
    last_block, n_blocks)`` where ``n_tokens`` counts BPE-ish tokens plus
    one EOD separator, offsets are global token positions in ``doc_id``
    order, and blocks are ``seq_len``-sized training sequences (integer
    division — exact at any offset magnitude, no float rounding).

    Precondition: ``id_col`` is a non-null key (NULL ids have no place in
    a total order; the bucket filter drops such rows explicitly rather
    than packing them at an arbitrary position). NULL ``text_col`` packs
    as an empty document (n_tokens = 1, the EOD alone) — same as ``''``.
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        (bpe_token_count_of(F.coalesce(F.col(text_col), F.lit("")))
         + 1).cast("long").alias("n_tokens"),
        F.expr(f"{id_col} DIV {int(bucket_width)}").alias("bkt"),
    ).where(F.col("bkt").isNotNull())  # join infers this on one branch;
    # stating it on the shared stage keeps both subtrees canonically
    # equal so ReuseExchange can dedup them.
    # Within-bucket running sums first (parallel across buckets). Both the
    # bucket totals and the final join hang off this SAME shuffled stage,
    # so ReuseExchange evaluates the expensive tokenize-and-count scan
    # ONCE — the totals branch reads the shuffle output, not the corpus.
    w_in = (Window.partitionBy("bkt").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    within = d.withColumn(
        "local_prefix",
        F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)).cast("long"))
    # One row per bucket (already partitioned by bkt — no extra shuffle);
    # the only global-order Window runs over n_docs / bucket_width rows.
    # The total is read off the window output (last running sum + last
    # count) rather than re-aggregating ``d``: that keeps this branch's
    # column set identical to the join branch's, so Catalyst's
    # ReuseExchange dedups the two subtrees and the corpus is tokenized
    # exactly once.
    totals = within.groupBy("bkt").agg(
        F.max(F.col("local_prefix") + F.col("n_tokens"))
        .alias("bkt_tokens"))
    w_bkt = (Window.orderBy("bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    prefixes = totals.select(
        "bkt",
        F.coalesce(F.sum("bkt_tokens").over(w_bkt), F.lit(0))
        .cast("long").alias("bkt_prefix"))
    start = F.col("bkt_prefix") + F.col("local_prefix")
    out = (within.join(F.broadcast(prefixes), "bkt")
           .withColumn("start_offset", start.cast("long"))
           .withColumn("end_offset",
                       F.col("start_offset") + F.col("n_tokens"))
           .withColumn("first_block",
                       F.expr(f"start_offset DIV {int(seq_len)}"))
           .withColumn("last_block",
                       F.expr(f"(end_offset - 1) DIV {int(seq_len)}"))
           .withColumn("n_blocks",
                       F.col("last_block") - F.col("first_block") + 1))
    return out.select("doc_id", "n_tokens", "start_offset", "end_offset",
                      "first_block", "last_block", "n_blocks")


def shard_of(id_col: str = "doc_id", n_shards: int = 64) -> Column:
    """Deterministic shard id: md5-derived hash of the document id modulo
    ``n_shards``. A pure function of the id — re-runs, resumes and
    backfills route every document to the same shard (unlike
    ``rand()``-based or partition-index-based assignment), and the md5
    idiom is the shared one (functions/hashutil.py) so the DuckDB twin
    replays it bit-for-bit."""
    from .hashutil import md5_mod
    return md5_mod(F.col(id_col).cast("string"), n_shards)


def shard_assign(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n_shards: int = 64) -> DataFrame:
    """Per-shard balance evidence for the training-shard write: documents
    and characters landing in each of ``n_shards`` hash shards.

    Map-only up to ONE map-side-combinable groupBy on the shard id (at
    most ``n_shards`` rows survive per map task); the write itself would
    be ``docs.withColumn("shard", shard_of(...)).repartition("shard")
    .write.partitionBy("shard")`` — this operator is the skew check you
    run first."""
    return (docs
            .select(shard_of(id_col, n_shards).alias("shard"),
                    F.length(F.col(text_col)).cast("long").alias("n_chars"))
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("n_chars_total")))
