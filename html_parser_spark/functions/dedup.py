"""Near-duplicate detection operators for the training-data pipeline.

All four families a 100 TB crawl-dedup stage needs, each JVM-side
(``pyspark.sql.functions`` only — WholeStageCodegen, no Python in the hot
path) and each with an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql``:

- **exact**      — md5 fingerprint groupBy (textops.doc_fingerprint)
- **MinHash+LSH**— char-shingles → k md5-min signatures → banded keys →
  bucket self-join for candidate pairs (the classic shingle→minhash→band→
  bucket-join pipeline; only same-band docs ever meet, so the join is
  band-local instead of all-pairs)
- **SimHash**    — per-token md5 bit votes → 16-bit fingerprint; duplicates
  collide on the integer value (groupBy, no join at all)
- **n-gram Jaccard** — exact set overlap for pairs sharing a rare shingle
  (document-frequency cap keeps the shingle self-join from exploding on
  boilerplate shingles — the standard scale guard)

Scale notes (100 TB): MinHash bands and SimHash values are *keys*, so both
dedups are shuffle-on-key with map-side partial aggregation — no cross
product anywhere. The md5 hash family is used (not xxhash64) because both
Spark and DuckDB implement identical md5, which lets the driver value-hash
the results; swap in xxhash64 for production speed without changing shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textops import char_shingles

__all__ = [
    "minhash_signature", "minhash_bands", "minhash_lsh_pairs",
    "simhash16", "jaccard_pairs",
]

K_HASHES = 16       # minhash signature length
N_BANDS = 4         # LSH bands (4 rows per band)
ROWS_PER_BAND = K_HASHES // N_BANDS


def _h(seed: Column, s: Column) -> Column:
    """Seeded string hash shared verbatim with the SQL oracle."""
    return F.md5(F.encode(F.concat(seed.cast("string"), F.lit(":"), s), "utf-8"))


def minhash_signature(col: str = "text", k: int = K_HASHES) -> Column:
    """k-permutation MinHash signature: sig[j] = min over shingles of
    md5(j ':' shingle). min over lowercase-hex strings is order-identical
    in Spark and DuckDB, so signatures match byte-for-byte."""
    shingles = char_shingles(col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.array_min(F.transform(shingles, lambda s: _h(j, s))),
    )


def minhash_bands(sig: Column, n_bands: int = N_BANDS,
                  rows: int = ROWS_PER_BAND) -> Column:
    """Band keys: band b hashes signature rows [b*rows, b*rows+rows)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(F.encode(
            F.concat_ws("|", F.slice(sig, b * rows + 1, rows)), "utf-8")),
    )


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, with the estimated
    Jaccard (= fraction of matching signature rows) per pair.

    Plan shape: one projection computes sig+bands, posexplode to
    (band_id, band_key), self-join on the band key (hash join, band-local),
    distinct pairs, then one more join back to signatures for the estimate.
    At cluster scale every step shuffles on a key — never all-pairs.
    """
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(text_col).alias("sig"),
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(minhash_bands(F.col("sig"))).alias("band_id", "band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            (matches.cast("double") / F.lit(float(K_HASHES)))
            .alias("est_jaccard"),
        )
    )


def simhash16(col: str = "text") -> Column:
    """16-bit SimHash over distinct lowercase word tokens.

    Bit b votes +1 when hex digit b of md5(token) is in [8,f] (its high bit),
    else -1; the fingerprint bit is the majority sign. Near-identical token
    sets collide on the integer, so near-dedup is a plain groupBy — the
    cheapest possible shuffle (map-side combinable), no pair join at all.
    """
    tokens = F.array_distinct(
        F.regexp_extract_all(F.lower(F.col(col)), F.lit(r"\w+"), F.lit(0)))
    n = F.size(tokens)

    def bit_vote(b: int):
        # One-arg lambda via closure: a `lambda t, b=b` two-arg signature
        # would be treated by Spark as an (element, index) lambda.
        return lambda t: F.contains(
            F.lit("89abcdef"),
            F.substring(F.md5(F.encode(t, "utf-8")), b, 1))

    out = F.lit(0)
    for b in range(1, 17):
        pos = F.size(F.filter(tokens, bit_vote(b)))
        out = out + F.when(pos * 2 >= n, F.lit(1 << (b - 1))).otherwise(F.lit(0))
    return out


def jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_df: int = 50,
                  min_jaccard: float = 0.1) -> DataFrame:
    """Exact n-gram (char-shingle) Jaccard for pairs sharing ≥1 *rare*
    shingle. Shingles seen in more than ``max_df`` docs are dropped before
    the self-join (boilerplate guard): without it one hot shingle in d docs
    creates d² join rows — the classic skew bomb at crawl scale. The
    document-frequency filter is itself a broadcastable aggregate."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(char_shingles(text_col)).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = sh.groupBy("sh").agg(F.countDistinct("doc_id").alias("df")) \
             .where(F.col("df") <= max_df).select("sh")
    sh_r = sh.join(F.broadcast(rare), "sh")
    a = sh_r.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh_r.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, ["sh"]).where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("n_common").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6)
            .alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(min_jaccard))
    )
