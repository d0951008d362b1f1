"""Embedding-vector operators (similarity search) — JVM-side higher-order
functions over ``array<float>`` columns; no Python in the hot path.

Brute-force cosine top-k is the baseline; the scale path (LSH bucketing)
keys candidates to hash buckets so the join is band-local instead of a full
cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["dot", "l2_norm", "cosine", "brute_force_topk", "lsh_bucket",
           "near_dup_pairs", "lsh_bucketed_topk"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query. The small ``queries`` side is broadcast
    so the corpus never shuffles; per-query ranking is one window."""
    # Norms are computed ONCE per row before the join (n + m sqrt-folds),
    # not per pair (n·m) — the per-pair work is a single dot fold. Same
    # doubles as dot/(|a|·|b|) computed pairwise, so oracle parity holds.
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"),
                       l2_norm(F.col(vec_col)).alias("q_norm"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"),
                      l2_norm(F.col(vec_col)).alias("c_norm"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            # Rank on a 6-decimal rounding with id tie-break so the ordering
            # is reproducible across engines/float paths.
            F.round(dot(F.col("q_vec"), F.col("c_vec"))
                    / (F.col("q_norm") * F.col("c_norm")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def near_dup_pairs(corpus: DataFrame, threshold: float = 0.9,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, all-pairs baseline).

    Cosine is rounded to 6 decimals *before* the threshold compare so the
    cut is reproducible across engines. This is the correctness baseline;
    at crawl scale use :func:`lsh_bucketed_topk`'s bucket join instead of
    the O(n²) product (candidate generation on the bucket key, then this
    exact cosine only within buckets).

    Norms are precomputed per row (not per pair) — identical doubles,
    ~3× less per-pair work since the dot is the only O(d) fold left."""
    a = corpus.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"),
                      l2_norm(F.col(vec_col)).alias("na"))
    b = corpus.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"),
                      l2_norm(F.col(vec_col)).alias("nb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.round(dot(F.col("va"), F.col("vb"))
                    / (F.col("na") * F.col("nb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= F.lit(threshold))
    )


def lsh_bucketed_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                      n_bits: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Approximate NN: join queries to corpus rows in the SAME LSH bucket
    only, then exact-cosine rank within the bucket. The bucket id is a key,
    so this is a shuffle-on-key equi-join — the 100 TB path where the
    brute-force cross product is impossible. Recall < 1.0 by construction
    (driver records rows-only for this query)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"),
                       lsh_bucket(F.col(vec_col), n_bits).alias("bucket"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"),
                      lsh_bucket(F.col(vec_col), n_bits).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
                .alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def lsh_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Sign-random-projection LSH bucket id (deterministic hyperplanes:
    hyperplane j weights component i by cos(i*j+j) — fixed, seedless).
    Same-bucket vectors are near-duplicate candidates; the bucket key makes
    ANN a shuffle-on-bucket join instead of a cross product."""
    idx = F.transform(vec, lambda x, i: i)
    bits = []
    for j in range(n_bits):
        proj = F.aggregate(
            F.zip_with(vec, idx,
                       lambda x, i: x.cast("double") * F.cos(i * F.lit(float(j + 1)) + F.lit(float(j + 1)))),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
