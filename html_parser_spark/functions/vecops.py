"""Embedding-vector operators (similarity search) — JVM-side higher-order
functions over ``array<float>`` columns; no Python in the hot path.

Brute-force cosine top-k is the baseline; the scale path (LSH bucketing)
keys candidates to hash buckets so the join is band-local instead of a full
cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["dot", "l2_norm", "cosine", "brute_force_topk", "lsh_bucket"]


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
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            # Rank on a 6-decimal rounding with id tie-break so the ordering
            # is reproducible across engines/float paths.
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
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
