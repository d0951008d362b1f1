"""Semantic invariants for the training-output shaping operators
(functions/packing.py, textops.tfidf_top_terms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from html_parser_spark.functions import packing, textops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # NOT .cache()d: the session-wide cache manager would substitute
    # InMemoryTableScan into every later test's plan over this path
    # (test_plans' ReusedExchange pin would see cached scans instead).
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_seq_pack_offsets_are_contiguous(spark, docs):
    rows = sorted(packing.seq_pack(docs).collect(),
                  key=lambda r: r.doc_id)
    pos = 0
    for r in rows:
        assert r.start_offset == pos
        assert r.end_offset == pos + r.n_tokens
        assert r.n_tokens >= 1  # EOD separator always counts
        assert r.first_block == r.start_offset // 2048
        assert r.last_block == (r.end_offset - 1) // 2048
        assert r.n_blocks == r.last_block - r.first_block + 1
        pos = r.end_offset


def test_seq_pack_bucket_width_invariance(spark, docs):
    """The two-pass prefix sum is an implementation detail: any bucket
    width yields the identical packing."""
    a = {r.doc_id: r for r in packing.seq_pack(docs, bucket_width=7).collect()}
    b = {r.doc_id: r for r in packing.seq_pack(docs, bucket_width=4096).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]


def test_seq_pack_covers_every_token_once(spark, docs):
    out = packing.seq_pack(docs)
    agg = out.agg(F.sum("n_tokens").alias("s"),
                  F.max("end_offset").alias("m")).collect()[0]
    assert agg.s == agg.m  # concatenation has no gaps or overlaps


def test_shard_assign_is_total_and_deterministic(spark, docs):
    stats = packing.shard_assign(docs, n_shards=16).collect()
    assert sum(r.n_docs for r in stats) == docs.count()
    assert all(0 <= r.shard < 16 for r in stats)
    again = packing.shard_assign(docs, n_shards=16).collect()
    assert sorted(map(tuple, stats)) == sorted(map(tuple, again))


def test_tfidf_rank_and_score_semantics(spark, docs):
    import math
    out = textops.tfidf_top_terms(docs, k=3)
    n = docs.count()
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert 1 <= r.rank <= 3
        assert r.score == round(r.tf * math.log(n / r.df), 6)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.rank)
        # ranks are dense from 1 and scores non-increasing
        assert [r.rank for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        scores = [r.score for r in doc_rows]
        assert scores == sorted(scores, reverse=True)


def test_seq_pack_null_text_packs_as_empty_doc(spark):
    rows = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in packing.seq_pack(rows).collect()}
    assert out[2].n_tokens == 1 and out[3].n_tokens == 1  # EOD alone
    assert out[2].start_offset == out[1].end_offset


def test_length_histogram_null_and_empty_bucket_minus1(spark):
    from html_parser_spark.functions import corpusstats
    rows = spark.createDataFrame(
        [(1, None), (2, ""), (3, "abcd")], "doc_id long, text string")
    hist = {r.bucket: r for r in
            corpusstats.length_histogram(rows).collect()}
    assert hist[-1].n_docs == 2 and hist[-1].lo_chars == 0
    assert hist[2].n_docs == 1 and hist[2].lo_chars == 4
