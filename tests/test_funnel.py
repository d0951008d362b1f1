"""Semantic checks for the corpus_filter funnel query (composition of
individually-oracled stages; exact parity is pinned by test_entry_oracle)."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_funnel_excludes_probes_and_duplicates(spark):
    kept = {r.doc_id for r in
            E.queries()["corpus_filter"](spark, SF).collect()}
    assert kept, "funnel must keep a non-trivial subset"
    # benchmark probes are contaminated by construction
    assert not (kept & {0, 1, 2, 3, 4})
    # every kept doc is its cluster's canonical keeper
    from html_parser_spark.functions import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keepers = {r.doc_id for r in
               dedup.dedup_clusters(docs, min_est_jaccard=0.5)
               .where("is_keeper").collect()}
    assert kept <= keepers


def test_funnel_applies_quality_floor(spark):
    rows = E.queries()["corpus_filter"](spark, SF).collect()
    assert all(r.quality >= 0.4 for r in rows)
    assert all(r.lang_detected == "en" for r in rows)
