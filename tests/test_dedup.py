"""Semantics tests for the near-dup family (functions/dedup.py, vecops):
controlled corpora with known duplicates — planted near-dups must surface,
unrelated docs must not pair."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from html_parser_spark.functions import dedup, vecops

BASE = ("the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the tall mountains and the river flows gently "
        "through the quiet green valley toward the distant sea")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                   # exact dup of 0
        (2, BASE.replace("quick", "rapid")),         # near dup of 0
        (3, "completely different content about spark jobs and parquet "
            "files with arrow batches and shuffle partitions everywhere"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_exact_dup_pairs(docs):
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard
             for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert pairs.get((0, 1)) == 1.0          # identical → full signature match
    assert (0, 3) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_near_dup_detected(docs):
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard
             for r in dedup.minhash_lsh_pairs(docs).collect()}
    # one-word edit shares most shingles → banded LSH must catch it
    assert pairs.get((0, 2), 0.0) >= 0.5


def test_simhash_identical_and_distinct(spark, docs):
    got = {r.doc_id: r.simhash
           for r in docs.select("doc_id",
                                dedup.simhash16("text").alias("simhash")).collect()}
    assert got[0] == got[1]
    assert got[0] != got[3]
    assert 0 <= got[0] < 2 ** 16
    # pure-python twin of the bit rule for doc 3 (distinct lowercase \w+ tokens)
    import re
    toks = sorted(set(re.findall(r"\w+", docs.collect()[3].text.lower())))
    expect = 0
    for b in range(16):
        votes = sum(1 for t in toks
                    if hashlib.md5(t.encode()).hexdigest()[b] in "89abcdef")
        if 2 * votes >= len(toks):
            expect |= 1 << b
    assert got[3] == expect


def _simhash64_py(text: str) -> int:
    """Pure-python twin of dedup.simhash64 (unsigned 64-bit value)."""
    import re
    toks = set(re.findall(r"\w+", text.lower()))
    sig = 0
    for b in range(64):
        hx = (lambda t: hashlib.md5(t.encode()).hexdigest()
              + hashlib.md5(b"x" + t.encode()).hexdigest())
        votes = sum(1 for t in toks if hx(t)[b] in "89abcdef")
        if 2 * votes >= len(toks):
            sig |= 1 << b
    return sig


def test_simhash64_matches_python_twin(spark, docs):
    got = {r.doc_id: r.s & ((1 << 64) - 1) for r in docs.select(
        "doc_id", dedup.simhash64("text").alias("s")).collect()}
    expect = {r.doc_id: _simhash64_py(r.text) for r in docs.collect()}
    assert got == expect
    assert got[0] == got[1] and got[0] != got[3]


def test_simhash_pairs_banded_hamming(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0          # identical docs: distance 0
    # pure-python ground truth: every pair within the radius, no more
    sigs = {r.doc_id: _simhash64_py(r.text) for r in docs.collect()}
    expect = {(a, b): bin(sigs[a] ^ sigs[b]).count("1")
              for a in sigs for b in sigs if a < b
              and bin(sigs[a] ^ sigs[b]).count("1") <= 3}
    assert pairs == expect


def test_simhash_pairs_rejects_wide_radius(docs):
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_pairs(docs, max_hamming=4)
    with pytest.raises(ValueError, match="emit"):
        dedup.simhash_pairs(docs, emit="clusters")


def test_simhash_members_linear_on_planted_cluster(spark):
    """emit='members' on a planted 1k-duplicate cluster: 999 (rep, member)
    rows — linear — where pairs mode would emit ~499,500; edges between
    near signatures connect the two representatives, once."""
    rows = [(i, "the same boilerplate page text repeated")
            for i in range(1000)]
    rows += [(2000, "an entirely different document about gardens and "
                    "walls and weather patterns in autumn"),
             (2001, "unrelated third text mentioning ships harbors and "
                    "cargo manifests of the northern trade")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    mem = dedup.simhash_pairs(docs, emit="members").collect()
    cluster = [(r.representative, r.member) for r in mem if r.hamming == 0]
    assert sorted(cluster) == [(0, i) for i in range(1, 1000)]
    # near-signature edges (if any) link representatives only — never a
    # non-representative member of the big cluster
    for r in mem:
        if r.hamming > 0:
            assert r.representative in (0, 2000, 2001)
            assert r.member in (0, 2000, 2001)
    # members output is linear: n - n_sigs + n_edges, nowhere near d²
    assert len(mem) < 1100


def test_simhash_members_consistent_with_pairs(spark, docs):
    """On the shared fixture, members mode must reproduce pairs mode's
    connectivity: same-signature docs attach to the min-id representative
    and representative edges mirror the near-signature pairs."""
    pairs = dedup.simhash_pairs(docs, max_hamming=3).collect()
    mem = dedup.simhash_pairs(docs, max_hamming=3, emit="members").collect()
    sigs = {r.doc_id: _simhash64_py(r.text) for r in docs.collect()}
    reps = {}
    for d, s in sigs.items():
        reps[s] = min(reps.get(s, d), d)
    expect_within = {(reps[s], d) for d, s in sigs.items() if reps[s] != d}
    expect_edges = {(min(reps[sa], reps[sb]), max(reps[sa], reps[sb]),
                     bin(sa ^ sb).count("1"))
                    for sa in set(sigs.values()) for sb in set(sigs.values())
                    if sa < sb and bin(sa ^ sb).count("1") <= 3}
    got_within = {(r.representative, r.member)
                  for r in mem if r.hamming == 0}
    got_edges = {(r.representative, r.member, r.hamming)
                 for r in mem if r.hamming > 0}
    assert got_within == expect_within
    assert got_edges == expect_edges
    assert pairs  # fixture sanity: pairs mode found the planted dup


def test_simhash64_table_equals_column_form(spark, docs):
    """The codegen-friendly explode+SUM shape must be value-identical to
    the HOF Column form — including the empty-doc all-bits case."""
    withempty = docs.union(spark.createDataFrame([(9, "")],
                                                 ["doc_id", "text"]))
    a = {r.doc_id: r.sig for r in withempty.select(
        "doc_id", dedup.simhash64("text").alias("sig")).collect()}
    b = {r.doc_id: r.sig for r in
         dedup.simhash64_table(withempty).collect()}
    assert a == b
    assert a[9] == -1  # no tokens -> every vote 0*2 >= 0 -> all 64 bits


def test_jaccard_pairs_values(docs):
    rows = {(r.doc_a, r.doc_b): r.jaccard
            for r in dedup.jaccard_pairs(docs, max_df=10).collect()}
    assert rows[(0, 1)] == 1.0
    assert 0.3 <= rows[(0, 2)] < 1.0
    assert not any(3 in p for p in rows)


def test_embedding_near_dup_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # ~same direction as 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (3, [0.0, 0.0, 0.7, 0.7]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
               .select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    pairs = {(r.doc_a, r.doc_b) for r in vecops.near_dup_pairs(emb, 0.9).collect()}
    assert pairs == {(0, 1)}


def test_lsh_bucketed_topk_subset_of_exact(spark):
    import random
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
               .select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    q = emb.where(F.col("vec_id") < 3)
    approx = vecops.lsh_bucketed_topk(q, emb, k=5).collect()
    # every returned neighbor shares the query's bucket and is ranked 1..k
    assert all(1 <= r.rank <= 5 for r in approx)
    exact = {(r.query_id, r.neighbor_id)
             for r in vecops.brute_force_topk(q, emb, k=60).collect()}
    assert all((r.query_id, r.neighbor_id) in exact for r in approx)


def test_langid_five_languages(spark):
    from html_parser_spark.functions import textops
    rows = [
        (0, "the cat and the dog went to the house with food"),
        (1, "el perro y la casa de los vecinos para una fiesta"),
        (2, "les enfants sont dans une maison et le jardin pour jouer"),
        (3, "der hund und die katze ist nicht mit von dem haus"),
        (4, "um gato com mais brinquedos por aqui mas seu dono os tem"),
        (5, ""),                                   # all-zero → en
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.lang for r in
           df.select("doc_id", textops.langid("text").alias("lang")).collect()}
    assert got == {0: "en", 1: "es", 2: "fr", 3: "de", 4: "pt", 5: "en"}


def _planted_cluster_embeddings(spark, n_clusters=50, per_cluster=10,
                                dim=64, noise=0.15):
    """Deterministic clustered corpus: LSH recall guarantees are stated
    over data with neighbor structure; the sf* embeddings are isotropic
    random vectors (p99 pairwise cosine ≈ 0.29), where no sublinear
    candidate scheme can approach exact recall — so the recall contract
    is pinned on planted clusters and only the monotone improvement is
    pinned on the isotropic set."""
    import numpy as np
    rng = np.random.RandomState(42)
    centers = rng.randn(n_clusters, dim)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + noise * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_lsh_multiprobe_recall_planted_clusters(spark):
    """VERDICT r4 task 5: multi-probe LSH (single-bit flips ordered by
    boundary distance) must hold recall@5 ≥ 0.8 against the exact
    brute-force ranking on clustered data at n_probes=4."""
    emb = _planted_cluster_embeddings(spark)
    q = emb.where(F.col("vec_id") % 10 == 0).where(F.col("vec_id") < 200)
    exact = {(r.query_id, r.neighbor_id)
             for r in vecops.brute_force_topk(q, emb, k=5).collect()}
    single = {(r.query_id, r.neighbor_id)
              for r in vecops.lsh_bucketed_topk(q, emb, k=5).collect()}
    multi = {(r.query_id, r.neighbor_id)
             for r in vecops.lsh_bucketed_topk(
                 q, emb, k=5, n_probes=4).collect()}
    r1 = len(single & exact) / len(exact)
    r4 = len(multi & exact) / len(exact)
    assert r4 >= 0.8, f"multi-probe recall@5 = {r4:.2f}"
    assert r4 >= r1, f"probing must not lose recall: {r1:.2f} -> {r4:.2f}"


def test_lsh_multiprobe_monotone_on_isotropic(spark):
    """On the isotropic sf0.001 embeddings recall is structurally low for
    ANY bucket scheme; the pinnable property is that probing neighbor
    buckets never loses candidates and the result stays a subset of the
    exact candidates with correct ranks."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in vecops.brute_force_topk(q, emb, k=5).collect()}
    r_prev = -1.0
    for npb in (1, 4, 9):
        got = vecops.lsh_bucketed_topk(q, emb, k=5, n_probes=npb).collect()
        assert all(1 <= r.rank <= 5 for r in got)
        rec = (len({(r.query_id, r.neighbor_id) for r in got} & exact)
               / len(exact))
        assert rec >= r_prev, f"recall fell {r_prev:.2f}->{rec:.2f} @ {npb}"
        r_prev = rec


def test_lsh_shuffle_join_matches_broadcast_results(spark):
    """The size-thresholded non-broadcast path (VERDICT r4 task 6) must
    return the identical result set — only the join strategy changes."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    bcast = {(r.query_id, r.neighbor_id, r.rank)
             for r in vecops.lsh_bucketed_topk(
                 q, emb, k=5, broadcast_queries=True).collect()}
    shuf = {(r.query_id, r.neighbor_id, r.rank)
            for r in vecops.lsh_bucketed_topk(
                q, emb, k=5, broadcast_queries=False).collect()}
    auto = {(r.query_id, r.neighbor_id, r.rank)
            for r in vecops.lsh_bucketed_topk(
                q, emb, k=5, broadcast_threshold=3).collect()}
    assert bcast == shuf == auto


def test_ivf_recall_vs_exact(spark):
    """k-means IVF with n_probe=4/16 cells must keep recall@5 ≥ 0.8 against
    the exact ranking on the real sf0.001 embeddings (VERDICT r1 task 7)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id)
             for r in vecops.brute_force_topk(q, emb, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in vecops.ivf_topk(q, emb, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"recall@5 = {recall:.2f}"


def test_near_dup_block_count_scales_with_input():
    assert vecops._n_blocks(500, 8192) == 16          # small → floor
    assert vecops._n_blocks(1_000_000, 8192) == 123   # grows with n
    assert vecops._n_blocks(10**9, 8192) == 122071    # bounded block rows
    # block row payload stays ≤ rows_per_block vectors at any scale
    for n in (10**4, 10**6, 10**9):
        assert -(-n // vecops._n_blocks(n, 8192)) <= 8192


def test_near_dup_caller_count_avoids_extra_job(spark):
    """With n_rows supplied, building the pairs plan must launch ZERO jobs
    (without it, corpus.count() re-executes derived lineage at call time —
    VERDICT r3 item 6), and the supplied count must give the same pairs."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    derived = emb.where(F.col("vec_id") >= 0)   # non-trivial lineage
    sc = spark.sparkContext
    sc.setJobGroup("near-dup-lazy", "plan build must be lazy")
    try:
        lazy = vecops.near_dup_pairs(derived, 0.35, n_rows=500)
    finally:
        sc.setJobGroup(None, None)
    assert sc.statusTracker().getJobIdsForGroup("near-dup-lazy") == []
    a = {(r.doc_a, r.doc_b, r.cos_sim)
         for r in vecops.near_dup_pairs(emb, 0.35).collect()}
    b = {(r.doc_a, r.doc_b, r.cos_sim) for r in lazy.collect()}
    assert a == b and a


def test_near_dup_invariant_under_block_size(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {(r.doc_a, r.doc_b, r.cos_sim)
         for r in vecops.near_dup_pairs(emb, 0.35).collect()}
    b = {(r.doc_a, r.doc_b, r.cos_sim)
         for r in vecops.near_dup_pairs(emb, 0.35, rows_per_block=25).collect()}
    assert a == b and a


def test_ivf_topk_probes_cells_and_ranks(spark):
    import random
    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
               .select("vec_id",
                       F.col("embedding").cast("array<float>").alias("embedding"))
    q = emb.where(F.col("vec_id").isin(40, 41))
    approx = vecops.ivf_topk(q, emb, k=5, n_cells=8, n_probe=3).collect()
    assert approx, "IVF returned no neighbors"
    assert all(1 <= r.rank <= 5 for r in approx)
    assert all(r.neighbor_id != r.query_id for r in approx)
    # ranks are dense per query starting at 1
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # every returned pair exists in the exact ranking (IVF cosines are
    # exact; only the candidate set is approximate)
    exact = {(r.query_id, r.neighbor_id)
             for r in vecops.brute_force_topk(q, emb, k=80).collect()}
    assert all((r.query_id, r.neighbor_id) in exact for r in approx)


def test_repetition_signals_ground_truth(spark):
    from html_parser_spark.functions import textops
    rows = [(0, "a b a b a b"),   # heavy repetition
            (1, "x"),             # single token: no n-grams
            (2, "w1 w2 w3 w4")]   # all distinct
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.rep_2gram_frac, r.rep_3gram_frac, r.top_token_frac)
           for r in textops.repetition_signals(df).collect()}
    # doc 0: 2-grams [ab,ba,ab,ba,ab] -> 1-2/5; 3-grams [aba,bab,...] -> 1-2/4
    assert got[0] == (0.6, 0.5, 0.5)
    assert got[1] == (0.0, 0.0, 1.0)
    assert got[2] == (0.0, 0.0, 0.25)


def test_sessionize_events_ground_truth(spark):
    """Gap sessionization: 30-min gap splits; ties broken by event_id."""
    from datetime import datetime as DT
    from html_parser_spark.functions import eventops
    rows = [
        (1, DT(2024, 1, 1, 10, 0), 7, "view", 1.0),
        (2, DT(2024, 1, 1, 10, 20), 7, "click", 2.0),   # gap 20m: same
        (3, DT(2024, 1, 1, 11, 0), 7, "view", 3.0),     # gap 40m: new
        (4, DT(2024, 1, 1, 10, 5), 8, "view", 5.0),     # other user
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"])
    got = {(r.user_id, r.session_no): (r.n_events, r.sum_value)
           for r in eventops.sessionize_events(ev).collect()}
    assert got == {(7, 1): (2, 3.0), (7, 2): (1, 3.0), (8, 1): (1, 5.0)}


def test_windowed_type_counts_ground_truth(spark):
    from datetime import datetime as DT
    from html_parser_spark.functions import eventops
    rows = [
        (1, DT(2024, 1, 1, 10, 5), 7, "view", 1.0),
        (2, DT(2024, 1, 1, 10, 55), 7, "view", 2.0),
        (3, DT(2024, 1, 1, 11, 1), 7, "view", 4.0),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"])
    got = {(r.window_start.hour, r.event_type): (r.n_events, r.sum_value)
           for r in eventops.windowed_type_counts(ev).collect()}
    assert got == {(10, "view"): (2, 3.0), (11, "view"): (1, 4.0)}


# Larger slice than the suite-wide sf0.001: the ~rate assertion below needs
# a few hundred docs to be stable.
SF_DOCS_001 = "/root/testdata/sf0.01/documents.parquet"


def test_hash_sample_deterministic_and_stratified(spark):
    from html_parser_spark.functions import textops
    docs = spark.read.parquet(SF_DOCS_001)
    a = textops.hash_sample(docs, {"en": 0.5, "zh": 0.0}, key_col="lang")
    b = textops.hash_sample(docs, {"en": 0.5, "zh": 0.0}, key_col="lang")
    ra = sorted(r.doc_id for r in a.collect())
    assert ra == sorted(r.doc_id for r in b.collect())  # reproducible
    by_lang = {r.lang: r.cnt for r in
               a.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    tot = {r.lang: r.cnt for r in
           docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert by_lang.get("zh", 0) == 0                    # rate 0 drops all
    assert by_lang["fr"] == tot["fr"]                   # unlisted keeps all
    assert 0.3 < by_lang["en"] / tot["en"] < 0.7        # ~rate 0.5
    # membership is a pure function of doc_id: a filtered re-run selects
    # the same surviving ids (resume/backfill property)
    c = textops.hash_sample(docs.where(F.col("doc_id") % 2 == 0),
                            {"en": 0.5, "zh": 0.0}, key_col="lang")
    assert {r.doc_id for r in c.collect()} == {i for i in ra if i % 2 == 0}


def test_contamination_flags_ground_truth(spark):
    from html_parser_spark.functions import textops
    rows = [(0, "A" * 40), (1, "A" * 40), (2, "B" * 40),
            (3, "A" * 16 + "C" * 24)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    probes = docs.where(F.col("doc_id") == 0)
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in textops.contamination_flags(docs, probes).collect()}
    assert got[0][1] and got[1] == got[0]      # probe + its exact dup hit
    assert got[2] == (0, False)                # disjoint text clean
    assert got[3][0] >= 1 and got[3][1]        # shared 16-char prefix hits


def test_repetition_signals_matches_python_twin_fuzz(spark):
    """Seeded fuzz vs a pure-python twin over 60 random token soups,
    incl. empty, punctuation-only and non-ASCII rows (Java/RE2 \\w is
    ASCII-only — the twin uses the equivalent explicit class)."""
    import random
    import re
    from html_parser_spark.functions import textops
    rng = random.Random(123)
    vocab = ["aa", "bb", "cc", "Δδ", "x1", "_u", "N7", "aa"]
    rows = []
    for i in range(60):
        n = rng.randint(0, 12)
        text = (" ".join(rng.choice(vocab) for _ in range(n)) if n
                else ("" if i % 2 else "!!! ??? ..."))
        rows.append((i, text))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.rep_2gram_frac, r.rep_3gram_frac, r.top_token_frac)
           for r in textops.repetition_signals(df).collect()}
    for i, t in rows:
        toks = re.findall(r"[a-zA-Z0-9_]+", t.lower())

        def frac(n, toks=toks):
            grams = ([" ".join(toks[j:j + n])
                      for j in range(len(toks) - n + 1)]
                     if len(toks) >= n else [])
            return (round(1 - len(set(grams)) / len(grams), 6)
                    if grams else 0.0)

        top = (round(max(toks.count(x) for x in set(toks)) / len(toks), 6)
               if toks else 0.0)
        assert got[i] == (frac(2), frac(3), top), (i, t)


def test_zero_vector_never_ranks_first(spark):
    """A zero embedding must score cos 0.0, not NaN (which desc-sorts
    above every real similarity) — across brute-force, LSH, IVF, and the
    blocked near-dup kernel."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),     # zero vector
            (3, [0.0, 1.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
               .select("vec_id",
                       F.col("embedding").cast("array<float>")
                       .alias("embedding"))
    q = emb.where(F.col("vec_id") == 0)
    bf = vecops.brute_force_topk(q, emb, k=3).collect()
    assert [r.neighbor_id for r in bf if r.rank == 1] == [1]
    z = [r for r in bf if r.neighbor_id == 2]
    assert z and z[0].cos_sim == 0.0
    nd = {(r.doc_a, r.doc_b) for r in
          vecops.near_dup_pairs(emb, 0.5).collect()}
    assert nd == {(0, 1)}  # zero vector pairs with nothing


def test_dedup_clusters_transitive_closure(spark, docs):
    """A~B and B~C must land in ONE cluster with ONE keeper even if the
    A~C edge was never emitted — the reason pairs alone are not a dedup."""
    out = {r.doc_id: r for r in
           dedup.dedup_clusters(docs, min_est_jaccard=0.5).collect()}
    assert len(out) == 4                       # one row per input doc
    # docs 0/1/2 form one component (0-1 exact, 0-2 near), 3 a singleton
    assert out[0].cluster_id == out[1].cluster_id == out[2].cluster_id == 0
    assert out[0].cluster_size == 3
    assert (out[0].is_keeper, out[1].is_keeper, out[2].is_keeper) == (
        True, False, False)
    assert out[3].cluster_id == 3 and out[3].cluster_size == 1
    assert out[3].is_keeper


def test_dedup_clusters_chain_pointer_jumping(spark):
    """Worst-case diameter: a 20-node path converges to a single component
    within max_iter thanks to pointer jumping (min-prop alone would need
    19 rounds)."""
    nodes = spark.range(20).select(F.col("id").alias("doc_id"),
                                   F.lit("x").alias("text"))
    edges = spark.createDataFrame([(i, i + 1) for i in range(19)],
                                  "doc_a long, doc_b long")
    out = dedup.dedup_clusters(nodes, edges=edges, max_iter=8).collect()
    assert all(r.cluster_id == 0 and r.cluster_size == 20 for r in out)
    assert sum(r.is_keeper for r in out) == 1


def test_dedup_clusters_external_edges_source(spark, docs):
    """The edges parameter clusters any pair family's output — here the
    simhash_pairs edges instead of the default MinHash derivation."""
    edges = dedup.simhash_pairs(docs, max_hamming=3)
    out = {r.doc_id: r for r in
           dedup.dedup_clusters(docs, edges=edges).collect()}
    assert out[0].cluster_id == out[1].cluster_id   # exact dups collapse
    assert out[3].cluster_size == 1


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    """C4-style rule: a line in >= min_docs distinct docs vanishes from
    every doc; short lines and unique lines survive; a doc reduced to
    nothing keeps its row with clean_text=''."""
    footer = "subscribe to our newsletter today"
    rows = [
        (0, f"unique opening line\n{footer}\nok"),       # 'ok' < 4 chars
        (1, f"another distinct line\n{footer}"),
        (2, footer),                                     # only boilerplate
        (3, None),                                       # fetch-failed doc
        # footer twice in ONE doc elsewhere must not count as 2 docs:
        (4, "solo doc line\nrepeated inside\nrepeated inside"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.line_dedup(docs).collect()}
    assert len(out) == 5                                 # null-text row kept
    assert out[0].clean_text == "unique opening line\nok"
    assert out[0].n_lines == 3 and out[0].n_kept == 2
    assert out[1].clean_text == "another distinct line"
    assert out[2].clean_text == "" and out[2].n_kept == 0
    assert out[3].clean_text == "" and out[3].n_lines == 1
    # within-doc repetition alone is NOT cross-doc boilerplate
    assert out[4].n_kept == 3


def test_line_dedup_min_chars_guard(spark):
    """Structural short lines (bullets, blanks) are never removed even
    when they repeat across every doc."""
    docs = spark.createDataFrame(
        [(i, "-\n\nlong shared content line") for i in range(3)],
        "doc_id long, text string")
    out = dedup.line_dedup(docs, min_docs=2).collect()
    assert all(r.clean_text == "-\n" and r.n_kept == 2 for r in out)


def test_dup_span_stats_ground_truth(spark):
    """ExactSubstr detection: a 5-token span shared by two docs marks the
    matching windows in BOTH; a within-doc repeat also counts (the paper
    hashes spans corpus-wide, not per-pair); short docs keep their row
    with zero windows."""
    span = "alpha beta gamma delta epsilon"
    rows = [
        (0, f"intro words here {span} trailing bits"),
        (1, f"{span} totally different ending material"),
        (2, f"{span} filler {span}"),            # within-doc repeat
        (3, "too short"),                        # < width tokens
        (4, "one two three four five six seven"),  # unique spans only
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           dedup.dup_span_stats(docs, width=5).collect()}
    assert len(out) == 5
    # doc 0: 10 tokens → 6 windows, exactly one is the shared span
    assert out[0].n_windows == 6 and out[0].n_dup_windows == 1
    assert out[0].dup_frac == 0.166667
    assert out[1].n_dup_windows == 1
    # doc 2: 11 tokens → 7 windows; the two exact-span copies are dups
    assert out[2].n_windows == 7 and out[2].n_dup_windows == 2
    assert out[3].n_windows == 0 and out[3].dup_frac == 0.0
    assert out[4].n_dup_windows == 0


def test_ngram_counts_ground_truth(spark):
    """Bigram vocabulary counts: occurrences (not doc frequency), HAVING
    min_count, sub-n docs contribute nothing."""
    from html_parser_spark.functions import textops
    docs = spark.createDataFrame(
        [(0, "big data big data"), (1, "big data pipeline"), (2, "big")],
        "doc_id long, text string")
    out = {r.gram: r.n_occurrences for r in
           textops.ngram_counts(docs, n=2, min_count=2).collect()}
    # 'big data' occurs 2x in doc 0 (overlapping windows) + 1x in doc 1
    assert out == {"big data": 3, "data big": 1} or out == {"big data": 3}
    assert out["big data"] == 3 and "data pipeline" not in out


def test_lsh_bucket_assignment_tolerates_null_and_ragged_vectors(spark):
    """A NULL or wrong-dimension embedding must not kill the ANN job: the
    HOF form gives such rows a NULL bucket (silently un-joinable), so the
    Arrow kernel drops them — same result, no task failure."""
    from html_parser_spark.functions import vecops
    from pyspark.sql import functions as F
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dirty = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 7 == 0, F.lit(None))
         .when(F.col("vec_id") % 11 == 0, F.expr("slice(embedding, 1, 3)"))
         .otherwise(F.col("embedding")))
    q = dirty.where((F.col("vec_id") < 5) & (F.col("vec_id") % 7 != 0)
                    & (F.col("vec_id") % 11 != 0))
    got = vecops.lsh_bucketed_topk(q, dirty, k=3).collect()
    assert got, "clean query rows must still produce neighbors"
    bad = {int(r.vec_id) for r in dirty.where(
        "embedding IS NULL OR size(embedding) = 3").collect()}
    assert not {int(r.neighbor_id) for r in got} & bad


def test_lsh_bucket_ragged_first_row_keeps_valid_rows(spark):
    """The expected dim is the MODAL size per batch, never the first valid
    vector: a batch whose FIRST row is ragged must keep every well-formed
    row (ADVICE r4 — first-valid inference silently dropped the whole
    batch's good rows when a short vector led it)."""
    from html_parser_spark.functions import vecops
    rows = ([(0, [1.0, 2.0, 3.0])]                       # ragged leader
            + [(i, [float(i + d) for d in range(64)])    # 9 valid 64-dim
               for i in range(1, 10)])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>"
                               ).coalesce(1)
    got = vecops._assign_buckets(df, 8, "vec_id", "embedding",
                                 "out_id", "out_vec", "out_norm").collect()
    assert {int(r.out_id) for r in got} == set(range(1, 10))
    assert all(len(r.out_vec) == 64 for r in got)


def test_mega_cluster_linear_members_and_bounded_cc(spark):
    """Skewed mega-cluster stress (VERDICT r4 task 7): a ~10k-member
    byte-identical duplicate cluster — the worst skew a boilerplate-heavy
    crawl produces — must stay LINEAR end-to-end:

    - ``simhash_pairs(emit='members')`` emits exactly cluster_size - 1
      rows for the cluster (pairs mode would be ~50M rows here; the
      distinct-signature collapse + keyed re-expansion is the contract),
    - ``dedup_clusters`` over those edges converges in ≤ 3 label rounds
      (star edges from a rep converge immediately; pointer jumping
      bounds chains at O(log k)), with per-round shuffle input bounded
      by the symmetrized edge count, not corpus size,
    - the reconstructed cluster is exact: size 10_000, keeper = min id.
    """
    n_dup, n_bg = 10_000, 2_000
    dup_text = ("the same duplicated boilerplate page body repeated "
                "verbatim across the whole crawl partition")
    docs = spark.range(n_dup + n_bg).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_dup, F.lit(dup_text)).otherwise(
            # three unique hex tokens per background doc keep their
            # signatures spread (shared filler words would near-dup them)
            F.concat_ws(" ",
                        F.md5(F.col("id").cast("string")),
                        F.md5((F.col("id") + 1_000_000).cast("string")),
                        F.md5((F.col("id") * 3 + 7).cast("string")))
        ).alias("text"))
    members = dedup.simhash_pairs(docs, emit="members")
    rows = members.collect()
    # Linear contract: the mega-cluster contributes exactly n_dup - 1
    # (rep, member, 0) rows; only signature-level edges may add more.
    cluster_rows = [r for r in rows
                    if r.representative == 0 and r.hamming == 0]
    assert len(cluster_rows) == n_dup - 1
    assert len(rows) < n_dup + n_bg, (
        f"{len(rows)} member rows — not linear in corpus size")

    stats: dict = {}
    clusters = dedup.dedup_clusters(
        docs,
        edges=members.select(F.col("representative").alias("doc_a"),
                             F.col("member").alias("doc_b")),
        stats=stats)
    agg = {(int(r.cluster_id), int(r.cluster_size))
           for r in clusters.where(F.col("doc_id") < n_dup).collect()}
    assert agg == {(0, n_dup)}
    keepers = clusters.where("is_keeper AND cluster_size > 1").collect()
    assert {int(r.doc_id) for r in keepers} >= {0}
    assert stats["rounds"] <= 3, stats
    assert stats["edge_rows"] <= 2 * len(rows), stats
