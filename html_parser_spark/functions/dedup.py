"""Near-duplicate detection operators for the training-data pipeline.

All four families a 100 TB crawl-dedup stage needs, each JVM-side
(``pyspark.sql.functions`` only — WholeStageCodegen, no Python in the hot
path) and each with an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql``:

- **exact**      — md5 fingerprint groupBy (textops.doc_fingerprint)
- **MinHash+LSH**— char-shingles → k md5-min signatures → banded keys →
  bucket self-join for candidate pairs (the classic shingle→minhash→band→
  bucket-join pipeline; only same-band docs ever meet, so the join is
  band-local instead of all-pairs)
- **SimHash**    — per-token md5 bit votes → fingerprint; 16-bit variant
  for groupBy-collision dedup demos, 64-bit (``simhash64``) for the
  crawl-scale banded hamming join (16-bit band keys stay selective)
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

from . import cacheutil
from .textops import char_shingles

__all__ = [
    "minhash_signature", "minhash_bands", "minhash_lsh_pairs",
    "simhash16", "simhash64", "simhash64_table", "simhash_pairs",
    "jaccard_pairs", "dedup_clusters", "line_dedup", "dup_span_stats",
]

K_HASHES = 16       # minhash signature length
N_BANDS = 4         # LSH bands (4 rows per band)
ROWS_PER_BAND = K_HASHES // N_BANDS


_M = (1 << 31) - 1  # modulus for the derived permutation hashes


def _shingle_hash(s: Column) -> Column:
    """ONE integer hash per shingle: 60-bit md5 prefix reduced mod M —
    the shared DuckDB-replayable idiom (functions/hashutil.py)."""
    from .hashutil import md5_mod
    return md5_mod(s, _M)


def minhash_signature(col: str = "text", k: int = K_HASHES) -> Column:
    """k-permutation MinHash: sig[j] = min over shingles of the affine
    permutation ((2j+1)·h + 7j+3) mod M of the per-shingle hash h.

    Loop order is inverted on purpose — an element-wise-min `aggregate`
    over shingles with a `zip_with` over j — so the md5 is evaluated ONCE
    per shingle instead of k times: HOF lambdas re-evaluate their free
    sub-expressions on every invocation (Catalyst has no let-binding), so
    the textbook `transform(j, array_min(transform(shingles, …)))` shape
    recomputes the whole shingle-hash array per j. Measured ~10× on the
    sf0.1 bench. Integer arithmetic is exact in both engines, so the SQL
    oracle matches bit-for-bit."""
    hp = F.transform(char_shingles(col), _shingle_hash)
    ks = F.sequence(F.lit(0), F.lit(k - 1)).cast("array<bigint>")
    init = F.array_repeat(F.lit(_M).cast("bigint"), k)
    return F.aggregate(
        hp, init,
        lambda acc, h: F.zip_with(
            acc, ks,
            lambda a, j: F.least(
                a, F.pmod((j * 2 + 1) * h + j * 7 + 3, F.lit(_M)))),
    )


def minhash_bands(sig: Column, n_bands: int = N_BANDS,
                  rows: int = ROWS_PER_BAND) -> Column:
    """Band keys: band b hashes signature rows [b*rows, b*rows+rows)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(F.encode(
            F.concat_ws("|", F.transform(
                F.slice(sig, b * rows + 1, rows),
                lambda x: x.cast("string"))), "utf-8")),
    )


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, with the estimated
    Jaccard (= fraction of matching signature rows) per pair.

    Plan shape: one projection computes sig+bands, posexplode to
    (band_id, band_key, sig), self-join on the band key (hash join,
    band-local; AQE reuses the identical shuffle for both sides), then
    per-pair dedup. Signatures ride through the join, so they are computed
    once per side instead of re-derived by two extra joins — measured ~2×
    on the sf0.1 bench. At cluster scale every step shuffles on a key —
    never all-pairs.
    """
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(text_col).alias("sig"),
    )
    bands = sig.select(
        "doc_id", "sig",
        F.posexplode(minhash_bands(F.col("sig"))).alias("band_id", "band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    matches = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.sig").alias("sig_a"),
                F.col("b.sig").alias("sig_b"))
        .dropDuplicates(["doc_a", "doc_b"])
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


def simhash64(col: str = "text") -> Column:
    """64-bit SimHash over distinct lowercase word tokens — the crawl-scale
    fingerprint (Manku et al., WWW 2007 use 64 bits for 8B documents).

    Per token, the 64 hex digits of ``md5(t) || md5('x'||t)`` supply 64
    independent bit votes (digit in [8,f] = that digit's high bit set →
    vote +1). The token array is hashed ONCE via ``transform`` and the 64
    vote counters accumulate in ONE ``aggregate`` pass over the hash
    strings (``zip_with`` against position 1..64) — the naive per-bit
    ``filter`` shape used by :func:`simhash16` would re-evaluate both md5s
    per token for every bit (128 digests/token; here it is exactly 2).

    Bit 64's weight is ``-2**63`` so the sum stays inside signed int64 —
    identical two's-complement value in Spark and DuckDB, and xor /
    bit_count / shift-mask band extraction all agree on signed values.
    """
    tokens = F.array_distinct(
        F.regexp_extract_all(F.lower(F.col(col)), F.lit(r"\w+"), F.lit(0)))
    n = F.size(tokens)
    hx = F.transform(tokens, lambda t: F.concat(
        F.md5(F.encode(t, "utf-8")),
        F.md5(F.encode(F.concat(F.lit("x"), t), "utf-8"))))
    js = F.sequence(F.lit(1), F.lit(64))
    votes = F.aggregate(
        hx, F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc, js,
            lambda a, j: a + F.when(
                F.contains(F.lit("89abcdef"), F.substring(h, j, F.lit(1))),
                F.lit(1)).otherwise(F.lit(0))))
    weights = F.lit([1 << (b - 1) for b in range(1, 64)] + [-(1 << 63)])
    return F.aggregate(
        F.zip_with(votes, weights,
                   lambda v, w: F.when(v * 2 >= n, w).otherwise(F.lit(0))),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def simhash64_table(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, sig) with sig == :func:`simhash64` — the throughput shape.

    The Column form's HOF ``aggregate``/``zip_with`` allocates a 64-long
    array per token in interpreted expression code (~12 s for 5k docs);
    this formulation explodes distinct tokens and aggregates 64 scalar
    ``SUM(CASE substring(h, b, 1) …)`` vote counters per doc — every
    operator whole-stage-codegen-able, the groupBy map-side combinable
    (measured ~20×). A doc with no tokens gets every vote 2·0 ≥ 0 → all
    bits set → sig = -1, matching the Column form (explode_outer keeps
    the doc; count(t) ignores its null token)."""
    tokens = F.array_distinct(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\w+"),
                             F.lit(0)))
    tok = (docs.select(F.col(id_col).alias("doc_id"),
                       F.explode_outer(tokens).alias("t"))
           .withColumn("h", F.concat(
               F.md5(F.encode(F.col("t"), "utf-8")),
               F.md5(F.encode(F.concat(F.lit("x"), F.col("t")),
                              "utf-8")))))
    aggs = [F.count(F.col("t")).alias("n")]
    for b in range(1, 65):
        aggs.append(F.sum(
            F.when(F.contains(F.lit("89abcdef"),
                              F.substring("h", b, F.lit(1))),
                   F.lit(1)).otherwise(F.lit(0))).alias(f"v{b}"))
    per = tok.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("bigint")
    for b in range(1, 65):
        w = (1 << (b - 1)) if b < 64 else -(1 << 63)
        sig = sig + F.when(
            F.coalesce(F.col(f"v{b}"), F.lit(0)) * 2 >= F.col("n"),
            F.lit(w).cast("bigint")).otherwise(F.lit(0))
    return per.select("doc_id", sig.alias("sig"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  emit: str = "pairs") -> DataFrame:
    """SimHash near-duplicate pairs: banded hamming-distance self-join.

    The 64-bit signature splits into 4 bands of 16 bits; by pigeonhole,
    any pair within ``max_hamming`` ≤ 3 bit flips shares at least one
    unchanged band, so candidates come from a BAND-KEY equi-join (shuffle
    on (band, value) — never an all-pairs product), then the exact
    popcount of the XOR filters to the radius. At crawl scale this is the
    classic Manku et al. (WWW 2007, public method) sharded-table shape:
    4 sorted shards, one per band — and 16-bit band keys (65,536 values)
    keep every bucket selective, unlike a 4-bit banding whose 16 possible
    values would make each bucket hold ~n/16 of the corpus.

    Output contract (``emit``):

    - ``"pairs"`` (default): (doc_a, doc_b, hamming) with doc_a < doc_b,
      distinct — every near-duplicate pair, including the inherently-d²
      within-cluster expansion of a d-document duplicate cluster.
    - ``"members"``: (representative, member, hamming) — the crawl-scale
      contract, LINEAR in corpus size. Each signature's representative is
      its smallest doc_id; every other holder of that signature emits ONE
      (rep, member, 0) row, and each near-signature pair emits ONE
      (rep_a, rep_b, hamming) edge between representatives. Connected
      components over these sparse edges (:func:`dedup_clusters`)
      reconstruct the full clusters; a 1k-duplicate cluster costs 999
      rows here vs ~500k in pairs mode."""
    if emit not in ("pairs", "members"):
        raise ValueError(f"emit={emit!r}: expected 'pairs' or 'members'")
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming}: the 4-band pigeonhole guarantee "
            "only covers radius <= 3; a larger radius would silently miss "
            "pairs. Use more/narrower bands for a wider radius.")
    # Collapse identical fingerprints FIRST (Manku et al. dedup exact
    # fingerprints before the sharded probe): the banded self-join runs on
    # DISTINCT signatures only, so a cluster of d byte-identical documents
    # costs one row in the join instead of d rows per band — without this,
    # boilerplate-heavy corpora make every band bucket quadratic in the
    # duplicate-cluster size. Pairs are then re-expanded through plain
    # keyed JOINS on the signature (members stay one-per-row throughout —
    # no collect_list, so no single row ever holds a whole duplicate
    # cluster), and the join OUTPUT streams rather than materializing in
    # memory. AQE skew-join splits a mega-cluster's partitions; the
    # within-cluster output is inherently d², so at crawl scale one would
    # emit (representative, member) instead — that choice belongs to the
    # output contract, not the join.
    # Materialize the fingerprint table (Manku et al. store it as sorted
    # shards for exactly this reason): five branches below consume it,
    # each pruning different columns, so without a boundary the
    # tokenize-and-vote lineage re-runs per branch (~6 scans measured).
    # 16 bytes/row — a billion-doc corpus is ~16 GB cluster-wide.
    # swap_persist bounds the registry to ONE live copy across calls
    # (a bench or long-lived driver would otherwise accumulate them).
    from html_parser_spark.functions.cacheutil import swap_persist
    sig_tbl = swap_persist("dedup.simhash_pairs.sig_tbl",
                           simhash64_table(docs, id_col, text_col))
    sigs = sig_tbl.select("sig").distinct()
    bands = sigs.select(
        "sig",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("sig", b * 16).bitwiseAND(F.lit(65535))
                     .alias("val"))
            for b in range(4)
        ])).alias("bk"))
    a, b = bands.alias("a"), bands.alias("b")
    sig_pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                        & (F.col("a.sig") < F.col("b.sig")))
                 .select(F.col("a.sig").alias("sig_a"),
                         F.col("b.sig").alias("sig_b"))
                 .dropDuplicates(["sig_a", "sig_b"])
                 .withColumn("hamming", F.bit_count(
                     F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
                 .where(F.col("hamming") <= max_hamming))
    if emit == "members":
        # One combinable groupBy picks each signature's representative;
        # both outputs are keyed joins on the signature — no step touches
        # more than one row per document (linear), no collect_list.
        reps = sig_tbl.groupBy("sig").agg(F.min("doc_id").alias("rep"))
        within = (sig_tbl.join(reps, "sig")
                  .where(F.col("doc_id") != F.col("rep"))
                  .select(F.col("rep").alias("representative"),
                          F.col("doc_id").alias("member"),
                          F.lit(0).alias("hamming")))
        ra = reps.select(F.col("sig").alias("sig_a"),
                         F.col("rep").alias("rep_a"))
        rb = reps.select(F.col("sig").alias("sig_b"),
                         F.col("rep").alias("rep_b"))
        edges = (sig_pairs.join(ra, "sig_a").join(rb, "sig_b")
                 .select(F.least("rep_a", "rep_b").alias("representative"),
                         F.greatest("rep_a", "rep_b").alias("member"),
                         "hamming"))
        return within.unionByName(edges)
    ma = sig_tbl.select(F.col("sig").alias("sig_a"),
                        F.col("doc_id").alias("x"))
    mb = sig_tbl.select(F.col("sig").alias("sig_b"),
                        F.col("doc_id").alias("y"))
    cross = (sig_pairs.join(ma, "sig_a").join(mb, "sig_b")
             .select(F.least("x", "y").alias("doc_a"),
                     F.greatest("x", "y").alias("doc_b"), "hamming"))
    sx, sy = sig_tbl.alias("sx"), sig_tbl.alias("sy")
    within = (sx.join(sy, (F.col("sx.sig") == F.col("sy.sig"))
                      & (F.col("sx.doc_id") < F.col("sy.doc_id")))
              .select(F.col("sx.doc_id").alias("doc_a"),
                      F.col("sy.doc_id").alias("doc_b"),
                      F.lit(0).alias("hamming")))
    return cross.unionByName(within)


def dedup_clusters(docs: DataFrame, edges: DataFrame | None = None,
                   id_col: str = "doc_id", text_col: str = "text",
                   min_est_jaccard: float = 0.5,
                   max_iter: int = 25,
                   stats: dict | None = None) -> DataFrame:
    """Connected components over near-duplicate PAIRS → the dedup decision.

    Every pair family here (:func:`minhash_lsh_pairs`, :func:`simhash_pairs`,
    :func:`jaccard_pairs`) emits edges; an actual dedup stage must turn
    those edges into clusters and pick ONE canonical document per cluster —
    near-duplication is not transitive pairwise, so keep/drop cannot be
    decided per edge (A~B and B~C must collapse to one keeper even when
    A~C was never emitted). Output, one row per input document:

        (doc_id, cluster_id, cluster_size, is_keeper)

    ``cluster_id`` = min doc_id of the component, ``is_keeper`` = the
    min-id canonical-doc policy (deterministic, join-free to apply:
    ``WHERE is_keeper`` is the deduplicated corpus).

    Algorithm: iterative min-label propagation with POINTER JUMPING —
    each round every node takes ``min(own label, labels of neighbors)``
    and then short-circuits one indirection (``lbl ← lbl(lbl)``), so a
    length-k chain converges in O(log k) rounds instead of O(k); LSH
    near-dup components are near-cliques (diameter ≤ ~3), so in practice
    2-3 rounds. Each round is two key-shuffles (neighbor-min groupBy +
    the jump self-join) — never an all-pairs step — and only EDGE-TOUCHED
    nodes participate (singletons join back after the fixpoint), so label
    rows are (id, id) int64 pairs bounded by the near-dup subgraph, not
    the corpus. The driver loop holds only the
    changed-row COUNT (a scalar action per round); labels are
    ``localCheckpoint``-ed each round so the plan stays O(1) deep instead
    of growing with iterations (on a real cluster use
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
    executor-loss-safe truncation). Same fixpoint as the large-star/
    small-star formulation (Kiveris et al., SoCC 2014) on these
    shallow-diameter graphs.

    ``edges``: optional (doc_a, doc_b) DataFrame to cluster an external
    pair source (e.g. ``simhash_pairs`` output); default derives edges
    from :func:`minhash_lsh_pairs` at ``min_est_jaccard``.

    ``stats``: optional dict the fixpoint records observability into —
    ``rounds`` (label-propagation iterations run, incl. the final
    no-change round) and ``edge_rows`` (symmetrized adjacency size: the
    upper bound on every per-round shuffle's row count). The mega-cluster
    stress test pins both (VERDICT r4 task 7).
    """
    if edges is None:
        edges = (minhash_lsh_pairs(docs, id_col, text_col)
                 .where(F.col("est_jaccard") >= min_est_jaccard))
    edges = edges.select("doc_a", "doc_b")
    # Materialize the (symmetrized) adjacency ONCE: every round's action
    # re-executes the label lineage, and without this the whole upstream
    # pair derivation (the full MinHash pipeline) would re-run per round.
    adj = (edges.select(F.col("doc_a").alias("src"),
                        F.col("doc_b").alias("dst"))
           .unionByName(edges.select(F.col("doc_b").alias("src"),
                                     F.col("doc_a").alias("dst")))
           .localCheckpoint())
    # Iterate over EDGE-TOUCHED nodes only: documents in no pair are
    # singletons by definition and join back after the fixpoint, so every
    # per-round table scales with |edges| (the near-dup subgraph), not the
    # corpus — at crawl scale the difference between shuffling ~10⁹ label
    # rows per round and ~10¹² .
    labels = (adj.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("lbl", F.col("doc_id")).localCheckpoint())
    # Convergence signal: labels are monotone non-increasing, so the label
    # SUM strictly decreases iff ANY label changed — one aggregate action
    # per round instead of an old-vs-new join.
    # decimal(38,0) keeps the sum exact far past int64 (10¹² ids of 10¹²
    # magnitude sum to ~10²⁴; a wrapped int64 could alias two states).
    _lsum = F.sum(F.col("lbl").cast("decimal(38,0)"))
    prev_sum = labels.agg(_lsum).collect()[0][0]
    rounds = 0
    for _ in range(max_iter):
        nbr = (adj.join(labels, adj.dst == labels.doc_id)
               .groupBy("src").agg(F.min("lbl").alias("nlbl")))
        cand = (labels.join(nbr, labels.doc_id == nbr.src, "left")
                .select("doc_id",
                        F.least("lbl", F.coalesce("nlbl", "lbl"))
                        .alias("lbl")))
        m = cand.select(F.col("doc_id").alias("mid"),
                        F.col("lbl").alias("mlbl"))
        new_labels = (cand.join(m, cand.lbl == m.mid, "left")
                      .select("doc_id",
                              F.coalesce("mlbl", "lbl").alias("lbl"))
                      .localCheckpoint())
        new_sum = new_labels.agg(_lsum).collect()[0][0]
        # Round N's checkpoint is superseded the moment round N+1 has
        # materialized — release it, or a long convergence (and every
        # fresh CALL in a long-lived driver) accumulates dead cached
        # RDDs. adj and the FINAL labels stay: the returned plan needs
        # labels, and a truncated checkpoint cannot recompute.
        cacheutil.release_local_checkpoint(labels)
        labels = new_labels
        rounds += 1
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    if stats is not None:
        stats["rounds"] = rounds
        # adj is symmetrized (2x |edges|) and bounds every per-round
        # shuffle's input rows; count is free here — adj is checkpointed.
        stats["edge_rows"] = adj.count()
    cacheutil.release_local_checkpoint(adj)  # not in the returned plan
    full = (docs.select(F.col(id_col).alias("doc_id"))
            .join(labels, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("lbl", F.col("doc_id")).alias("lbl")))
    sizes = full.groupBy("lbl").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (full.join(sizes, "lbl")
            .select("doc_id", F.col("lbl").alias("cluster_id"),
                    "cluster_size",
                    (F.col("doc_id") == F.col("lbl")).alias("is_keeper")))


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", delim: str = "\n",
               min_docs: int = 2, min_chars: int = 4) -> DataFrame:
    """Cross-document LINE deduplication (C4-style boilerplate removal).

    Any line whose trimmed content appears in at least ``min_docs``
    DISTINCT documents is removed from EVERY document (C4 removed lines
    occurring ≥3× in the corpus; Dolma/CCNet dedup paragraphs the same
    way). The symmetric remove-from-all rule — rather than keep-first —
    is deliberate for a distributed engine: it needs no global document
    order, so the result is deterministic under any partitioning and
    identical across re-runs/resumes. Lines shorter than ``min_chars``
    after trimming (blank lines, list bullets, lone digits) are never
    removed — they carry structure, not content.

    Output, one row per input document (docs with every line removed
    survive with ``clean_text = ''``):

        (doc_id, clean_text, n_lines, n_kept)

    Plan shape (crawl-scale): posexplode lines → the duplicated-line set
    is ``groupBy(line_hash, doc).count → groupBy(line_hash).count`` —
    both map-side combinable, so a boilerplate line in 10⁸ docs collapses
    to one row per map task before either shuffle — then a LEFT join of
    the exploded lines against that (small, boilerplate-only) set and a
    per-document reassembly groupBy. Exactly one full shuffle of the
    corpus lines (the reassembly); the dup-set join key is the line hash,
    which AQE broadcasts when the boilerplate set is small. All JVM-side
    — md5/trim/concat_ws, no Python.

    ``delim`` is a regex (Spark ``split``); the default splits on
    newlines. Reassembly rejoins with the literal first character of a
    whitespace delim or ``'\\n'`` otherwise — callers with a non-trivial
    regex delim should treat ``clean_text`` as normalized output.
    """
    joiner = delim if delim in ("\n", " ", "\t") else "\n"
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        # NULL text → one empty line (not a vanished document): posexplode
        # of a NULL array would silently drop the doc from the output.
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                             delim, -1))
        .alias("pos", "line"),
    ).withColumn("lh", F.md5(F.encode(F.trim(F.col("line")), "utf-8")))
    dup = (lines
           .where(F.length(F.trim(F.col("line"))) >= min_chars)
           .groupBy("lh", "doc_id").agg(F.count(F.lit(1)).alias("_c"))
           .groupBy("lh").agg(F.count(F.lit(1)).alias("ndocs"))
           .where(F.col("ndocs") >= min_docs)
           .select("lh", F.lit(True).alias("is_dup")))
    flagged = (lines.join(dup, "lh", "left")
               .select("doc_id", "pos", "line",
                       F.coalesce("is_dup", F.lit(False)).alias("is_dup")))
    kept = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", "line", "is_dup"))),
        lambda x: ~x["is_dup"])
    return (flagged.groupBy("doc_id").agg(
        F.concat_ws(joiner, F.transform(kept, lambda x: x["line"]))
        .alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(~F.col("is_dup"), 1).otherwise(0)).alias("n_kept")))


def dup_span_stats(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", width: int = 50,
                   min_occurrences: int = 2) -> DataFrame:
    """ExactSubstr duplicated-span DETECTION (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — public
    method, which dedups exact token spans of 50 tokens).

    Every run of ``width`` consecutive word tokens is a span candidate; a
    span is DUPLICATED when its content hash occurs ``min_occurrences``+
    times anywhere in the corpus — within- OR cross-document, the paper's
    semantics (a suffix-array hit doesn't care which document the other
    copy lives in). Output is the per-document span-duplication profile
    used to filter or re-weight docs:

        (doc_id, n_windows, n_dup_windows, dup_frac)

    Docs with fewer than ``width`` tokens have zero windows and
    ``dup_frac = 0.0`` (kept, not dropped). The paper's full algorithm
    also REMOVES the duplicated bytes; span surgery is corpus-policy
    (remove vs drop-doc vs down-weight), so this operator emits the
    decision inputs and leaves the cut to the caller.

    Plan shape (crawl-scale): per-doc window hashing is a pure projection
    (tokens materialized once, each window one md5); the duplicated-hash
    set is ONE map-side-combinable ``groupBy(hash).count`` — a span
    repeated 10⁸ times collapses to one row per map task — then a left
    join back and a per-doc reassembly groupBy. The same two-shuffle
    shape as :func:`line_dedup`, with the window hash as the key.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\w+"),
                                F.lit(0))
    grams = F.when(
        F.size(toks) >= width,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - width + 1),
            lambda i: F.md5(F.encode(
                F.concat_ws(" ", F.slice(toks, i, width)), "utf-8"))),
    ).otherwise(F.array().cast("array<string>"))
    win = docs.select(F.col(id_col).alias("doc_id"),
                      F.explode_outer(grams).alias("wh"))
    dup = (win.where(F.col("wh").isNotNull())
           .groupBy("wh").agg(F.count(F.lit(1)).alias("occ"))
           .where(F.col("occ") >= min_occurrences)
           .select("wh", F.lit(True).alias("is_dup")))
    flagged = win.join(dup, "wh", "left")
    n_dup = F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
    n_win = F.count(F.col("wh"))
    return (flagged.groupBy("doc_id").agg(
        n_win.alias("n_windows"),
        n_dup.alias("n_dup_windows"),
        F.round(n_dup.cast("double") / F.greatest(n_win, F.lit(1)), 6)
        .alias("dup_frac")))


def jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_df: int = 50,
                  min_jaccard: float = 0.1) -> DataFrame:
    """Exact n-gram (char-shingle) Jaccard for pairs sharing ≥1 *rare*
    shingle. Shingles seen in more than ``max_df`` docs are dropped before
    the self-join (boilerplate guard): without it one hot shingle in d docs
    creates d² join rows — the classic skew bomb at crawl scale. The
    document-frequency filter is itself a broadcastable aggregate.

    The rare-shingle join generates CANDIDATE pairs only; the Jaccard for
    a surviving pair is then computed exactly over the FULL shingle sets
    (array_intersect) — counting the intersection over rare shingles alone
    would systematically underestimate boilerplate-heavy duplicates.

    Skew note: the df-cap must never itself concentrate hot-key rows. A
    window count over ``partitionBy(sh)`` would shuffle every occurrence
    of a boilerplate shingle to ONE task before dropping it — 10⁸ docs
    sharing a header shingle = 10⁸ rows in one partition. Instead the df
    is a ``groupBy(sh).count()`` (map-side partial aggregation collapses a
    hot shingle to one row per map task before any shuffle), the *hot* set
    (df > max_df — boilerplate only, small by construction) is broadcast,
    and the cap is a broadcast ANTI-join: hot rows are dropped map-side,
    so no stage ever fans raw hot-shingle rows into a single partition.
    Per-doc shingles are distinct (char_shingles dedups), so count(*)
    per shingle == its document frequency."""
    shs = docs.select(F.col(id_col).alias("doc_id"),
                      char_shingles(text_col).alias("shs"))
    sh = shs.select("doc_id", F.explode("shs").alias("sh"))
    hot = (sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
           .where(F.col("df") > max_df).select("sh"))
    sh_r = sh.join(F.broadcast(hot), "sh", "left_anti")
    a = sh_r.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh_r.select(F.col("doc_id").alias("doc_b"), "sh")
    cand = (
        a.join(b, ["sh"]).where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )
    fa = shs.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    fb = shs.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    n_common = F.size(F.array_intersect("shs_a", "shs_b"))
    jac = F.round(
        n_common.cast("double")
        / (F.size("shs_a") + F.size("shs_b") - n_common), 6)
    return (
        cand.join(fa, "doc_a").join(fb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= F.lit(min_jaccard))
    )
