"""Spark-native text operators for the large-scale training-data pipeline.

All JVM-side (``pyspark.sql.functions`` only — no Python UDFs): these run in
WholeStageCodegen and scale linearly with executors. Each has an ANSI-SQL
twin in ``__spark_entry__.oracle_sql`` checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "token_count", "ws_token_count", "bpe_token_count",
    "bpe_token_count_of", "word_hits",
    "langid", "quality_score", "quality_tiers", "char_shingles",
    "doc_fingerprint",
    "position_hashes", "winnow_fingerprint", "repetition_signals",
    "hash_sample", "contamination_flags", "ngram_counts",
    "tfidf_top_terms",
    "EN_STOPWORDS", "ES_STOPWORDS", "LANG_STOPWORDS",
]

# Small fixed stopword lists — shared verbatim with the SQL oracle.
# ASCII-only so the word-boundary regex behaves identically in Java regex
# (Spark) and RE2 (DuckDB).
EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "for", "with"]
ES_STOPWORDS = ["el", "la", "de", "que", "los", "las", "una", "para"]
FR_STOPWORDS = ["le", "les", "des", "est", "dans", "et", "une", "pour"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "nicht", "mit", "von"]
PT_STOPWORDS = ["os", "um", "uma", "com", "por", "mais", "mas", "seu"]

# Priority order doubles as the tie-break: the EARLIEST language with the
# maximal stopword-hit count wins (en on an all-zero text).
LANG_STOPWORDS = [
    ("en", EN_STOPWORDS), ("es", ES_STOPWORDS), ("fr", FR_STOPWORDS),
    ("de", DE_STOPWORDS), ("pt", PT_STOPWORDS),
]

_TOKEN_PATTERN = r"\w+"


def token_count(col: str = "text") -> Column:
    """Word-regex token count."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(_TOKEN_PATTERN), F.lit(0)))


def ws_token_count(col: str = "text") -> Column:
    """Whitespace-split token count (0 for empty/all-whitespace text —
    ``split('')`` would otherwise yield ``['']`` and count 1)."""
    return F.when(F.length(F.trim(F.col(col))) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(col)), r"\s+")))


# BPE-ish pre-tokenizer classes (GPT-2-style, RE2-portable): letter runs,
# digit runs, non-alnum-non-space runs — each becomes >=1 BPE token.
_BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def bpe_token_count(col: str = "text") -> Column:
    """BPE-ish token count: the GPT-2-style pre-tokenization classes
    (letter/digit/punctuation runs); a cheap lower bound on real BPE."""
    return bpe_token_count_of(F.col(col))


def bpe_token_count_of(col: Column) -> Column:
    """Column-expression form of :func:`bpe_token_count` (callers that
    need to coalesce/derive the text first, e.g. ``packing.seq_pack``)."""
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_PATTERN), F.lit(0)))


def word_hits(col: str, words: list[str]) -> Column:
    """Count of occurrences of any word in ``words`` (word-bounded)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.col(col)), F.lit(pat), F.lit(0)))


def langid(col: str = "text") -> Column:
    """Stopword-heuristic language ID over en/es/fr/de/pt.

    Earliest-argmax over per-language word-bounded stopword hit counts
    (ties → the earlier language in LANG_STOPWORDS; all-zero → en).
    Expressed as a reverse when-chain so the SQL twin's CASE ladder is
    provably equivalent."""
    hits = {lang: word_hits(col, ws) for lang, ws in LANG_STOPWORDS}
    order = [lang for lang, _ in LANG_STOPWORDS]
    expr = None
    for i in range(len(order) - 1, 0, -1):
        lang = order[i]
        earlier = [hits[o] for o in order[:i]]
        beat = (hits[lang] > F.greatest(*earlier) if len(earlier) > 1
                else hits[lang] > earlier[0])
        expr = (F.when(beat, F.lit(lang)) if expr is None
                else expr.when(beat, F.lit(lang)))
    return expr.otherwise(F.lit(order[0]))


def quality_score(col: str = "text") -> Column:
    """Length / punctuation / stopword-ratio quality heuristic in [0,1],
    rounded to 4 decimals (stable across engines)."""
    n_chars = F.length(F.col(col))
    n_tokens = token_count(col)
    stop = word_hits(col, EN_STOPWORDS)
    punct = F.size(F.regexp_extract_all(F.col(col), F.lit(r"[.,;:!?]"), F.lit(0)))
    stop_ratio = stop / F.greatest(n_tokens, F.lit(1))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (F.lit(0.5) * len_score
             + F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
             + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))))
    return F.round(score, 4)


def quality_tiers(docs: "DataFrame", id_col: str = "doc_id",
                  text_col: str = "text") -> "DataFrame":
    """CCNet-style per-language quality tiers (Wenzek et al. 2020, public
    method): rank each language's documents by quality and split into
    head / middle / tail thirds — the standard coarse knob for sampling
    higher-quality web text more heavily.

    Returns ``(doc_id, lang, quality, rank, tier)``. Rank orders by
    ``(quality DESC, doc_id ASC)`` — fully deterministic — and the tier
    boundaries are INTEGER comparisons (``3*(rank-1) < k*(n-1)``), so
    both engines cut identically with no float-division boundary drift.

    Plan shape: scoring is map-only; the only shuffle is the per-language
    Window partition (parallel across languages). A per-language total
    order is inherent to exact percentile ranking — at extreme scale
    swap in approx quantile cut-points and keep the same tier semantics.
    """
    from pyspark.sql import Window

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        langid(text_col).alias("lang"),
        quality_score(text_col).alias("quality"))
    w = (Window.partitionBy("lang")
         .orderBy(F.col("quality").desc(), F.col("doc_id").asc()))
    wn = Window.partitionBy("lang")
    return (scored
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .withColumn("n_lang", F.count(F.lit(1)).over(wn))
            .withColumn(
                "tier",
                F.when(3 * (F.col("rank") - 1)
                       < F.greatest(F.col("n_lang") - 1, F.lit(1)),
                       F.lit("head"))
                .when(3 * (F.col("rank") - 1)
                      < 2 * F.greatest(F.col("n_lang") - 1, F.lit(1)),
                      F.lit("middle"))
                .otherwise(F.lit("tail")))
            .select("doc_id", "lang", "quality", "rank", "tier"))


def char_shingles(col: str = "text", width: int = 16, stride: int = 8) -> Column:
    """Distinct strided character shingles — the unit for n-gram Jaccard /
    MinHash dedup. Built-in-only: sequence + transform + array_distinct."""
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(F.col(col)) - F.lit(width - 1), F.lit(1)),
        F.lit(stride),
    )
    return F.array_distinct(
        F.transform(starts, lambda i: F.substring(F.col(col), i, width))
    )


def doc_fingerprint(col: str = "text") -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized text
    (exact-dedup key)."""
    norm = F.lower(F.regexp_replace(F.col(col), r"\s+", " "))
    return F.md5(F.encode(norm, "utf-8"))


def position_hashes(col: str = "text", width: int = 8) -> Column:
    """Per-position character k-gram hashes (the rolling-hash sequence
    behind winnowing): one 31-bit int per text position, DuckDB-portable
    (same conv/md5 scheme as MinHash)."""
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(col)) - F.lit(width - 1), F.lit(1)))
    from .hashutil import md5_mod
    return F.transform(
        starts,
        lambda i: md5_mod(F.substring(F.col(col), i, width), (1 << 31) - 1))


def winnow_fingerprint(docs, id_col: str = "doc_id", text_col: str = "text",
                       width: int = 8, window: int = 4):
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003 —
    public method): the sorted distinct minima of every ``window``-length
    sliding window over the position-hash sequence.

    Expressed relationally: posexplode the hash sequence, windowed MIN over
    (doc, position) rows, groupBy collect — the windowed aggregation runs
    JVM-side and the hash array is computed once per document (an
    array-HOF formulation would re-evaluate the hash array per window —
    the same lambda-re-evaluation trap as MinHash)."""
    from pyspark.sql import Window

    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        position_hashes(text_col, width).alias("hs"),
    ).select("doc_id", F.size("hs").alias("n"),
             F.posexplode("hs").alias("pos", "h"))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(0, window - 1))
    mins = (hashed
            .select("doc_id", "pos", "n",
                    F.min("h").over(w).alias("wmin"))
            .where(F.col("pos") + window - 1 < F.col("n"))
            .groupBy("doc_id")
            .agg(F.array_sort(F.array_distinct(
                F.collect_list("wmin"))).alias("fingerprint")))
    # Docs too short for one full window still get a row (empty fingerprint)
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return (ids.join(mins, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("fingerprint",
                               F.array().cast("array<bigint>"))
                    .alias("fingerprint")))


def repetition_signals(docs: "DataFrame", id_col: str = "doc_id",
                       text_col: str = "text") -> "DataFrame":
    """Gopher-style within-document repetition quality signals
    (Rae et al. 2021 §A1.1 "repetitious text" filters — public method):

    - ``rep_2gram_frac`` / ``rep_3gram_frac``: fraction of n-gram
      OCCURRENCES that are repeats of an earlier occurrence,
      ``1 − distinct/total`` (0.0 when the doc has < n tokens);
    - ``top_token_frac``: share of all tokens taken by the single most
      frequent token.

    Plan shape (100 TB): the n-gram fractions are per-row HOF expressions
    (transform + array_distinct over the doc's own tokens — map-only, no
    shuffle); ``top_token_frac`` is explode → two-level groupBy — both
    aggregations shuffle on doc-sized keys with map-side combine, never
    corpus-wide ones. Exact DuckDB twin in ``__spark_entry__.oracle_sql``.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(_TOKEN_PATTERN), F.lit(0))
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))

    def gram_frac(n: int) -> Column:
        grams = F.when(
            F.size("toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.concat_ws(" ", *[
                    F.element_at(F.col("toks"), i + k) for k in range(n)])),
        ).otherwise(F.array().cast("array<string>"))
        return F.when(
            F.size(grams) > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(grams))
                    .cast("double") / F.size(grams), 6),
        ).otherwise(F.lit(0.0))

    fracs = d.select("doc_id",
                     gram_frac(2).alias("rep_2gram_frac"),
                     gram_frac(3).alias("rep_3gram_frac"))
    counts = (d.select("doc_id", F.explode("toks").alias("t"))
              .groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
              .groupBy("doc_id")
              .agg(F.round(F.max("c").cast("double") / F.sum("c"), 6)
                   .alias("top_token_frac")))
    return (fracs.join(counts, "doc_id", "left")
            .select("doc_id", "rep_2gram_frac", "rep_3gram_frac",
                    F.coalesce("top_token_frac", F.lit(0.0))
                    .alias("top_token_frac")))


_SAMPLE_M = (1 << 31) - 1  # same modulus family as the minhash scheme


def hash_sample(docs: "DataFrame", rates: dict, key_col: str = "lang",
                id_col: str = "doc_id") -> "DataFrame":
    """Deterministic stratified sampling — the training-data mixer's
    downsample step (e.g. CCNet/C4-style per-language rebalancing, public
    method): keep a row iff its md5-derived hash fraction is below the
    stratum's rate.

    - Reproducible: membership is a pure function of ``id_col`` (re-runs,
      resumes and backfills select the SAME rows — unlike ``rand()``).
    - Map-only: no shuffle, no count pre-pass; the filter pushes to the
      scan's partitions untouched.
    - ``rates``: stratum value → keep-rate in [0, 1]; missing strata keep
      everything (rate 1.0).

    The hash is the minhash family's ``conv(substr(md5,1,15)) % M`` so the
    DuckDB twin replays membership bit-for-bit.
    """
    from .hashutil import md5_mod
    h = md5_mod(F.col(id_col).cast("string"), _SAMPLE_M)
    thr = F.lit(int(1.0 * _SAMPLE_M))
    for val, rate in sorted(rates.items()):
        thr = F.when(F.col(key_col) == val,
                     F.lit(int(rate * _SAMPLE_M))).otherwise(thr)
    return docs.where(h < thr)


def contamination_flags(docs: "DataFrame", probes: "DataFrame",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> "DataFrame":
    """Benchmark decontamination (public method: n-gram-overlap
    contamination checks à la GPT-3 appendix C / PaLM): flag corpus
    documents sharing character shingles with a (small) probe/benchmark
    set.

    The probe shingle set is broadcast (benchmarks are tiny next to the
    corpus), the overlap count is a broadcast INNER join + map-side
    combinable groupBy, and docs with zero hits never shuffle at all —
    at 100 TB the corpus stream stays map-only.

    Output: (doc_id, n_hits, contaminated).
    """
    probe_sh = (probes.select(
        F.explode(char_shingles(text_col)).alias("sh")).distinct())
    doc_sh = docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(char_shingles(text_col)).alias("sh"))
    hits = (doc_sh.join(F.broadcast(probe_sh), "sh")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits")))
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return (ids.join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                    .alias("contaminated")))


def ngram_counts(docs: "DataFrame", text_col: str = "text", n: int = 2,
                 min_count: int = 2) -> "DataFrame":
    """Corpus-level word n-gram vocabulary: ``(gram, n_occurrences)`` for
    every n-gram of word tokens occurring at least ``min_count`` times —
    the counting pass under tokenizer/vocabulary induction (BPE-style
    merges rank by exactly these pair counts) and phrase-table mining.

    Counts are OCCURRENCES, not document frequency: repeats inside one
    document count, as tokenizer training sees them.

    Plan shape (crawl-scale): per-doc n-gram projection (tokens
    materialized once per doc, each gram one ``slice``+``concat_ws``) →
    explode → ONE map-side-combinable groupBy — a Zipf-head gram
    collapses to one row per map task before the only shuffle. The
    ``min_count`` filter runs post-aggregate (HAVING), where the hot
    grams are already one row each.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(_TOKEN_PATTERN), F.lit(0))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))
    return (docs.select(F.explode(grams).alias("gram"))
            .groupBy("gram").agg(F.count(F.lit(1)).alias("n_occurrences"))
            .where(F.col("n_occurrences") >= min_count))


def tfidf_top_terms(docs: "DataFrame", text_col: str = "text",
                    id_col: str = "doc_id", k: int = 5) -> "DataFrame":
    """Top-``k`` TF-IDF terms per document — the keyword/topic-signal
    pass a training-data mixer uses for domain tagging and near-topic
    cluster balancing (public TF-IDF, natural-log IDF ``ln(N/df)``).

    Returns ``(doc_id, term, tf, df, score, rank)``; ``score`` rounds to
    6 decimals and the rank orders by ``(score DESC, term ASC)`` so the
    DuckDB twin selects the identical rows.

    Plan shape (crawl-scale): tokenize→explode once; term frequency is a
    map-side-combinable groupBy on (doc, term); document frequency reuses
    those already-aggregated rows (a second combinable groupBy on term —
    Zipf-head terms are one row per map task before the shuffle); the
    corpus size joins in-plan as a broadcast 1-row aggregate (no driver
    ``.count()`` action); the final top-k Window partitions by doc_id —
    parallel across documents, never a global sort.
    """
    from pyspark.sql import Window

    toks = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(_TOKEN_PATTERN), F.lit(0)))
        .alias("term")))
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_total = docs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    scored = (tf.join(df, "term")
              .join(F.broadcast(n_total))
              .withColumn(
                  "score",
                  F.round(F.col("tf") * F.log(
                      F.col("n_total").cast("double") / F.col("df")), 6)))
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("score").desc(), F.col("term").asc()))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "df", "score", "rank"))
