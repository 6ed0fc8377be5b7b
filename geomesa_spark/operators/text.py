"""Text analysis for training-data pipelines: token counting, language
ID, quality scoring, document fingerprinting.

These are the document-corpus operators a 100 TB pretraining pipeline
runs before dedup/filtering. Everything is built-in Column expressions
(split / higher-order array functions / integer folds) — JVM-side,
whole-stage codegen, reproducible in ANSI SQL for the DuckDB oracle.
No reference analogue (GeoMesa is geospatial); these extend the engine
per the build brief's training-data requirements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "tfidf_topk",
    "pmi_collocations",
    "with_token_stats",
    "with_language_id",
    "with_quality_score",
    "repetition_stats",
    "inverted_postings",
    "with_fingerprint",
    "scrub_pii",
    "PII_PATTERNS",
    "EN_STOPWORDS",
]

EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "on"]

FP_MOD = 1_000_000_007
FP_MUL = 31


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex variant uses
    ``F.split(text, r'\\s+|(?=[^\\w\\s])')`` — kept simple here so the
    oracle splits identically)."""
    return F.split(text, " ")


# GPT-2-style pretokenizer, simplified to the lookahead-free subset so
# Java regex (Spark) and RE2 (DuckDB) tokenize identically: contraction
# tails, space-prefixed letter runs, space-prefixed digit runs,
# space-prefixed punctuation runs, whitespace runs.
BPE_PATTERN = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pretokenization (the token-budget estimator a training
    pipeline bills by): regexp_extract_all with BPE_PATTERN — JVM-side,
    no Python."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_bpe_tokens`` (pretoken count) next to the whitespace
    token count — real BPE merges only ever SPLIT pretokens further, so
    this lower-bounds the billed token count with zero vocab state."""
    return df.withColumn("n_bpe_tokens", F.size(bpe_tokens(F.col(text_col))))


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the term-salience primitive
    of corpus analytics (keyword extraction, near-dup triage, topic
    sharding).

    Cross-engine exactness without transcendentals: the classic
    ln(N/df) idf ranks documents identically to the raw ratio N/df
    (ln is monotonic), so the score is tf·N/df — ONE correctly-rounded
    double division of exact integers, bit-identical in any engine.
    Shapes: tokenize+explode → (doc,term) count [shuffle 1] → term df
    [rides the same term partitioning] → join back on term [shuffle on
    term] → per-doc top-k window [shuffle on doc]. All built-ins; at
    100 TB the term dimension is the natural bucketing key."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    # corpus size as a broadcast 1-row aggregate, not a driver count():
    # the operator stays plan-only (zero jobs until the caller acts)
    n_corpus = docs.agg(F.count("*").cast("double").alias("__n_corpus"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_corpus))
        .withColumn("score", (F.col("tf") * F.col("__n_corpus")) / F.col("df"))
        .drop("__n_corpus")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", F.col("rank").cast("int").alias("rank"))
    )


def pmi_collocations(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks 1990) — the corpus-level phrase detector (multi-word
    expressions, boilerplate phrases) next to tfidf_topk's per-doc
    salience.

    Cross-engine exactness without transcendentals: PMI =
    ln(p_xy/(p_x·p_y)) ranks pairs identically to the raw ratio
    n_xy·N²/(B·n_x·n_y) (ln is monotonic), so the score is that ratio
    as ONE mirrored double expression over exact integer counts —
    bit-identical in any engine; ties break on the words.

    Shapes: token explode → unigram counts [shuffle 1]; bigram explode
    (in-array transform, no posexplode self-join) → pair counts
    [shuffle 2] with the min_count support filter BEFORE the joins;
    unigram attach = two equi-joins on the word key; N and B ride as
    broadcast 1-row aggregates (plan-only, zero driver jobs). The
    final top-k window runs over the support-filtered candidate set
    only — at 100 TB pick min_count so candidates fit one partition,
    or pre-rank per first-word.
    """
    t = tokens(F.col(text_col))
    n = F.size(t)
    toks = docs.select(F.explode(t).alias("w")).where(F.col("w") != "")
    uni = toks.groupBy("w").agg(F.count("*").alias("n_w"))
    n_tot = toks.agg(F.count("*").cast("double").alias("__N"))
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"), F.element_at(t, i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    b_tot = big.agg(F.count("*").cast("double").alias("__B"))
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("n_xy")).where(
        F.col("n_xy") >= min_count
    )
    scored = (
        bc.join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_y")), "w2")
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(b_tot))
        .withColumn(
            "score",
            F.round(
                (F.col("n_xy") * F.col("__N") * F.col("__N"))
                / (F.col("__B") * F.col("n_x") * F.col("n_y")),
                6,
            ),
        )
    )
    # rank WITHOUT a global window (vocab_stats pattern): orderBy+limit
    # is a distributed TakeOrdered; re-sort the single ≤k-row partition
    # and number it with monotonically_increasing_id
    ordered = [F.col("score").desc(), F.col("w1").asc(), F.col("w2").asc()]
    return (
        scored.select("w1", "w2", "n_xy", "n_x", "n_y", "score")
        .orderBy(*ordered)
        .limit(k)
        .coalesce(1)
        .sortWithinPartitions(*ordered)
        .withColumn("rank", (F.monotonically_increasing_id() + 1).cast("int"))
    )


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens / n_distinct_tokens / n_chars_calc."""
    t = tokens(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(t))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(t)))
        .withColumn("n_chars_calc", F.length(F.col(text_col)))
    )


def with_language_id(
    df: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    threshold: float = 0.05,
    out: str = "lang_pred",
) -> DataFrame:
    """n-gram/stopword language heuristic: fraction of tokens in the
    language's stopword list; predict the language when the ratio
    clears the threshold, else 'unknown'. Deterministic arithmetic —
    oracle-checkable."""
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    t = tokens(F.col(text_col))
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    ratio = hits.cast("double") / F.size(t)
    return df.withColumn("stopword_ratio", ratio).withColumn(
        out, F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unknown"))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, lexical diversity, mean token length,
    punctuation density → one linear score. Every term is a ratio of
    exact integers (single double division — bit-stable across engines).
    """
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    n_dis = F.size(F.array_distinct(t))
    n_chars = F.length(F.col(text_col))
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z0-9 ]", ""))
    diversity = n_dis.cast("double") / n_tok
    mean_tok_len = (n_chars - (n_tok - 1)).cast("double") / n_tok
    punct_ratio = n_punct.cast("double") / n_chars
    score = (
        F.lit(0.5) * diversity
        + F.lit(0.1) * F.least(mean_tok_len / 10.0, F.lit(1.0))
        - F.lit(0.4) * punct_ratio
    )
    return (
        df.withColumn("diversity", diversity)
        .withColumn("mean_tok_len", mean_tok_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("quality", score)
    )


def repetition_stats(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models", Table A1): the fraction of tokens held
    by the single most frequent word, the distinct-word ratio, and the
    duplicate word-bigram fraction — the filters a pretraining pipeline
    uses to drop boilerplate/spam before dedup.

    Output: (key, n_words, distinct_ratio, top_word_frac,
    dup_bigram_frac). Every ratio is exact-int / exact-int in one
    double division — bit-stable across engines.

    Scale: computed entirely with higher-order array expressions — NO
    explode, NO shuffle, embarrassingly map-parallel. top-word counting
    is O(distinct × n) per document, the right trade for web documents
    (bounded length); for book-length outliers, pre-truncate or switch
    to the explode + two-level-aggregate shape."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    dis = F.array_distinct(t)
    top = F.aggregate(
        dis,
        F.lit(0),
        lambda acc, x: F.greatest(acc, F.size(F.filter(t, lambda y: y == x))),
    )
    # guard n==1: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of
    # returning empty, and element_at(t, 0) is an ANSI error
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)),
    )).otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    return df.select(
        F.col(key_col),
        n.cast("int").alias("n_words"),
        (F.size(dis).cast("double") / n).alias("distinct_ratio"),
        (top.cast("double") / n).alias("top_word_frac"),
        F.when(n_bi > 0, F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / n_bi)
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


def inverted_postings(
    df: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flat inverted-index postings: one row per (term, document) with
    the in-doc occurrence count, the first 1-based token position, and
    the term's document frequency — the search-index build stage,
    flattened to scalar columns (no nested posting arrays, so results
    hash identically across engines).

    One posexplode + two hash aggregates; the per-term df attaches via
    an equi-join on the term key (the same shuffle partitioning as the
    (term, doc) aggregate, so AQE coalesces them). ``min_df`` prunes
    the hapax tail BEFORE the join fans back out. All values are exact
    integers. Output: (term, doc_id, n_occ, first_pos, df).
    """
    t = tokens(F.col(text_col))
    e = df.select(F.col(id_col), F.posexplode(t).alias("__p", "term"))
    td = e.groupBy("term", id_col).agg(
        F.count("*").cast("int").alias("n_occ"),
        (F.min("__p") + 1).cast("int").alias("first_pos"),
    )
    dfreq = td.groupBy("term").agg(F.count("*").alias("df")).where(
        F.col("df") >= min_df
    )
    return td.join(dfreq, "term").select("term", id_col, "n_occ", "first_pos", "df")


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Polynomial rolling-hash fingerprint over characters:
    ``fp = fold(chars, 0, acc -> (acc*31 + codepoint) % 1e9+7)``.
    Pure integer fold — exact, order-deterministic, mirrored by the
    oracle's list_reduce."""
    chars = F.split(F.col(text_col), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_MUL + F.ascii(ch)) % FP_MOD,
    )
    return df.withColumn(out, fp)


# conservative PII patterns: email, international-ish phone numbers,
# IPv4, 13-19 digit card-like runs. Deliberately REGEX-SIMPLE so the
# same pattern strings run verbatim in Spark (Java regex) and DuckDB
# (RE2) — the oracle scrubs identically. Order matters: emails first so
# their digit runs don't half-match as phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{13,19}\b", "<CARD>"),
    ("phone", r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out: str = "scrubbed",
    kinds: tuple[str, ...] = ("email", "card", "phone", "ipv4"),
    count: bool = True,
) -> DataFrame:
    """PII redaction for training corpora: replace email / phone / IPv4
    / card-number shaped spans with typed placeholder tokens, and (with
    ``count``) emit a per-kind hit count for pipeline audit metrics.

    All JVM built-ins: chained ``regexp_replace`` for the scrub (one
    codegen stage, no UDF), ``regexp_count`` for the metrics. Counts
    are computed on the ORIGINAL text, before any replacement, so kinds
    do not mask each other's tallies; the scrub itself applies in
    declaration order (emails before phones, so an address's digits are
    not half-eaten)."""
    table = dict((k, (p, r)) for k, p, r in PII_PATTERNS)
    unknown = [k for k in kinds if k not in table]
    if unknown:
        raise ValueError(f"unknown PII kinds: {unknown}")
    scrubbed = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        if name in kinds:
            scrubbed = F.regexp_replace(scrubbed, pat, repl)
    out_df = df.withColumn(out, scrubbed)
    if count:
        for name, pat, repl in PII_PATTERNS:
            if name in kinds:
                out_df = out_df.withColumn(
                    f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat))
                )
    return out_df
