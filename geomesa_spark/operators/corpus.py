"""Corpus-construction operators for training-data pipelines:
stratified sampling, deterministic shard assignment, benchmark
contamination checks, and in-document chunk dedup.

These sit between the text-analysis layer (operators/text.py) and the
cross-document dedup layer (operators/dedup.py) in a pretraining data
pipeline: score → filter → decontaminate → sample per stratum → shard
for the trainer. Everything is built-in Column expressions (window
ranks, higher-order array functions, integer folds) — JVM-side,
whole-stage codegen, mirrored in ANSI SQL for the DuckDB oracle. No
reference analogue (GeoMesa is geospatial); these extend the engine per
the build brief's training-data requirements.

Determinism contract: every ordering / hash here is derived from data
values (md5 of the id string, or the same rolling fingerprint as
operators/text.py) — never from partition layout, RNG, or timestamps —
so a re-run over re-partitioned input produces byte-identical output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from geomesa_spark.operators.text import FP_MOD, FP_MUL, tokens

__all__ = [
    "stratified_sample",
    "shard_assign",
    "ngrams",
    "contamination",
    "chunk_dedup",
    "chunk_text",
    "vocab_stats",
    "pack_sequences",
    "remove_frequent_lines",
    "mixture_rates",
]


def vocab_stats(
    df: DataFrame,
    top_k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide vocabulary statistics: per token, total occurrence
    count and document frequency — the vocab-coverage table a tokenizer
    build or data-mix audit reads first.

    Output: (token, n_occurrences, n_docs[, rank]); with ``top_k`` the
    result is the deterministic top-k by count (ties broken by token).

    Scale shape: explode → one map-side-combined groupBy on the token
    string; doc frequency rides the same aggregation as a distinct
    count. The top-k limit is a TakeOrdered over the aggregate — no
    second shuffle.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    agg = toks.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    if top_k is None:
        return agg
    # rank the post-limit rows WITHOUT a window: orderBy+limit is a
    # TakeOrdered yielding one partition of ≤ k rows; after an explicit
    # in-partition re-sort, monotonically_increasing_id numbers them
    # 0..k-1 in order. (A bare Window.orderBy would plan a global
    # WindowExec whose "No Partition Defined" warning reads as a scale
    # hazard in operator logs — and a constant partitionBy gets folded
    # away by Catalyst, bringing the warning back.)
    ordered = [F.col("n_occurrences").desc(), F.col("token").asc()]
    return (
        agg.orderBy(*ordered)
        .limit(top_k)
        .coalesce(1)
        .sortWithinPartitions(*ordered)
        .withColumn("rank", (F.monotonically_increasing_id() + 1).cast("int"))
    )


def _id_hash(id_col: str) -> Column:
    """Deterministic pseudo-random sort key: md5 hex of the id string.
    Identical in Spark and DuckDB, so the oracle ranks the same rows."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    quota: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``quota`` rows per stratum, picked by hash order — the
    corpus-mixing step that caps any one (language, source, …) bucket.

    Scale shape: one shuffle on the strata key (the window), map-side
    nothing else; the hash order means the sample is stable under
    re-partitioning and incremental re-runs (a doc in the sample stays
    in the sample unless the stratum grows past the quota with
    smaller-hash newcomers).
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        _id_hash(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def _fp_of(col: Column) -> Column:
    """Rolling polynomial hash of a string column (same constants as
    operators/text.py fingerprints) — pure integer fold, exact in both
    engines."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_MUL + F.ascii(ch)) % FP_MOD,
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle for trainer sharding: every row gets
    a ``shard`` (rolling-hash of the id, mod n) and a ``shard_pos``
    (its rank inside the shard by the same hash) — the
    write-once-read-sequentially layout a data loader consumes.

    Scale shape: one shuffle on ``shard`` (the window). At 100 TB this
    is exactly the job that materializes training shards:
    ``.repartition(n, "shard")`` + ``sortWithinPartitions("shard_pos")``
    + a partitioned write, all downstream of this plan with no extra
    exchange (the window already clustered by shard).
    """
    fp = _fp_of(F.col(id_col).cast("string"))
    out = df.withColumn("__fp", fp).withColumn(
        "shard", F.pmod(F.col("__fp"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__fp").asc(), F.col(id_col).asc())
    return out.withColumn("shard_pos", F.row_number().over(w)).drop("__fp")


def ngrams(text: Column, n: int = 3) -> Column:
    """Word n-grams as an array of space-joined strings; empty array
    when the document has fewer than n tokens (guarded — Spark's
    sequence(1, 0) would yield a DESCENDING range, not an empty one)."""
    t = tokens(text)
    k = F.size(t) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(t, i, n))
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination check: for each training document, the
    fraction of its distinct word n-grams that appear anywhere in the
    benchmark (eval) corpus. The decontamination step every serious
    pretraining pipeline runs before training.

    Output: (id_col, n_ngrams, n_hit, contamination) — one row per
    input doc with at least one n-gram; ratio = n_hit / n_ngrams in one
    double division (bit-stable).

    Scale shape: benchmark n-grams are distinct-ed then broadcast (eval
    suites are tiny next to a 100 TB corpus — if not, the same plan
    works as a shuffle equi-join on the n-gram string); the corpus side
    explodes distinct n-grams per doc, left-joins, and re-aggregates by
    doc — one shuffle on doc id.
    """
    bench_grams = (
        benchmark.select(F.explode(ngrams(F.col(text_col), n)).alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams(F.col(text_col), n))).alias("__g"),
    )
    joined = doc_grams.join(F.broadcast(bench_grams), "__g", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
        .withColumn(
            "contamination",
            F.col("n_hit").cast("double") / F.col("n_ngrams").cast("double"),
        )
    )


def chunk_text(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking (the RAG/embedding-prep stage):
    each document emits overlapping ``size``-token windows advancing by
    ``size − overlap`` tokens. Chunk starts are 1, 1+step, … up to
    max(n − overlap, 1), so every token is covered and the final
    window may be short — the standard retrieval-chunking contract.

    One codegen projection builds the window list with higher-order
    array expressions and ONE posexplode emits the rows — no shuffle,
    no UDF; chunk arrays never exceed the document size. Output:
    (id, chunk_id 0-based, start 1-based token index, n_tokens, chunk).
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    step = size - overlap
    t = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(t) - overlap, F.lit(1)), F.lit(step)
    )
    chunks = F.transform(
        starts, lambda s: F.struct(
            s.cast("int").alias("start"),
            F.array_join(F.slice(t, s, size), " ").alias("chunk"),
            F.size(F.slice(t, s, size)).cast("int").alias("n_tokens"),
        )
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("c.start").alias("start"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk").alias("chunk"),
    )


def chunk_dedup(
    df: DataFrame,
    chunk_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "dedup_text",
) -> DataFrame:
    """In-document repetition removal: the text is cut into fixed
    ``chunk_tokens``-token windows; repeated chunks keep only their
    first occurrence; the survivors re-join in original order. The
    intra-doc analogue of exact dedup — catches boilerplate / crawler
    loops inside one document without touching cross-doc state.

    Scale shape: explode → two keyed aggregations (chunk first-pos per
    doc, then doc re-assembly). Both group on the doc id, so AQE plans
    them as one shuffle; chunk arrays never exceed the document size.
    """
    t = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(t) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.slice(t, (i - F.lit(1)) * chunk_tokens + 1, chunk_tokens)
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("__pos", "__chunk")
    )
    firsts = exploded.groupBy(id_col, "__chunk").agg(
        F.min("__pos").alias("__pos"), F.count("*").alias("__occ")
    )
    rebuilt = firsts.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__chunk"))),
                lambda s: s["__chunk"],
            ),
            " ",
        ).alias(out),
        F.count("*").alias("n_kept_chunks"),
        F.sum("__occ").alias("__total"),
    )
    return rebuilt.withColumn(
        "n_dropped_chunks",
        (F.col("__total") - F.col("n_kept_chunks")).cast("long"),
    ).drop("__total")


def pack_sequences(
    df: DataFrame,
    seq_tokens: int,
    by: list[str],
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget sequence packing: assign documents to fixed-budget
    training sequences ("packs") of ~``seq_tokens`` tokens each, the
    contiguous-fill packing a pretraining data loader performs when it
    concatenates documents up to the context length.

    Documents are taken in deterministic ``order_col`` order within each
    ``by`` group; a document's pack is ``floor(tokens_before/seq_tokens)``
    and ``pack_offset`` is its token offset inside the pack. Documents
    that straddle a boundary stay in the pack they start in (the loader
    splits them at read time) — the standard approximation, exact
    bookkeeping via the returned offsets.

    ``by`` is MANDATORY (like jaccard's block_col): packing is a running
    prefix sum, and an unpartitioned window would serialize the corpus
    through one task. At scale ``by`` is the shard key, so each shard
    packs independently in one window over its own partition.

    Scale shape: one shuffle (the ``by`` window); adds three codegen
    columns, no UDF, no second pass.
    """
    if not by:
        raise ValueError(
            "pack_sequences: 'by' is required — global packing would "
            "move the whole corpus through one window partition"
        )
    n = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum(n).over(w) - n).cast("long")
    return (
        df.withColumn("n_tokens", n.cast("long"))
        .withColumn("pack_id", F.floor(cum_before / seq_tokens).cast("long"))
        .withColumn("pack_offset", F.pmod(cum_before, F.lit(seq_tokens)).cast("long"))
    )


def remove_frequent_lines(
    docs: DataFrame,
    sep: str = " ",
    max_doc_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate removal (the Common Crawl cleaning step): drop every
    ``sep``-delimited unit that appears in more than ``max_doc_frac``
    of documents, preserving the surviving units' original order.

    Shape: posexplode the units, ONE document-frequency aggregate, a
    BROADCAST anti join against the (vocabulary-sized) frequent set,
    then a per-doc sort_array(collect_list(struct(pos, w))) rebuild —
    bounded by document length, the track_lines contract. Documents
    whose every unit is boilerplate come back as '' via the final left
    join rather than vanishing. The frequency threshold comparison is
    the same double division in engine and oracle. Output: (id_col,
    clean_text, n_removed).
    """
    if "\\E" in sep:
        raise ValueError(r"sep must not contain \E (regex-quote delimiter)")
    tok = docs.select(
        F.col(id_col).alias("__id"),
        # \Q...\E literal-quotes the separator: F.split takes a Java
        # REGEX while concat_ws re-joins with the literal — without the
        # quote a metachar sep (".", "|") splits at every character
        F.posexplode(F.split(F.col(text_col), "\\Q" + sep + "\\E")).alias("pos", "w"),
    )
    nd = docs.agg(F.countDistinct(id_col).alias("__n"))
    dfq = tok.groupBy("w").agg(F.countDistinct("__id").alias("__dfq"))
    freq = (
        dfq.crossJoin(F.broadcast(nd))
        .where(F.col("__dfq").cast("double") / F.col("__n").cast("double") > max_doc_frac)
        .select("w")
    )
    kept = tok.join(F.broadcast(freq), "w", "left_anti")
    reb = kept.groupBy("__id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))), lambda x: x["w"]
            ),
        ).alias("__clean"),
        F.count("*").alias("__nk"),
    )
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.size(F.split(F.col(text_col), "\\Q" + sep + "\\E")).cast("long").alias("__norig"),
    )
    return (
        base.join(reb, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("__clean"), F.lit("")).alias("clean_text"),
            (F.col("__norig") - F.coalesce(F.col("__nk"), F.lit(0))).alias("n_removed"),
        )
    )


def mixture_rates(
    docs: DataFrame,
    domain_col: str,
    weight_col: str,
    targets: dict,
) -> DataFrame:
    """Training-mixture planning: given per-domain token (or row)
    totals and a target budget per domain, the keep rate each domain
    needs — rate = min(1, target/available) — plus the expected kept
    weight; the step between corpus profiling and stratified_sample's
    execution of the rates.

    One hash aggregate per domain joined BROADCAST against the
    (tiny, caller-supplied) target table; domains without a target
    get rate NULL (report-only rows), targets without a domain are
    dropped. Exact integer sums; rate is one double division, round
    6. Output: (domain, available, target, rate, expected_kept).
    """
    spark = docs.sparkSession
    t = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(targets.items())],
        f"{domain_col} string, target long",
    )
    avail = docs.groupBy(F.col(domain_col).cast("string").alias(domain_col)).agg(
        F.sum(F.col(weight_col).cast("long")).alias("available")
    )
    j = avail.join(F.broadcast(t), domain_col, "left")
    # the isNotNull guard matters: least() IGNORES nulls in BOTH Spark
    # and DuckDB, so an untargeted domain would silently read rate 1.0
    # (keep everything) instead of NULL — the track_length class of
    # cross-engine-invisible bug, caught by the golden test
    rate = F.round(
        F.when(
            F.col("target").isNotNull(),
            F.least(F.lit(1.0), F.col("target").cast("double") / F.col("available")),
        ),
        6,
    )
    return j.select(
        domain_col,
        "available",
        "target",
        rate.alias("rate"),
        F.round(rate * F.col("available"), 6).alias("expected_kept"),
    )
