"""Deduplication for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale design: every stage is built-in Column expressions over arrays —
the per-document signature work is embarrassingly parallel in one
codegen stage, and the only shuffles are (a) the hash-groupBy for exact
dedup and (b) the band-bucket equi-join for LSH candidates, both on
well-distributed hash keys. Candidate verification (exact Jaccard) runs
only on bucket pairs, never all-pairs. No reference analogue (GeoMesa
is geospatial); these extend the engine per the build brief.

Hash function contract (keeps the DuckDB oracle bit-exact): token/
shingle base hash = first 7 hex chars of md5 → 28-bit int; minhash
permutations are ``(a_i·h + b_i) mod 2^31-1`` with a_i, b_i derived
from the permutation index by LCG arithmetic — all products < 2^59, no
int64 overflow under ANSI mode.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger("geomesa_spark.dedup")

__all__ = [
    "exact_dedup",
    "shingles",
    "token_hash",
    "with_minhash",
    "lsh_candidate_pairs",
    "dedup_clusters",
    "with_simhash",
    "ngram_jaccard_pairs",
]

MERSENNE_P = 2_147_483_647  # 2^31 - 1
LCG_A = 1_103_515_245
LCG_C = 12_345
MIX = 2_654_435_761

SIMHASH_BITS = 60  # 15 hex chars of md5 → < 2^60


def token_hash(c: Column) -> Column:
    """28-bit deterministic string hash (md5-prefix), oracle-portable."""
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def _perm_consts(i: int) -> tuple[int, int]:
    a = ((LCG_A * (i + 1) + LCG_C) % MERSENNE_P) | 1
    b = (MIX * (i + 1)) % MERSENNE_P
    return a, b


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one row per distinct text, keeping
    the smallest key (hash-groupBy; map-side partial min)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(key_col).alias("keep_key"), F.count("*").alias("n_dups"))
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (k consecutive tokens, space-joined)."""
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.array_distinct(sh)


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_k: int = 3,
    out: str = "minhash",
) -> DataFrame:
    """MinHash signature: sig_i = min over shingles of (a_i·h + b_i) mod P.

    Built-ins only: shingle → md5-prefix hash → array_min of a
    transformed array per permutation; the signature is an
    array<bigint> column.
    """
    sh = shingles(F.col(text_col), shingle_k)
    hs = F.transform(sh, token_hash)

    def perm(a: int, b: int):
        return lambda h: (h * a + b) % MERSENNE_P

    sigs = []
    for i in range(n_hashes):
        a, b = _perm_consts(i)
        sigs.append(F.array_min(F.transform(hs, perm(a, b))))
    return df.withColumn(out, F.array(*sigs))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    key_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int | None = 10_000,
    log_drops: bool = True,
) -> DataFrame:
    """LSH banding: docs sharing any full band of their signature become
    a candidate pair. Shuffle is the (band, band_key) equi-join — hash
    keys distribute uniformly, and the join is self-equi with a < guard
    so each unordered pair appears once.

    ``max_bucket`` caps the self-join blowup: a degenerate bucket of m
    identical docs yields m²/2 pairs, so one 10⁶-doc flood bucket would
    dominate the whole job. Buckets larger than the cap are dropped
    BEFORE the join (anti-join against the hot-bucket list) and the
    drop is logged — no silent truncation. Pass ``max_bucket=None`` to
    disable. Exact dedup (content-hash groupBy) already collapses true
    duplicates upstream, so capped buckets are near-dup floods an LSH
    pass is allowed to under-report.
    """
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = sig_df.select(F.col(key_col), F.col(sig_col), band_idx)
    banded = banded.select(
        key_col,
        "band",
        F.concat_ws(",", F.transform(
            F.slice(F.col(sig_col), F.col("band") * rows_per_band + 1, rows_per_band),
            lambda x: x.cast("string"),
        )).alias("band_key"),
    )
    if max_bucket is not None:
        # the sizing aggregation, the drop-log and the anti-join all
        # consume `banded`; checkpoint it (lazy — materializes on the
        # sizing job) so the shingle→minhash→band projection is computed
        # ONCE instead of re-derived per consumer
        banded = banded.localCheckpoint(eager=False)
        sizes = banded.groupBy("band", "band_key").agg(F.count("*").alias("__bn"))
        hot = sizes.where(F.col("__bn") > max_bucket)
        if log_drops:
            d = hot.agg(
                F.count("*").alias("n"), F.coalesce(F.sum("__bn"), F.lit(0)).alias("rows")
            ).collect()[0]
            if d["n"]:
                _LOG.warning(
                    "lsh_candidate_pairs: dropped %d hot buckets (%d banded rows) "
                    "over max_bucket=%d",
                    int(d["n"]), int(d["rows"]), max_bucket,
                )
        banded = banded.join(
            F.broadcast(hot.select("band", "band_key")), ["band", "band_key"], "left_anti"
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("key_a"),
            F.col(f"b.{key_col}").alias("key_b"),
        )
        .distinct()
    )
    return pairs


def dedup_clusters(
    pairs: DataFrame,
    key_a: str = "key_a",
    key_b: str = "key_b",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the
    candidate-pair graph via HashMin label propagation (the standard
    large-scale CC shape — each round every node adopts the minimum
    label among itself and its neighbors; converges in O(component
    diameter) rounds, and near-dup clusters are nearly cliques, so
    typically 2-4).

    Spark shape: a bounded driver loop of equi-joins; labels are
    localCheckpoint'ed each round so lineage stays flat, and the loop
    exits on a converged round (changed == 0 — the convergence count
    rides the same aggregation). Each round ALSO pointer-jumps (every
    node adopts its label's label), so long chains converge in
    O(log diameter) rounds rather than O(diameter) — a 60-cell snake
    finishes in ~6 rounds, not 60. Raises RuntimeError if max_iter is
    exhausted before the fixpoint: silently-unconverged labels split
    one component into many (the round-5 self-review reproduced
    exactly that on grid_dbscan before the jump + raise existed).
    Output: (node, label) with label = min doc key of the component —
    the canonical representative to keep, everything else is the
    duplicate set.
    """
    e = pairs.select(F.col(key_a).alias("src"), F.col(key_b).alias("dst"))
    e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    e = e.localCheckpoint(eager=True)
    labels = (
        e.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = e.join(labels, e["dst"] == labels["node"]).select(
            F.col("src").alias("node"), "label"
        )
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: label <- label(label). Labels are always node
        # ids present in the table, so the left join hits unless the
        # label is already a root (then keep it).
        jump = new.select(F.col("node").alias("__jn"), F.col("label").alias("__jl"))
        new = (
            new.join(jump, new["label"] == jump["__jn"], "left")
            .select("node", F.coalesce("__jl", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("label", "__old"), "node")
            .where(F.col("label") != F.col("__old"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"dedup_clusters did not converge in max_iter={max_iter} rounds; "
        "labels would be silently wrong — raise max_iter"
    )


def with_simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    """SimHash over token hashes: bit j of the output is the sign of
    sum over tokens of (2·bit_j(h60(token)) − 1), h60 = 60-bit
    md5-prefix. Nested higher-order folds — still one codegen stage.
    At extreme scale swap for a pandas-UDF bit-count kernel; the
    built-in form keeps the oracle exact.
    """
    sim = F.expr(
        f"""
        aggregate(sequence(0, {SIMHASH_BITS - 1}), cast(0 as bigint), (acc, j) -> acc +
          CASE WHEN aggregate(
              transform(split({text_col}, ' '),
                        t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)),
              cast(0 as bigint),
              (a, h) -> a + (shiftrightunsigned(h, j) & cast(1 as bigint)) * 2 - 1) > 0
          THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END)
        """
    )
    return df.withColumn(out, sim)


def simhash_pairs(
    sig_df: DataFrame,
    key_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = SIMHASH_BITS,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """SimHash near-dup pairs: Hamming(sig_a, sig_b) ≤ ``max_hamming``.

    Banding makes this EXACT, not approximate: with the signature split
    into ``bands`` equal slices, two signatures within Hamming distance
    d < bands must share at least one slice untouched (pigeonhole), so
    the (band, slice) self-equi-join loses no qualifying pair; the
    refine is a codegen popcount on the XOR. Same bucketed-join /
    hot-bucket-cap shape as the MinHash-LSH pass.

    Output: (key_a, key_b, hamming) with key_a < key_b, one row/pair.
    """
    width = bits // bands
    mask = (1 << width) - 1
    banded = sig_df.select(
        F.col(key_col), F.col(sig_col),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        # shiftrightunsigned's bits arg is int-only in the Python API;
        # expr() accepts the per-row band column
        "band_key",
        F.expr(f"shiftrightunsigned({sig_col}, band * {width}) & {mask}"),
    )
    if max_bucket is not None:
        banded = banded.localCheckpoint(eager=False)
        hot = (
            banded.groupBy("band", "band_key")
            .agg(F.count("*").alias("__bn"))
            .where(F.col("__bn") > max_bucket)
            .select("band", "band_key")
        )
        banded = banded.join(F.broadcast(hot), ["band", "band_key"], "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("key_a"),
            F.col(f"b.{key_col}").alias("key_b"),
            F.bit_count(
                F.col(f"a.{sig_col}").bitwiseXOR(F.col(f"b.{sig_col}"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["key_a", "key_b"])
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    shingle_k: int = 1,
    threshold: float = 0.5,
    allow_full_cartesian: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within a blocking key
    (all-pairs inside a block only — the block is the scale guard;
    use LSH candidates as the block at corpus scale).

    ``block_col`` is REQUIRED: without it the self-join is an n²
    cartesian over the whole corpus, which silently "works" on test
    data and dies at scale. The escape hatch ``allow_full_cartesian``
    exists for small ad-hoc sets and says what it does on the tin.

    jaccard = |A ∩ B| / |A ∪ B| over distinct shingle sets — integer
    sizes, single double division.
    """
    if block_col is None and not allow_full_cartesian:
        raise ValueError(
            "ngram_jaccard_pairs: block_col is required (all-pairs cartesian "
            "otherwise); pass allow_full_cartesian=True only for small inputs"
        )
    sh = df.select(
        F.col(key_col),
        *( [F.col(block_col)] if block_col else [] ),
        shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{key_col}") < F.col(f"b.{key_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter.cast("double") / union
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{key_col}").alias("key_a"),
            F.col(f"b.{key_col}").alias("key_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
