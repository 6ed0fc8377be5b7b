"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and hyperplane-LSH bucketed ANN (scale path).

Scale design: brute force is a broadcast nested-loop of the (small)
query set against the corpus — one scan, no shuffle, rank via window
per query. The LSH variant buckets both sides by the sign-pattern of P
pseudo-random hyperplanes (deterministic integer arithmetic, no RNG
state) and only ranks within buckets — candidate count drops ~2^P-fold;
at 100 TB the bucket column doubles as the table's partition key so
queries prune to matching buckets. All expressions are built-ins
(zip_with/aggregate folds) — no Python in the hot path.

No reference analogue (GeoMesa is geospatial); extends the engine per
the build brief's training-data requirements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "norm",
    "cosine_topk",
    "range_search",
    "scalar_quantize",
    "pq_codebooks_from_rows",
    "pq_encode",
    "pq_adc_topk",
    "with_lsh_bucket",
    "lsh_cosine_topk",
    "ivf_assign",
    "ivf_topk",
    "train_ivf_centroids",
    "cosine_dup_pairs",
    "embedding_covariance",
    "recall_at_k",
    "centroid_distances",
    "silhouette_simplified",
]

MIX = 2_654_435_761
PLANE_STRIDE = 1_000_003


def _dbl(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order → oracle-stable)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector the k most
    similar corpus vectors (self excluded).

    Output: (q_vec_id, vec_id, sim_r, rank). Ranking uses the
    similarity rounded to ``round_digits`` with the corpus id as
    tie-break — deterministic across engines/summation orders.
    """
    q = queries.select(
        F.col(id_col).alias("q_vec_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    cand = c.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("q_vec_id"))
    sim = dot(F.col("c_vec"), F.col("q_vec")) / (F.col("c_norm") * F.col("q_norm"))
    cand = cand.withColumn("sim_r", F.round(sim, round_digits))
    w = Window.partitionBy("q_vec_id").orderBy(F.col("sim_r").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_vec_id", id_col, "sim_r", F.col("rank").cast("int").alias("rank"))
    )


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Radius similarity search: every corpus vector with cosine ≥ tau
    per query (the range-query dual of cosine_topk — near-duplicate
    harvesting, contamination sweeps, cluster seeding).

    Baseline tier: broadcast the (small) query side and stream the
    corpus through one codegen stage — no shuffle at all; the LSH-
    bucketed path (with_lsh_bucket + a bucket equi-join) is the scale
    remedy when the query side is large, exactly as for top-k. The
    threshold compares the ROUNDED similarity (same contract as
    cosine_topk) so the selected set is engine-independent.

    Output: (q_vec_id, vec_id, sim_r), self-pairs excluded."""
    q = queries.select(
        F.col(id_col).alias("q_vec_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    cand = c.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("q_vec_id"))
    sim = dot(F.col("c_vec"), F.col("q_vec")) / (F.col("c_norm") * F.col("q_norm"))
    return (
        cand.withColumn("sim_r", F.round(sim, round_digits))
        .where(F.col("sim_r") >= tau)
        .select("q_vec_id", id_col, "sim_r")
    )


def scalar_quantize(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-dimension min-max scalar quantization (SQ8-style): float
    embeddings → small-int codes, the 4× storage/bandwidth compression
    a 100 TB embedding corpus applies before ANN serving (FAISS
    ScalarQuantizer / SQfp semantics, public).

    code_i = clamp(floor((x_i - min_i) / (max_i - min_i) * (2^bits-1)))
    with a constant dimension (max == min) coding to 0. The per-dim
    stats come from posexplode → groupBy(pos) min/max → ONE tiny
    (dim-row) aggregate re-assembled into broadcast array literals —
    the vector table itself never shuffles, and the quantize step is a
    single codegen transform() with an index lambda. Arithmetic is
    division/multiply of exact doubles in a fixed order, so the codes
    are engine-exact (DuckDB oracle matches bit-for-bit).

    Output: id_col, ``codes array<int>`` plus ``mins``/``maxs``
    (array<double>) riding along for dequantization."""
    levels = float((1 << bits) - 1)
    pos = vectors.select(
        F.posexplode(_dbl(F.col(vec_col))).alias("pos", "x")
    )
    stats = pos.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    # dim rows → two array literals in ONE row, ordered by pos
    packed = stats.agg(
        F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))).alias("s")
    ).select(
        F.transform("s", lambda r: r["mn"]).alias("mins"),
        F.transform("s", lambda r: r["mx"]).alias("maxs"),
    )
    q = F.transform(
        _dbl(F.col(vec_col)),
        lambda x, i: F.when(
            F.element_at(F.col("maxs"), i + 1) > F.element_at(F.col("mins"), i + 1),
            F.least(
                F.greatest(
                    F.floor(
                        (x - F.element_at(F.col("mins"), i + 1))
                        / (
                            F.element_at(F.col("maxs"), i + 1)
                            - F.element_at(F.col("mins"), i + 1)
                        )
                        * levels
                    ),
                    F.lit(0),
                ),
                F.lit(int(levels)),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return (
        vectors.crossJoin(F.broadcast(packed))
        .withColumn("codes", q)
        .select(id_col, "codes", "mins", "maxs")
    )


def pq_codebooks_from_rows(
    vectors: DataFrame,
    m: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Data-seeded PQ codebooks: per block, the sub-vectors of the first
    ``k`` rows by id (deterministic — the same centroids-are-data-rows
    device the IVF oracle uses, so encode/search mechanics are certified
    independently of training; refine with train_ivf_centroids per block
    when quality matters). Driver-bounded collect: k rows × dim floats."""
    rows = (
        vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    dim = len(rows[0][0])
    d = dim // m
    return [
        [[float(x) for x in r[0][b * d : (b + 1) * d]] for r in rows]
        for b in range(m)
    ]


def _pq_lit(codebooks: list) -> Column:
    """m × k × d nested array literal (broadcast into codegen)."""
    return F.array(*[
        F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in block])
        for block in codebooks
    ])


def _l2(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 — deterministic order, oracle-stable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization encode (FAISS PQ semantics, public): split
    each vector into m blocks, store per block the id of the nearest
    codebook centroid (squared L2, first-minimum tie-break = lowest
    code). dim → m bytes at k ≤ 256: the ~32× compression a 100 TB
    embedding corpus stores and serves.

    Spark shape: the m×k×d codebook rides as a nested array LITERAL, so
    encoding is ONE codegen projection over the corpus — no join, no
    shuffle, nothing collected. Output: id_col, ``codes array<int>``
    (length m)."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    cb = _pq_lit(codebooks)
    v = _dbl(F.col(vec_col))
    code_b = lambda b: (  # noqa: E731
        F.array_position(
            F.transform(
                F.element_at(cb, b + 1),
                lambda c: _l2(F.slice(v, b * d + 1, d), c),
            ),
            F.array_min(
                F.transform(
                    F.element_at(cb, b + 1),
                    lambda c: _l2(F.slice(v, b * d + 1, d), c),
                )
            ),
        ).cast("int")
        - 1
    )
    codes = F.array(*[code_b(b) for b in range(m)])
    return vectors.select(F.col(id_col), codes.alias("codes"))


def pq_adc_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: list,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: approximate squared L2 from
    a query to an ENCODED vector = Σ_b ‖q_b − centroid[code_b]‖² — the
    corpus is touched only through its m-byte codes. Queries broadcast;
    distance is a fold over blocks of literal-codebook lookups — one
    codegen stage over |corpus|×|queries|, no shuffle but the final
    top-k window. Ranking uses the ROUNDED distance with the corpus id
    tie-break (cross-engine deterministic, as cosine_topk).

    Output: (q_vec_id, vec_id, adc_r, rank)."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    cb = _pq_lit(codebooks)
    q = queries.select(
        F.col(id_col).alias("q_vec_id"), _dbl(F.col(vec_col)).alias("q_vec")
    )
    cand = encoded.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("q_vec_id"))
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, b: acc
        + _l2(
            F.slice(F.col("q_vec"), b * d + 1, F.lit(d)),
            F.element_at(
                F.element_at(cb, b + 1), F.element_at(F.col("codes"), b + 1) + 1
            ),
        ),
    )
    cand = cand.withColumn("adc_r", F.round(adc, round_digits))
    w = Window.partitionBy("q_vec_id").orderBy(F.col("adc_r").asc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_vec_id", id_col, "adc_r", F.col("rank").cast("int").alias("rank"))
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF coarse quantization: each vector joins its top-``nprobe``
    centroids by inner product (sequential-fold dot — deterministic and
    oracle-reproducible; ties break on centroid id).

    Spark shape: broadcast the (small) centroid table, score with a
    codegen fold, rank with a per-vector window. At extreme dimension ×
    centroid counts the scoring kernel would move to a mapInPandas
    matrix multiply; the join/window shape stays identical.

    Output: vectors' columns + (k_id, score, probe_rank).
    """
    c = centroids.select(F.col(id_col).alias("k_id"), F.col(vec_col).alias("c_vec"))
    scored = vectors.crossJoin(F.broadcast(c)).withColumn(
        "score", dot(F.col(vec_col), F.col("c_vec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("k_id").asc())
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .where(F.col("probe_rank") <= nprobe)
        .drop("c_vec")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Offline spherical k-means coarse quantizer for IVF (Dhillon &
    Modha 2001) — the training job :func:`ivf_topk`'s docstring defers
    to; assignment metric is the SAME max-inner-product as
    ``ivf_assign``, so trained centroids drop in without touching the
    query shape.

    Scale shape: a bounded driver loop of Lloyd rounds, each round two
    Spark jobs — (1) assignment via the broadcast-centroid codegen dot,
    (2) mean update via posexplode → groupBy(cluster, dim) sum/count
    (map-side partial agg; k×dim rows collected, driver-bounded by
    construction). Seeds are the k corpus vectors with the smallest
    xxhash64(id): deterministic, data-order-independent, no RNG.
    Empty clusters keep their previous centroid; centroids are unit-
    normalized each round (spherical update) so max-dot == max-cosine.

    Returns a DataFrame (``id_col``, ``vec_col``) of k centroids,
    directly usable as ``ivf_topk(centroids=...)``.
    """
    import numpy as np

    spark = corpus.sparkSession
    base = corpus.select(id_col, vec_col)
    seeds = (
        base.withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h", F.col(id_col))
        .limit(k)
        .select(vec_col)
        .collect()
    )
    cents = [np.asarray(r[0], dtype=np.float64) for r in seeds]
    cents = [c / (np.linalg.norm(c) or 1.0) for c in cents]
    dim = len(cents[0])

    def _cdf(cs):
        return spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cs)],
            f"{id_col} long, {vec_col} array<double>",
        )

    for _ in range(max(0, iters)):
        assigned = ivf_assign(base, _cdf(cents), id_col, vec_col, nprobe=1)
        rows = (
            assigned.select("k_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("k_id", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        sums = {}
        for r in rows:
            sums.setdefault(int(r["k_id"]), np.zeros(dim))[int(r["pos"])] = r["s"] / r["n"]
        new = []
        for i, old in enumerate(cents):
            m = sums.get(i)
            if m is None:
                new.append(old)  # empty cluster: keep previous centroid
                continue
            nrm = np.linalg.norm(m)
            new.append(m / nrm if nrm > 0 else old)
        cents = new
    return _cdf(cents)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate nearest neighbors (the inverted-file scale path
    next to hyperplane LSH): corpus vectors are listed under their
    nearest centroid; a query scans only its ``nprobe`` nearest
    centroids' lists and ranks them exactly.

    Centroids here are the first ``n_centroids`` corpus vectors — a
    deterministic, training-free coarse quantizer the DuckDB oracle can
    re-derive bit-for-bit; pass ``centroids=train_ivf_centroids(...)``
    to use the offline spherical-k-means quantizer instead — the query
    shape is unchanged. At
    100 TB the corpus's ``cluster`` column is the table's partition
    key, so a query prunes to nprobe partitions.

    Output shape matches cosine_topk: (q_vec_id, vec_id, sim_r, rank).
    """
    cents = (
        centroids
        if centroids is not None
        else corpus.where(F.col(id_col) < n_centroids)
    )
    listed = ivf_assign(corpus, cents, id_col, vec_col, nprobe=1).select(
        F.col(id_col),
        F.col(vec_col).alias("c_vec2"),
        norm(F.col(vec_col)).alias("c_norm"),
        F.col("k_id").alias("cluster"),
    )
    probes = ivf_assign(queries, cents, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("q_vec_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.col("k_id").alias("cluster"),
    )
    cand = listed.join(F.broadcast(probes), on="cluster").where(
        F.col(id_col) != F.col("q_vec_id")
    )
    sim = dot(F.col("c_vec2"), F.col("q_vec")) / (F.col("c_norm") * F.col("q_norm"))
    cand = cand.withColumn("sim_r", F.round(sim, round_digits))
    w = Window.partitionBy("q_vec_id").orderBy(F.col("sim_r").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_vec_id", id_col, "sim_r", F.col("rank").cast("int").alias("rank"))
    )


def _plane_component(p: int, i: Column) -> Column:
    """Deterministic ±1 hyperplane component for plane p, dimension i."""
    bit = F.shiftrightunsigned((F.lit(p * PLANE_STRIDE) + i) * MIX, 13).bitwiseAND(F.lit(1))
    return (bit * 2 - 1).cast("double")


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    out: str = "bucket",
    plane_offset: int = 0,
) -> DataFrame:
    """Adds the hyperplane-sign bucket id (0..2^n_planes-1);
    ``plane_offset`` selects an independent plane family (one per LSH
    table in the multi-table variant)."""
    v = _dbl(F.col(vec_col))

    def plane_fn(p: int):
        return lambda i: _plane_component(p + plane_offset, i)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1), plane_fn(p)),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out, bucket)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    round_digits: int = 6,
    n_tables: int = 1,
) -> DataFrame:
    """Bucketed ANN: rank only within the query's hyperplane bucket(s).
    Approximate (recall < 1 by construction); same output shape as
    cosine_topk.

    ``n_tables`` > 1 is the multi-table recall remedy: each table
    hashes with an independent plane family, candidates are the UNION
    of per-table bucket matches (deduped before ranking) — recall rises
    toward 1 exponentially in the table count while the per-table join
    stays a bucketed equi-join."""
    pair_frames = []
    for t in range(n_tables):
        off = t * n_planes
        c = with_lsh_bucket(corpus, vec_col, n_planes, plane_offset=off)
        q = with_lsh_bucket(queries, vec_col, n_planes, plane_offset=off)
        q = q.select(F.col(id_col).alias("q_vec_id"), F.col("bucket"))
        c = c.select(F.col(id_col), "bucket")
        pair_frames.append(
            c.join(F.broadcast(q), on="bucket").select("q_vec_id", id_col)
        )
    pairs = pair_frames[0]
    for pf in pair_frames[1:]:
        pairs = pairs.unionByName(pf)
    pairs = pairs.where(F.col(id_col) != F.col("q_vec_id")).distinct()

    q_side = queries.select(
        F.col(id_col).alias("q_vec_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c_side = corpus.select(
        F.col(id_col), F.col(vec_col).alias("c_vec"), norm(F.col(vec_col)).alias("c_norm")
    )
    cand = pairs.join(F.broadcast(q_side), on="q_vec_id").join(c_side, on=id_col)
    sim = dot(F.col("c_vec"), F.col("q_vec")) / (F.col("c_norm") * F.col("q_norm"))
    cand = cand.withColumn("sim_r", F.round(sim, round_digits))
    w = Window.partitionBy("q_vec_id").orderBy(F.col("sim_r").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_vec_id", id_col, "sim_r", F.col("rank").cast("int").alias("rank"))
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    round_digits: int = 6,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the embedding leg of the
    dedup suite (next to MinHash/SimHash/Jaccard): a SELF-join within
    hyperplane-LSH buckets, exact cosine refine at ``threshold``.

    Scale shape: the join is a bucketed equi-join (2^n_planes-fold
    candidate reduction; two vectors at cosine s share one plane's sign
    w.p. 1 − acos(s)/π, so high-similarity pairs concentrate in shared
    buckets; recall rises with more tables — callers union plane
    families like lsh_cosine_topk). ``max_bucket`` caps a flood bucket
    exactly like dedup.lsh_candidate_pairs: an m-vector degenerate
    bucket would emit m²/2 candidates, so oversized buckets drop via
    anti-join before the join (approximation an LSH pass is allowed —
    the exact-dup layer upstream catches true duplicates).

    Output: (key_a, key_b, sim_r) with key_a < key_b, one row per pair.
    """
    b = with_lsh_bucket(corpus, vec_col, n_planes).select(
        F.col(id_col), F.col("bucket"), F.col(vec_col).alias("__vec"),
        norm(F.col(vec_col)).alias("__norm"),
    )
    if max_bucket is not None:
        b = b.localCheckpoint(eager=False)
        hot = (
            b.groupBy("bucket").agg(F.count("*").alias("__bn"))
            .where(F.col("__bn") > max_bucket)
            .select("bucket")
        )
        b = b.join(F.broadcast(hot), "bucket", "left_anti")
    a = b.select(
        F.col(id_col).alias("key_a"), F.col("bucket"),
        F.col("__vec").alias("__va"), F.col("__norm").alias("__na"),
    )
    c = b.select(
        F.col(id_col).alias("key_b"), F.col("bucket"),
        F.col("__vec").alias("__vb"), F.col("__norm").alias("__nb"),
    )
    cand = a.join(c, on="bucket").where(F.col("key_a") < F.col("key_b"))
    sim = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        cand.withColumn("sim_r", F.round(sim, round_digits))
        .where(F.col("sim_r") >= threshold)
        .select("key_a", "key_b", "sim_r")
    )


def embedding_covariance(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Population covariance matrix of the embedding dimensions — the
    PCA/whitening precursor of an embedding pipeline (and the input a
    Mahalanobis near-dup metric needs).

    Upper triangle only (i <= j): each vector posexplodes its dims,
    then a second posexplode over slice(v, i+1, d-i) yields the pair
    products — a d(d+1)/2 fan-out that map-side partials collapse
    BEFORE the shuffle, so only (#partitions x d^2/2) partial rows
    move. Products are computed in double (one rounding) and summed as
    DECIMAL(30,12) — order-independent; dim means join back broadcast
    (d rows). cov = Sxy/n - (Si/n)(Sj/n), round 6. Output: (i, j, n,
    cov).
    """
    e = emb.select(F.col(vec_col).alias("v"))
    a = e.select("v", F.posexplode("v").alias("i", "xi")).select(
        "v", "i", F.col("xi").cast("double").alias("xi")
    )
    p = a.select(
        "i",
        "xi",
        F.expr("posexplode(slice(v, i + 1, size(v) - i))").alias("dj", "xj"),
    ).select(
        "i",
        (F.col("i") + F.col("dj")).alias("j"),
        "xi",
        F.col("xj").cast("double").alias("xj"),
    )
    s2 = p.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.sum((F.col("xi") * F.col("xj")).cast("decimal(30,12)")).alias("sxy"),
    )
    s1 = a.groupBy("i").agg(F.sum(F.col("xi").cast("decimal(30,12)")).alias("s"))
    si = s1.select(F.col("i").alias("__i"), F.col("s").alias("__si"))
    sj = s1.select(F.col("i").alias("__j"), F.col("s").alias("__sj"))
    n = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") / n - (
        F.col("__si").cast("double") / n
    ) * (F.col("__sj").cast("double") / n)
    return (
        s2.join(F.broadcast(si), s2["i"] == si["__i"])
        .join(F.broadcast(sj), s2["j"] == sj["__j"])
        .select("i", "j", "n", F.round(cov, 6).alias("cov"))
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "q_vec_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall of an approximate ANN result against the exact top-k —
    the evaluation loop an embedding pipeline runs before trusting an
    index (LSH table count, IVF nprobe) at scale: per query,
    |approx ∩ exact| / |exact|.

    One LEFT join of the exact rows against the approx rows on
    (query, id) — both results are ≤ |queries|·k rows, tiny next to
    the corpus — then one hash aggregate. Exact integer counts; recall
    is one double division, round 6. Output: (query_col, n_exact,
    n_hit, recall).
    """
    # distinct both sides: a duplicated (query, id) in either input
    # (e.g. unioned multi-table candidates) would multiply join rows
    # and corrupt n_exact and the recall ratio
    e = exact.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__i")
    ).distinct()
    a = approx.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__i")
    ).distinct().withColumn("__hit", F.lit(1))
    per = (
        e.join(a, ["__q", "__i"], "left")
        .groupBy("__q")
        .agg(
            F.count("*").alias("n_exact"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    return per.select(
        F.col("__q").alias(query_col),
        "n_exact",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 6).alias("recall"),
    )



def _label_centroids(
    emb: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """Per-(label, dim) centroid means with DECIMAL(30,12)
    order-independent sums — the load-bearing exact-mean block shared
    by centroid_distances and silhouette_simplified so its precision
    contract can never drift between them. Output: (lbl, i, m)."""
    a = emb.select(
        F.col(label_col).alias("lbl"), F.posexplode(vec_col).alias("i", "x")
    ).select("lbl", "i", F.col("x").cast("double").alias("x"))
    return a.groupBy("lbl", "i").agg(
        (
            F.sum(F.col("x").cast("decimal(30,12)")).cast("double")
            / F.count("*").cast("double")
        ).alias("m")
    )


def centroid_distances(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise L2 distance between per-label embedding centroids —
    the cluster-separation report (are the classes distinguishable in
    embedding space? which pairs collide?).

    Centroids: one posexplode + (label, dim) hash aggregate with
    DECIMAL(30,12) sums (order-independent), mean = one double
    division. Distances: a dim equi-join of the label pairs
    (label_a < label_b) — |labels|²·d/2 rows, tiny — per-dim squared
    differences rounded to 6 then DECIMAL-summed (the repo's
    order-independent double-sum pattern), dist = sqrt of the exact
    decimal total. Output: (label_a, label_b, dist2, dist) round 6.
    """
    cent = _label_centroids(emb, label_col, vec_col)
    ca = cent.select(F.col("lbl").alias("label_a"), "i", F.col("m").alias("ma"))
    cb = cent.select(F.col("lbl").alias("label_b"), "i", F.col("m").alias("mb"))
    pairs = ca.join(cb, "i").where(F.col("label_a") < F.col("label_b"))
    d = F.col("ma") - F.col("mb")
    term = F.round(d * d, 6).cast("decimal(25,6)")
    agg = pairs.groupBy("label_a", "label_b").agg(F.sum(term).alias("d2"))
    d2 = F.col("d2").cast("double")
    return agg.select(
        "label_a",
        "label_b",
        F.round(d2, 6).alias("dist2"),
        F.round(F.sqrt(d2), 6).alias("dist"),
    )


def silhouette_simplified(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Simplified silhouette per label (the centroid-based variant:
    a = distance to the OWN centroid, b = distance to the nearest
    OTHER centroid, s = (b−a)/max(a,b)) — the clustering-quality
    report beside centroid_distances' separation matrix, at
    O(N·k·d) instead of the exact silhouette's O(N²·d).

    Centroids: decimal-exact dim means (the centroid_distances pass).
    Point-to-centroid distances: the point's exploded dims equi-join
    the k·d centroid rows on the dim index — N·k·d rows collapsing
    map-side into one (point, centroid) aggregate of round-6
    DECIMAL-summed squared differences; a and b come from ONE
    conditional aggregate per point (no second join). Per-label mean
    silhouette is a round-6 decimal sum / n. s is defined 0 when
    a = b = 0 (a point exactly on its lone centroid). Output:
    (label, n, mean_s) round 6.
    """
    pt = emb.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("plbl"),
        F.posexplode(vec_col).alias("i", "x"),
    ).select("vid", "plbl", "i", F.col("x").cast("double").alias("x"))
    cent = _label_centroids(emb, label_col, vec_col)
    j = pt.join(cent.select(F.col("lbl").alias("clbl"), "i", "m"), "i")
    d = F.col("x") - F.col("m")
    term = F.round(d * d, 6).cast("decimal(25,6)")
    d2 = j.groupBy("vid", "plbl", "clbl").agg(F.sum(term).alias("d2"))
    dist = F.sqrt(F.col("d2").cast("double"))
    per_pt = d2.groupBy("vid", "plbl").agg(
        F.min(F.when(F.col("clbl") == F.col("plbl"), dist)).alias("a"),
        F.min(F.when(F.col("clbl") != F.col("plbl"), dist)).alias("b"),
    )
    mx = F.greatest(F.col("a"), F.col("b"))
    sil = F.when(mx > 0.0, (F.col("b") - F.col("a")) / mx).otherwise(F.lit(0.0))
    return per_pt.groupBy(F.col("plbl").alias(label_col)).agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round(sil, 6).cast("decimal(20,6)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("mean_s"),
    )
