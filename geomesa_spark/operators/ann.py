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

__all__ = ["dot", "norm", "cosine_topk", "with_lsh_bucket", "lsh_cosine_topk"]

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


def _plane_component(p: int, i: Column) -> Column:
    """Deterministic ±1 hyperplane component for plane p, dimension i."""
    bit = F.shiftrightunsigned((F.lit(p * PLANE_STRIDE) + i) * MIX, 13).bitwiseAND(F.lit(1))
    return (bit * 2 - 1).cast("double")


def with_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, out: str = "bucket"
) -> DataFrame:
    """Adds the hyperplane-sign bucket id (0..2^n_planes-1)."""
    v = _dbl(F.col(vec_col))

    def plane_fn(p: int):
        return lambda i: _plane_component(p, i)

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
) -> DataFrame:
    """Bucketed ANN: rank only within the query's hyperplane bucket.
    Approximate (recall < 1 by construction); same output shape as
    cosine_topk."""
    c = with_lsh_bucket(corpus, vec_col, n_planes)
    q = with_lsh_bucket(queries, vec_col, n_planes)
    q = q.select(
        F.col(id_col).alias("q_vec_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.col("bucket"),
    )
    c = c.select(
        F.col(id_col), F.col(vec_col).alias("c_vec"), norm(F.col(vec_col)).alias("c_norm"), "bucket"
    )
    cand = c.join(F.broadcast(q), on="bucket").where(F.col(id_col) != F.col("q_vec_id"))
    sim = dot(F.col("c_vec"), F.col("q_vec")) / (F.col("c_norm") * F.col("q_norm"))
    cand = cand.withColumn("sim_r", F.round(sim, round_digits))
    w = Window.partitionBy("q_vec_id").orderBy(F.col("sim_r").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_vec_id", id_col, "sim_r", F.col("rank").cast("int").alias("rank"))
    )
