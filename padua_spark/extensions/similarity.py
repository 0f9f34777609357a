"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (a single map +
top-k reduce — no shuffle of the corpus); the scale path is
LSH-bucketed search (random-hyperplane signs) which prunes candidates
before the distance computation.

All dot products use sequential ``F.aggregate`` over doubles so results
are bit-reproducible across engines (summation order fixed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from padua_spark.functions.scalar import _IH_M


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (deterministic summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    Plan: one projection computing the score + a global top-k
    (``orderBy().limit(k)`` → Spark's TakeOrderedAndProject, a per-
    partition heap + driver merge — no full sort, no shuffle). Ties are
    broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    v = _as_double(F.col(vec_col))
    scored = df.select(
        F.col(id_col),
        cosine(v, q).alias("cosine_sim"),
    )
    return scored.orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    ).limit(k)


def hyperplane_lsh_bucket(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 11
) -> Column:
    """Random-hyperplane LSH bucket id: sign pattern of ``n_planes``
    deterministic pseudo-random hyperplanes (Irwin–Hall-free: plane
    component (p, d) = centered uniform from exact integer hashing).
    Same-bucket vectors are cosine-close with high probability."""
    v = _as_double(vec)
    bits = []
    for p in range(n_planes):
        comps = []
        for d in range(dim):
            h = (((p * dim + d + 1) * 2654435761 + 1013904223) % _IH_M)
            comps.append(F.lit(h / _IH_M - 0.5))
        plane = F.array(*comps)
        bits.append(F.when(dot(v, plane) >= 0, F.lit(1)).otherwise(F.lit(0)))
    bucket = F.lit(0)
    for b in bits:
        bucket = bucket * F.lit(2) + b
    return bucket


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to the query's LSH
    bucket. At 100 TB, bucket the corpus once (write partitioned by
    bucket) and each query touches ~1/2^n_planes of the data."""
    dim = len(query)
    bucketed = df.withColumn(
        "_bucket", hyperplane_lsh_bucket(F.col(vec_col), dim, n_planes)
    )
    qdf_bucket = hyperplane_lsh_bucket(
        F.array(*[F.lit(float(x)) for x in query]), dim, n_planes
    )
    candidates = bucketed.filter(F.col("_bucket") == qdf_bucket)
    return brute_force_topk(candidates, vec_col, id_col, query, k)


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_cols: list[str],
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks.

    Norms are precomputed per row in a staged projection, so the
    per-pair work is a single dot product. For unblocked 100 TB corpora
    use :func:`hyperplane_lsh_bucket` as the blocking key — same shape,
    the bucket column replaces the natural blocks.
    """
    staged = df.select(
        *block_cols,
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_nrm", l2_norm(F.col("_v")))
    left = staged.select(
        *block_cols, F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"), F.col("_nrm").alias("_na")
    )
    right = staged.select(
        *block_cols, F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"), F.col("_nrm").alias("_nb")
    )
    cos = dot(F.col("_va"), F.col("_vb")) / (
        F.col("_na") * F.col("_nb")
    )
    return (
        left.join(right, on=block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(*block_cols, "id_a", "id_b", cos.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= F.lit(threshold))
    )
