"""Similarity search over embedding columns (``array<float>``).

Extension surface (BASELINE.json north star):
- brute-force cosine top-k — the exact baseline; a single pass, no
  shuffle until the final TakeOrderedAndProject;
- random-hyperplane LSH bucketing — the scale path: candidates meet
  only inside their bucket, so the scan shrinks by ~2^planes. The
  hyperplanes are deterministic (md5-derived integers), so the oracle
  reproduces buckets bit-for-bit.

All arithmetic is element-wise double with left-to-right array
reduction — identical IEEE results in any engine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 8


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right ordered dot product (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def hyperplane(plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random hyperplane: md5-derived ints in
    [-500, 499]. Computed driver-side (hashlib md5 == SQL md5) and
    inlined as literals in both engines."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}|{d}".encode()).hexdigest()[:8]
        out.append(int(h, 16) % 1000 - 500)
    return out


def lsh_bucket(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket id from ``n_planes`` hyperplane projections."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in hyperplane(p, dim)])
        bit = F.when(dot(vec, plane) > 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        id_col,
        F.round(cosine(_as_double(F.col(vec_col)), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    At 100 TB the bucket column is precomputed at ingest and the table
    is partitioned/bucketed by it, turning ANN into a pruned scan.
    """
    vec_d = _as_double(F.col(vec_col))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    with_bucket = embeddings.withColumn("bucket", lsh_bucket(vec_d, dim))
    # The query's bucket is a plain scalar computed the same way.
    qdf_bucket = lsh_bucket(q, dim)
    candidates = with_bucket.filter(F.col("bucket") == qdf_bucket)
    scored = candidates.select(
        id_col,
        "bucket",
        F.round(cosine(vec_d, q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates via shared
    random-hyperplane LSH bucket (equi-join, never all-pairs), verified
    with the exact cosine and filtered at ``threshold``.

    The norm is materialized once per row before the self-join so pair
    scoring is one dot product. At 100 TB the bucket stage is the
    shuffle key — same-bucket rows co-locate, and candidate volume per
    bucket is data-bounded by the plane count."""
    v = _as_double(F.col(vec_col))
    base = embeddings.select(F.col(id_col).alias("vid"), v.alias("v")).select(
        "vid",
        "v",
        lsh_bucket(F.col("v"), dim).alias("bucket"),
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm"),
    )
    a = base.select(
        F.col("vid").alias("vec_a"),
        F.col("v").alias("va"),
        "bucket",
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("vid").alias("vec_b"),
        F.col("v").alias("vb"),
        "bucket",
        F.col("nrm").alias("nb"),
    )
    cos = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label element-wise mean, long format (label, dim, centroid).

    posexplode + two-key hash agg: fully parallel, no collect, no UDF;
    at scale this is one shuffle keyed by (label, dim).
    """
    exploded = embeddings.select(
        label_col, F.posexplode(_as_double(F.col(vec_col))).alias("dim", "v")
    )
    return exploded.groupBy(label_col, "dim").agg(
        F.round(F.avg("v"), 6).alias("centroid"),
        F.count("*").alias("n_vectors"),
    )
