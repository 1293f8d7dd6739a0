"""Distributed k-means over embedding columns (Lloyd's algorithm).

Training-data pipelines cluster embeddings for curation (SemDedup-style
pruning, stratified sampling, IVF coarse quantizers). This is Lloyd's
algorithm expressed as pure DataFrame ops — no UDF, no driver-side
data, one lazy plan for a fixed iteration count:

  explode vectors to (vec_id, dim, v) →
  per iteration: distance agg (vec × cluster) → argmin assignment
  (window) → centroid update (cluster × dim agg) →
  final: assignment under the last centroids + per-cluster profile.

Determinism contract (the DuckDB oracle reproduces every iteration
bit-for-bit): all cross-row sums run in DECIMAL (exact, order-free) —
per-element arithmetic stays double (deterministic per element).
Initial centroids are the first K vectors (vec_id < K).

Scale: the exploded fact shuffles on (vec_id, cluster) / (cluster, dim)
per iteration; the centroid side is K×dim rows — always broadcast. For
many iterations at 100 TB you'd checkpoint the assignment between
iterations to cut lineage; the fixed-iteration plan here keeps the
whole thing lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_DEFAULT = 4
ITERS_DEFAULT = 2
# (v-c)^2 summed over 64 dims of unit-scale floats: DECIMAL(24,12) holds
# it exactly; vector components themselves round to DECIMAL(20,10).
DIST_DEC = "decimal(24,12)"
COMP_DEC = "decimal(20,10)"


def explode_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, dim, v): long-format double components."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "dim", "v"
        ),
    )


def _assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, cluster, d).

    Distance in DECIMAL so the sum is reduction-order-free; ties break
    to the lowest cluster id via the window sort.
    """
    sq = (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
    dist = (
        e.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cluster")
        .agg(F.sum(sq.cast(DIST_DEC)).alias("d"))
    )
    # Argmin as min(struct(d, cluster)): lexicographic struct ordering
    # gives the tie-break for free, and a hash agg (partial+final, no
    # sort) beats a row_number window for a per-key top-1.
    return dist.groupBy("vec_id").agg(
        F.min(F.struct("d", "cluster")).alias("m")
    ).select("vec_id", F.col("m.cluster").alias("cluster"), F.col("m.d").alias("d"))


def _update(e: DataFrame, assign: DataFrame) -> DataFrame:
    """Centroid update: exact DECIMAL mean per (cluster, dim)."""
    return (
        e.join(assign.select("vec_id", "cluster"), "vec_id")
        .groupBy("cluster", "dim")
        .agg(
            (
                F.sum(F.col("v").cast(COMP_DEC)).cast("double")
                / F.count("*")
            ).alias("c")
        )
    )


def kmeans_assignments(
    emb: DataFrame,
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final (vec_id, cluster, d) after ``iters`` Lloyd iterations."""
    # The exploded fact feeds every iteration (6+ plan references for
    # iters=2): persist it so each stage reads the in-memory columnar
    # form instead of re-scanning + re-exploding the parquet.
    e = explode_vectors(emb, id_col, vec_col).persist()
    cent = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), "dim", F.col("v").alias("c")
    )
    assign = _assign(e, cent)
    for _ in range(iters):
        cent = _update(e, assign)
        assign = _assign(e, cent)
    return assign


def kmeans_cluster_profile(
    emb: DataFrame,
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n_vectors, inertia): cluster sizes and exact-decimal
    within-cluster sum of squared distances, rounded for display."""
    assign = kmeans_assignments(emb, k, iters, id_col, vec_col)
    return assign.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.sum(F.col("d")).cast("double"), 6).alias("inertia"),
    )
