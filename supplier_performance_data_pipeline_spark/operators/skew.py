"""Skew-aware aggregation: salted two-phase distinct count.

A plain ``COUNT(DISTINCT col) GROUP BY key`` concentrates every distinct
value of a hot key in one task. Salting by ``hash(col) % n`` splits each
key's value space into n DISJOINT buckets, so per-(key, salt) distinct
counts are exact partial results and their per-key SUM is the exact
answer — the hot key's work now spreads over n tasks.

This decomposition is exact only because the salt is a function of the
counted column (same value → same bucket, never double-counted). The
same trick powers skew-safe distinct aggregation at 100 TB; for plain
SUM/COUNT Spark's map-side partial aggregation already handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame, key: str, col: str, n_salts: int = 16
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col), skew-spread over n_salts tasks."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(col)), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.countDistinct(col).alias("_partial")
    )
    return partial.groupBy(key).agg(
        F.sum("_partial").alias(f"n_distinct_{col}")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe inner equi-join: salt the fact's key with a random
    bucket and replicate the (small) dim once per bucket, so one hot
    key's rows spread across ``n_salts`` tasks instead of one straggler.

    AQE's skew-join split handles most cases at runtime; explicit
    salting is the deterministic fallback when a key is so hot that
    even split sub-partitions overflow, or when AQE is unavailable
    (e.g. inside a cached subplan). The replicated side must be small —
    its shuffle volume multiplies by ``n_salts``.
    """
    salts = F.expr(
        f"explode(sequence(0, {n_salts - 1}))"
    )
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    dim_s = dim.withColumn("_salt", salts)
    return fact_s.join(dim_s, [key, "_salt"]).drop("_salt")
