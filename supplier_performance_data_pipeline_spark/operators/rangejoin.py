"""Point-in-interval range join via time bucketization.

Spark plans a bare ``point BETWEEN start AND end`` join as a broadcast
nested loop — O(|L|·|R|) and a non-starter at scale. Bucketizing turns
it into an equi-join: intervals explode to every fixed-width bucket
they overlap, points map to their single bucket, the join key is the
bucket, and the exact range predicate filters the per-bucket
candidates. Each (point, interval) match meets in exactly one bucket
(the point's), so no dedup is needed.

Pick ``bucket_seconds`` ≈ the typical interval length: each interval
then explodes to ≤2 buckets and candidate volume per bucket is bounded
by data density, not table size. This is the standard interval-join
strategy of streaming/temporal engines, expressed in three DataFrame
ops — shuffle on bucket, AQE handles hot buckets like any skewed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (inclusive bounds). Column names must be disjoint apart from the
    three coordinates."""
    pb = points.withColumn(
        "_bucket",
        F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds),
    )
    ib = (
        intervals.withColumn(
            "_b0", F.floor(F.unix_timestamp(F.col(start_ts)) / bucket_seconds)
        )
        .withColumn(
            "_b1", F.floor(F.unix_timestamp(F.col(end_ts)) / bucket_seconds)
        )
        .withColumn("_bucket", F.explode(F.sequence("_b0", "_b1")))
        .drop("_b0", "_b1")
    )
    return (
        ib.join(pb, "_bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_bucket")
    )
