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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner join of every LEFT interval to every RIGHT interval it
    OVERLAPS (half-open semantics: for NON-empty intervals
    [ls, le) ∩ [rs, re) ≠ ∅ ⇔ ls < re AND rs < le; EMPTY intervals
    (end <= start, e.g. an upstream end<=start glitch) overlap nothing
    and are filtered out before the join — the bare predicate alone
    would report a zero-length interval as overlapping anything
    containing its point) — the interval-interval sibling of
    ``point_in_interval_join``, which Spark likewise plans as a nested
    loop if written as a bare range predicate.

    Same bucketization, one extra step: BOTH sides explode to every
    bucket they touch, so an overlapping pair now meets in EVERY shared
    bucket and would duplicate. Each pair is therefore emitted only by
    its OWNER bucket — the bucket containing the overlap's start
    ``greatest(ls, rs)``, which every overlapping pair has exactly one
    of (the standard dedup of temporal-join literature, e.g. the
    DBToaster/Flink interval join): a cheap post-join equality instead
    of a DISTINCT over the output.

    Plan: two generator explosions (≤ len/bucket + 1 rows each), ONE
    bucket-keyed shuffle equi-join, exact predicates on the candidates.
    Pick ``bucket_seconds`` ≈ the typical interval length (≤2 buckets
    per interval); AQE handles hot buckets like any skewed key.
    Column names must be disjoint apart from the four coordinates."""

    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    # All bucket math in exact integer MICROSECONDS: second-truncating
    # unix_timestamp would let a sub-second overlap start round into a
    # bucket the truncated interval ends never touch, silently dropping
    # the pair at a bucket edge.
    bus = bucket_seconds * 1_000_000

    def exploded(df: DataFrame, s: str, e: str) -> DataFrame:
        b0 = F.floor(F.unix_micros(F.col(s)) / F.lit(bus))
        # half-open end: an interval ending exactly on a bucket edge
        # does not reach into that bucket
        b1 = F.floor((F.unix_micros(F.col(e)) - F.lit(1)) / F.lit(bus))
        return df.filter(F.col(s) < F.col(e)).withColumn(
            "_bucket", F.explode(F.sequence(b0, b1))
        )

    lb = exploded(left, left_start, left_end)
    rb = exploded(right, right_start, right_end)
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    owner = F.floor(F.unix_micros(F.greatest(ls, rs)) / F.lit(bus))
    return (
        lb.join(rb, "_bucket")
        .filter((ls < re_) & (rs < le) & (F.col("_bucket") == owner))
        .drop("_bucket")
    )
