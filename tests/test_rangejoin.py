"""Unit tests for the bucketized point-in-interval join."""

from __future__ import annotations

import datetime as dt

from supplier_performance_data_pipeline_spark.operators.rangejoin import (
    point_in_interval_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_inclusive_bounds_and_multi_bucket_intervals(spark):
    # Bucket = 60s; the interval spans 4 buckets, so matching relies on
    # the explode covering every overlapped bucket.
    intervals = spark.createDataFrame(
        [("w1", _ts("2024-01-01T10:00:30"), _ts("2024-01-01T10:03:30"))],
        "wid string, w_start timestamp, w_end timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:30")),  # == start (inclusive)
            (2, _ts("2024-01-01T10:02:00")),  # middle bucket
            (3, _ts("2024-01-01T10:03:30")),  # == end (inclusive)
            (4, _ts("2024-01-01T10:03:31")),  # just outside
            (5, _ts("2024-01-01T09:59:59")),  # just before
        ],
        "pid int, p_ts timestamp",
    )
    got = sorted(
        r["pid"]
        for r in point_in_interval_join(
            points, intervals, "p_ts", "w_start", "w_end", bucket_seconds=60
        ).collect()
    )
    assert got == [1, 2, 3]


def test_each_pair_appears_once(spark):
    # Overlapping intervals: a point inside both must pair with each
    # exactly once, even though interval buckets overlap.
    intervals = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00")),
            ("b", _ts("2024-01-01T00:30:00"), _ts("2024-01-01T01:30:00")),
        ],
        "wid string, w_start timestamp, w_end timestamp",
    )
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:45:00"))], "pid int, p_ts timestamp"
    )
    rows = point_in_interval_join(
        points, intervals, "p_ts", "w_start", "w_end", bucket_seconds=600
    ).collect()
    assert sorted(r["wid"] for r in rows) == ["a", "b"]
