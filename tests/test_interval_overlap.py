"""Unit tests for the bucketized interval-interval overlap join:
exactness vs a brute-force nested-loop reference on adversarial
synthetic intervals (bucket-edge endpoints, sub-second overlaps,
zero-length intervals, containment, identity)."""

from __future__ import annotations

import datetime as dt
import itertools

from supplier_performance_data_pipeline_spark.operators.rangejoin import (
    interval_overlap_join,
)

_EPOCH = dt.datetime(2024, 1, 1)


def _iv(sec0: float, sec1: float):
    return (
        _EPOCH + dt.timedelta(seconds=sec0),
        _EPOCH + dt.timedelta(seconds=sec1),
    )


def _brute(left, right):
    # ls < le / rs < re: EMPTY intervals overlap nothing (the bare
    # range predicate alone would match a zero-length interval to
    # anything containing its point)
    return sorted(
        (li, ri)
        for (li, (ls, le)), (ri, (rs, re)) in itertools.product(
            enumerate(left), enumerate(right)
        )
        if ls < le and rs < re and ls < re and rs < le
    )


def _run(spark, left, right, bucket_seconds):
    ldf = spark.createDataFrame(
        [(i, *_iv(a, b)) for i, (a, b) in enumerate(left)],
        "lid int, ls timestamp, le timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, *_iv(a, b)) for i, (a, b) in enumerate(right)],
        "rid int, rs timestamp, re timestamp",
    )
    out = interval_overlap_join(ldf, rdf, "ls", "le", "rs", "re", bucket_seconds)
    return sorted((r["lid"], r["rid"]) for r in out.collect())


def test_overlap_matches_brute_force_adversarial(spark):
    # endpoints ON bucket edges (bucket=10s), sub-second overlaps,
    # containment, identity, and touching-only (half-open: no match)
    left = [(0, 10), (10, 20), (5, 25), (9.9, 10.1), (30, 30.0001), (40, 50)]
    right = [(10, 20), (0, 10), (19.999, 20.001), (5, 6), (29, 31), (50, 60)]
    assert _run(spark, left, right, 10) == _brute(
        [_m(p) for p in left], [_m(p) for p in right]
    )


def _m(p):
    return (p[0], p[1])


def test_overlap_no_duplicates_when_pair_shares_many_buckets(spark):
    # long intervals share 10 buckets; the owner-bucket rule must emit
    # the pair exactly once
    left = [(0, 100)]
    right = [(0, 100), (50, 200)]
    got = _run(spark, left, right, 10)
    assert got == [(0, 0), (0, 1)]


def test_touching_intervals_do_not_match_half_open(spark):
    assert _run(spark, [(0, 10)], [(10, 20)], 5) == []
    assert _run(spark, [(10, 20)], [(0, 10)], 5) == []


def test_empty_intervals_never_match(spark):
    # a zero-length interval has an empty [s, s) extent
    left = [(10, 10), (0, 20)]
    right = [(5, 15), (12, 12)]
    assert _run(spark, left, right, 10) == [(1, 0)]
