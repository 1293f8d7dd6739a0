"""Unit tests for the as-of (backward inclusive) join operator."""

from __future__ import annotations

import datetime as dt

from supplier_performance_data_pipeline_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),  # exact-ts match (inclusive)
            (1, _ts("2024-01-01T12:30:00"), "p2"),  # latest prior = 12:00
            (2, _ts("2024-01-01T09:00:00"), "p3"),  # no prior right row
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 10.0),
            (1, _ts("2024-01-01T12:00:00"), 12.0),
            (1, _ts("2024-01-01T13:00:00"), 13.0),  # after p2 — ignored
            (2, _ts("2024-01-01T09:30:00"), 9.5),  # after p3 — ignored
        ],
        "user_id int, ts timestamp, value double",
    )
    out = {
        r["tag"]: r
        for r in asof_join(
            left, right, on="user_id", ts_col="ts", value_cols=["value"],
            prefix="prior_",
        ).collect()
    }
    assert out["p1"]["prior_value"] == 10.0  # equal ts matches
    assert out["p2"]["prior_value"] == 12.0  # latest prior, not later
    assert out["p3"]["prior_value"] is None  # nothing precedes
    assert out["p3"]["prior_ts"] is None


def test_asof_keeps_all_left_rows(spark):
    left = spark.range(5).selectExpr(
        "id as user_id", "timestamp('2024-06-01 00:00:00') as ts"
    )
    right = spark.createDataFrame(
        [(0, _ts("2024-05-31T00:00:00"), 1.0)],
        "user_id bigint, ts timestamp, value double",
    )
    out = asof_join(left, right, on="user_id", ts_col="ts", value_cols=["value"])
    assert out.count() == 5
    matched = out.filter("r_value is not null").collect()
    assert len(matched) == 1 and matched[0]["user_id"] == 0


def test_asof_forward_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),  # exact-ts match (inclusive)
            (1, _ts("2024-01-01T12:30:00"), "p2"),  # nearest upcoming = 13:00
            (2, _ts("2024-01-01T09:45:00"), "p3"),  # nothing follows
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 9.0),  # before p1 — ignored
            (1, _ts("2024-01-01T10:00:00"), 10.0),
            (1, _ts("2024-01-01T13:00:00"), 13.0),
            (2, _ts("2024-01-01T09:30:00"), 9.5),  # before p3 — ignored
        ],
        "user_id int, ts timestamp, value double",
    )
    out = {
        r["tag"]: r
        for r in asof_join(
            left, right, on="user_id", ts_col="ts", value_cols=["value"],
            prefix="next_", direction="forward",
        ).collect()
    }
    assert out["p1"]["next_value"] == 10.0  # equal ts matches (inclusive)
    assert out["p2"]["next_value"] == 13.0  # nearest following, not prior
    assert out["p3"]["next_value"] is None  # nothing follows
    assert out["p3"]["next_ts"] is None


def test_asof_unknown_direction_raises(spark):
    import pytest

    left = spark.createDataFrame([], "user_id int, ts timestamp")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, on="user_id", ts_col="ts", value_cols=[],
                  direction="nearest")


def test_asof_null_timestamp_left_rows_never_match(spark):
    """A NULL left timestamp has no order position: both directions
    must return NULL, not (forward) the partition's earliest right row
    fabricated by NULLS FIRST ordering."""
    left = spark.createDataFrame(
        [(1, None, "pnull"), (1, _ts("2024-01-01T10:00:00"), "preal")],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 9.0),
         (1, _ts("2024-01-01T11:00:00"), 11.0)],
        "user_id int, ts timestamp, value double",
    )
    for direction, expect_real in (("backward", 9.0), ("forward", 11.0)):
        out = {
            r["tag"]: r
            for r in asof_join(
                left, right, on="user_id", ts_col="ts",
                value_cols=["value"], prefix="m_", direction=direction,
            ).collect()
        }
        assert out["pnull"]["m_value"] is None, direction
        assert out["preal"]["m_value"] == expect_real, direction


def test_asof_null_timestamp_right_rows_ignored_both_directions(spark):
    """A right row with NULL ts has no time position and must be
    ignored in BOTH directions. Before the guard, backward's NULLS
    FIRST ordering put it at the frame head, so a left row with no
    real predecessor got a fabricated match (NULL r_ts, non-null
    value) while forward never matched it — asymmetric semantics."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p")],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, 99.0)], "user_id int, ts timestamp, value double"
    )
    for direction in ("backward", "forward"):
        out = asof_join(
            left, right, on="user_id", ts_col="ts", value_cols=["value"],
            direction=direction, prefix="m_",
        ).collect()
        assert len(out) == 1
        assert out[0]["m_value"] is None, direction
        assert out[0]["m_ts"] is None, direction
