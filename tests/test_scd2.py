"""SCD-2 history semantics (operators/merge.py::scd2_apply).

The registered query covers one batch against a snapshot; these pin the
operator contract directly: chained batches extend version chains,
untouched keys stay single-row current, and the closing date of every
superseded row equals the successor's valid_from.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.merge import (
    scd2_apply,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k int, attr string, valid_from date"
    )


def d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def test_single_batch_closes_superseded_rows(spark):
    base = _df(spark, [(1, "a", d("2024-01-01")), (2, "b", d("2024-01-01"))])
    upd = _df(spark, [(1, "a2", d("2024-06-01"))])
    hist = scd2_apply(base, upd, ["k"]).orderBy("k", "valid_from").collect()
    assert [(r.k, r.attr, r.valid_to, r.is_current) for r in hist] == [
        (1, "a", d("2024-06-01"), False),
        (1, "a2", None, True),
        (2, "b", None, True),
    ]


def test_chained_batches_extend_the_version_chain(spark):
    base = _df(spark, [(1, "a", d("2024-01-01"))])
    b1 = _df(spark, [(1, "a2", d("2024-03-01"))])
    b2 = _df(spark, [(1, "a3", d("2024-09-01"))])
    # Re-applying onto prior output: drop the derived cols first (the
    # operator recomputes them over the full chain).
    h1 = scd2_apply(base, b1, ["k"]).drop("valid_to", "is_current")
    h2 = scd2_apply(h1, b2, ["k"]).orderBy("valid_from").collect()
    assert [(r.attr, r.valid_to, r.is_current) for r in h2] == [
        ("a", d("2024-03-01"), False),
        ("a2", d("2024-09-01"), False),
        ("a3", None, True),
    ]


def test_exactly_one_current_row_per_key(spark):
    base = _df(
        spark,
        [(k, f"v{k}", d("2024-01-01")) for k in range(50)],
    )
    upd = _df(
        spark,
        [(k, f"w{k}", d("2024-06-01")) for k in range(0, 50, 5)],
    )
    hist = scd2_apply(base, upd, ["k"])
    per_key = (
        hist.groupBy("k")
        .agg(
            F.sum(F.col("is_current").cast("int")).alias("n_current"),
            F.count("*").alias("n_versions"),
        )
        .collect()
    )
    for r in per_key:
        assert r.n_current == 1
        assert r.n_versions == (2 if r.k % 5 == 0 else 1)


def test_snapshot_diff_classifies_all_four_ways(spark):
    from supplier_performance_data_pipeline_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "k long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 21.0), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_vs_empty_string_differ(spark):
    # The NULL sentinel must keep NULL distinct from '' — a naive
    # concat would collapse them into the same digest.
    from supplier_performance_data_pipeline_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, None)], "k long, name string")
    new = spark.createDataFrame([(1, "")], "k long, name string")
    rows = snapshot_diff(old, new, ["k"]).collect()
    assert rows[0]["change_type"] == "changed"


def test_snapshot_diff_schema_mismatch_raises(spark):
    import pytest

    from supplier_performance_data_pipeline_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, "a")], "k long, name string")
    new = spark.createDataFrame([(1, 2.0)], "k long, other double")
    with pytest.raises(ValueError, match="schemas differ"):
        snapshot_diff(old, new, ["k"])


def test_snapshot_diff_separator_injection_detected(spark):
    # The JSON serialization must keep field boundaries unambiguous: a
    # value containing any would-be separator can't shift fields into
    # a colliding digest.
    from supplier_performance_data_pipeline_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a\x1f", "b")], "k long, c1 string, c2 string"
    )
    new = spark.createDataFrame(
        [(1, "a", "\x1fb")], "k long, c1 string, c2 string"
    )
    assert snapshot_diff(old, new, ["k"]).collect()[0]["change_type"] == (
        "changed"
    )


def test_snapshot_diff_type_migration_raises(spark):
    import pytest

    from supplier_performance_data_pipeline_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, 10)], "k long, v int")
    new = spark.createDataFrame([(1, 10.0)], "k long, v double")
    with pytest.raises(ValueError, match="TYPES"):
        snapshot_diff(old, new, ["k"])


def test_snapshot_diff_sub_millisecond_timestamp_change_detected(spark):
    # to_json's default timestampFormat renders milliseconds only —
    # the digest must carry full microseconds or sub-ms changes
    # collide into 'unchanged'.
    import datetime as dt

    from supplier_performance_data_pipeline_spark.operators.merge import (
        snapshot_diff,
    )

    t1 = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)
    t2 = dt.datetime(2024, 1, 1, 0, 0, 0, 123457)
    old = spark.createDataFrame([(1, t1)], "k long, ts timestamp")
    new = spark.createDataFrame([(1, t2)], "k long, ts timestamp")
    assert snapshot_diff(old, new, ["k"]).collect()[0]["change_type"] == (
        "changed"
    )


def test_snapshot_diff_ntz_sub_millisecond_change_detected(spark):
    # TIMESTAMP_NTZ formats via the SEPARATE timestampNTZFormat option
    # — it must carry microseconds too.
    import datetime as dt

    from supplier_performance_data_pipeline_spark.operators.merge import (
        snapshot_diff,
    )

    t1 = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)
    t2 = dt.datetime(2024, 1, 1, 0, 0, 0, 123457)
    old = spark.createDataFrame([(1, t1)], "k long, ts timestamp_ntz")
    new = spark.createDataFrame([(1, t2)], "k long, ts timestamp_ntz")
    assert snapshot_diff(old, new, ["k"]).collect()[0]["change_type"] == (
        "changed"
    )


def test_snapshot_diff_null_keys_match_null_safe(spark):
    """A key that is NULL in both snapshots must classify ONCE (here:
    changed), not double-report as 'added' + 'removed' — the full-outer
    join uses null-safe key equality."""
    from supplier_performance_data_pipeline_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(None, "x", 1.0), (1, "a", 10.0)], "k long, name string, v double"
    )
    new = spark.createDataFrame(
        [(None, "x", 2.0), (1, "a", 10.0)], "k long, name string, v double"
    )
    rows = snapshot_diff(old, new, ["k"]).collect()
    assert len(rows) == 2
    got = {r["k"]: r["change_type"] for r in rows}
    assert got == {None: "changed", 1: "unchanged"}
