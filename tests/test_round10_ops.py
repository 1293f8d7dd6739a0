"""Round-10 operator tests: the `reliable` materialization knob on
quantile_blocks (r9 VERDICT #3)."""

from pyspark.sql import functions as F


def _ranked(df, reliable):
    from supplier_performance_data_pipeline_spark.operators.ranking import (
        blocked_row_number,
        quantile_blocks,
    )

    return blocked_row_number(
        quantile_blocks(df, "v", desc=True, num_blocks=16, reliable=reliable),
        [F.desc("v"), F.asc("id")],
    )


def test_quantile_blocks_reliable_knob_result_invariant(spark):
    """r9 VERDICT #3: localCheckpoint truncates lineage onto
    executor-local blocks (fast, but an executor lost after truncation
    is unrecoverable-by-lineage on a real cluster); reliable=True
    persists DISK_ONLY with lineage kept. The knob trades fault
    tolerance for speed ONLY — the cuts job and CASE tree are
    identical, so the global rank must be byte-identical across modes
    and match the exact sort."""
    rows = [(i, float((i * 53) % 89)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {}
    for reliable in (False, True):
        ranked = _ranked(df, reliable)
        got[reliable] = sorted(
            (r["id"], r["rn"]) for r in ranked.select("id", "rn").collect()
        )
    assert got[False] == got[True]
    expect = sorted(
        (i, rank + 1)
        for rank, (i, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    )
    assert got[True] == expect


def test_quantile_blocks_reliable_keeps_lineage(spark):
    """reliable=True must NOT truncate lineage: the persisted frame's
    logical plan still reaches the source (recompute-on-executor-loss
    is the entire point), while reliable=False's localCheckpoint plan
    is a LogicalRDD scan with the upstream gone."""
    from supplier_performance_data_pipeline_spark.operators.ranking import (
        quantile_blocks,
    )

    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 41).cast("double").alias("v")
    )
    durable = quantile_blocks(df, "v", reliable=True)
    fast = quantile_blocks(df, "v", reliable=False)
    durable_plan = durable._jdf.queryExecution().analyzed().toString()
    fast_plan = fast._jdf.queryExecution().analyzed().toString()
    assert "Range" in durable_plan, "persist must keep the source in-plan"
    assert "Range" not in fast_plan and "LogicalRDD" in fast_plan, (
        "localCheckpoint should have truncated lineage to a LogicalRDD"
    )
