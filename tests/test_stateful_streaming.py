"""Custom stateful streaming operator (applyInPandasWithState):
final per-user profiles must equal the batch groupBy over the same
bounded input."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.streaming.events import (
    normalize_event_ts,
    read_event_stream,
    run_to_memory_sink,
)
from supplier_performance_data_pipeline_spark.streaming.stateful import (
    streaming_user_profiles,
)
from tests.conftest import SF_SMOKE


def test_stateful_profiles_equal_batch(spark):
    stream = read_event_stream(spark, SF_SMOKE)
    run_to_memory_sink(
        streaming_user_profiles(stream), "profiles_out", output_mode="update"
    )
    got = spark.sql(
        # update mode emits one row per user per micro-batch; the last
        # emission per user is the final state.
        """
        SELECT user_id, n_events, total_value, last_seen FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC) AS rn
            FROM profiles_out
        ) WHERE rn = 1
        """
    ).toPandas()

    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .transform(normalize_event_ts)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_seen"),
        )
        .toPandas()
    )
    got = got.sort_values("user_id").reset_index(drop=True)
    batch = batch.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "n_events", "last_seen"]],
        batch[["user_id", "n_events", "last_seen"]],
        check_dtype=False,
    )
    assert (abs(got["total_value"] - batch["total_value"]) < 1e-6).all()


def test_salted_distinct_count_equals_plain(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    from supplier_performance_data_pipeline_spark.operators.skew import (
        salted_distinct_count,
    )

    got = {
        r["event_type"]: r["n_distinct_user_id"]
        for r in salted_distinct_count(ev, "event_type", "user_id").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want
