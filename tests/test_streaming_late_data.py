"""Watermark semantics under late / out-of-order arrival.

The round-1 streaming tests replay in-order data, where watermarking is
invisible. These tests build explicit multi-batch arrival sequences
(``maxFilesPerTrigger=1``, distinct file mtimes → one file per
microbatch, oldest first) and pin the two sides of the guarantee:

- a late event whose window was already FINALIZED (state evicted after
  the watermark passed the window end) is dropped — the streaming
  result keeps the finalized count, while the batch twin over the same
  rows without a watermark counts the late row;
- an out-of-order event still AHEAD of the watermark is absorbed.

Empirical note on timing (verified against the state-operator metrics):
eviction runs at the end of the first batch whose operative watermark
passed the window end, so the late arrival must come one batch AFTER
the batch that triggered eviction — hence the three-file sequences. A
late row landing in the same batch as the eviction still merges into
the live state (numRowsDroppedByWatermark stays 0); that's Spark's
documented "watermark is a lower bound, not a guarantee of dropping"
behavior.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from supplier_performance_data_pipeline_spark.streaming.events import (
    normalize_event_ts,
    read_event_stream,
    run_to_memory_sink,
    streaming_hourly_rollup,
    streaming_sessionize,
)

BASE_NS = 1_700_000_000 * 1_000_000_000


def _ns(minutes: float) -> int:
    return BASE_NS + int(minutes * 60) * 1_000_000_000


def _write_batch(directory: str, name: str, rows: list[tuple]):
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    path = os.path.join(directory, name)
    pq.write_table(table, path)
    return path


def _arrival_sequence(tmp_path, batches: list[list[tuple]]) -> str:
    d = str(tmp_path)
    t = time.time() - 3600
    for i, rows in enumerate(batches):
        p = _write_batch(d, f"batch{i}.parquet", rows)
        os.utime(p, (t + i * 10, t + i * 10))
    return d


def _stream(spark, d):
    return read_event_stream(spark, d, glob="*.parquet", max_files_per_trigger=1)


# Offsets are minutes from BASE. Watermark delay is 2 hours throughout.
# b0: two hour-0 events + a +05:00 pusher (watermark → +03:00).
# b1: benign +06:00 event; during this batch the +03:00 watermark
#     finalizes and evicts the hour-0 window (count 2).
# b2: replay of a 00:30 event — its window is gone; the row is dropped.
HOURLY_SEQ = [
    [
        (1, _ns(15), 1, "view", 1.0),
        (2, _ns(45), 1, "view", 1.0),
        (3, _ns(300), 2, "view", 1.0),
    ],
    [(4, _ns(360), 2, "view", 1.0)],
    [(5, _ns(30), 1, "view", 1.0)],
]


def test_hourly_rollup_drops_late_event(spark, tmp_path):
    d = _arrival_sequence(tmp_path, HOURLY_SEQ)
    run_to_memory_sink(
        streaming_hourly_rollup(_stream(spark, d)),
        "late_hourly",
        output_mode="append",
    )
    got = spark.sql("SELECT * FROM late_hourly").toPandas()
    # Exactly one finalized window (hour 0); the late replay (event 5)
    # is NOT in its count.
    assert len(got) == 1
    assert got.loc[0, "n_events"] == 2

    # Batch twin, no watermark: all three hour-0 rows count — the
    # streaming drop above is watermark semantics, not the fixture.
    from pyspark.sql import functions as F

    from supplier_performance_data_pipeline_spark.operators.windows import (
        hourly_rollup,
    )

    batch = normalize_event_ts(spark.read.parquet(d))
    want = hourly_rollup(batch).toPandas().sort_values("hour")
    assert int(want.iloc[0]["n_events"]) == 3


# b0: u1 session of two events (ends 00:10, session window end 00:40
#     with the 30-minute gap) + +05:00 pusher.
# b1: +06:00 benign event — finalizes u1's session.
# b2: late 00:20 event that would have extended the session — dropped.
SESSION_SEQ = [
    [
        (1, _ns(0), 1, "view", 1.0),
        (2, _ns(10), 1, "view", 1.0),
        (3, _ns(300), 2, "view", 1.0),
    ],
    [(4, _ns(360), 2, "view", 1.0)],
    [(5, _ns(20), 1, "view", 1.0)],
]


def test_sessionize_drops_late_extension(spark, tmp_path):
    d = _arrival_sequence(tmp_path, SESSION_SEQ)
    run_to_memory_sink(
        streaming_sessionize(_stream(spark, d)),
        "late_sessions",
        output_mode="append",
    )
    got = spark.sql("SELECT * FROM late_sessions WHERE user_id = 1").toPandas()
    # u1's session finalized from b0 alone: 2 events ending at minute
    # 10. The late minute-20 extension never reached the state store —
    # had it been absorbed, n_events would be 3 and session_end :20.
    assert len(got) == 1
    assert got.loc[0, "n_events"] == 2
    expected_end = pd.Timestamp(1970, 1, 1) + pd.Timedelta(
        microseconds=_ns(10) // 1000
    )
    assert pd.Timestamp(got.loc[0, "session_end"]) == expected_end


def test_out_of_order_within_watermark_is_accepted(spark, tmp_path):
    """The converse guarantee: batch 2's 02:35 event arrives after
    batch 1's 03:30 (out of order) but ahead of the 01:30 watermark, so
    it must be absorbed into the [02:00, 03:00) window."""
    seq = [
        [(1, _ns(150), 1, "view", 1.0), (2, _ns(210), 1, "view", 1.0)],
        [(3, _ns(155), 1, "view", 1.0), (4, _ns(420), 1, "view", 1.0)],
    ]
    d = _arrival_sequence(tmp_path, seq)
    run_to_memory_sink(
        streaming_hourly_rollup(_stream(spark, d)),
        "ooo_hourly",
        output_mode="append",
    )
    got = spark.sql("SELECT * FROM ooo_hourly ORDER BY hour").toPandas()
    # Finalized windows: hour-2 (02:30 + the out-of-order 02:35) and
    # hour-3 (03:30). The 07:00 pusher's own window stays open.
    assert list(got["n_events"]) == [2, 1]


def test_sessionize_merges_bridged_sessions(spark, tmp_path):
    """The hardest session-state path: two DISJOINT open sessions for
    the same user (minutes 0 and 44, gap > 30) must MERGE into one
    when a late-but-within-watermark bridging event (minute 22) closes
    both gaps. A session store that only extends edges (never merges
    neighbors) emits two sessions here; the merged truth is ONE
    session of 3 events spanning 0..44."""
    seq = [
        # b0: the two fragments + nothing near them.
        [(1, _ns(0), 1, "view", 1.0), (2, _ns(44), 1, "view", 1.0)],
        # b1: the bridge (watermark still far behind), plus a pusher
        # at +300 that advances the watermark to +180 — past the
        # merged session's end (+74), forcing finalize+emit.
        [(3, _ns(22), 1, "view", 1.0), (4, _ns(300), 2, "view", 1.0)],
    ]
    d = _arrival_sequence(tmp_path, seq)
    run_to_memory_sink(
        streaming_sessionize(_stream(spark, d)),
        "merged_sessions",
        output_mode="append",
    )
    got = spark.sql(
        "SELECT * FROM merged_sessions WHERE user_id = 1"
    ).toPandas()
    assert len(got) == 1  # ONE merged session, not two fragments
    assert got.loc[0, "n_events"] == 3
    start = pd.Timestamp(1970, 1, 1) + pd.Timedelta(microseconds=_ns(0) // 1000)
    end = pd.Timestamp(1970, 1, 1) + pd.Timedelta(microseconds=_ns(44) // 1000)
    assert pd.Timestamp(got.loc[0, "session_start"]) == start
    assert pd.Timestamp(got.loc[0, "session_end"]) == end
