"""foreachBatch upsert sink: CDC-style snapshot maintenance from a
stream (streaming/events.py::streaming_upsert_sink + operators/merge).

Replays two update batches (distinct file mtimes, one file per
microbatch) into a parquet snapshot and asserts last-writer-wins:
batch 2's update overrides batch 1's row, inserts from both batches
land, untouched rows carry over.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from supplier_performance_data_pipeline_spark.streaming.events import (
    streaming_upsert_sink,
)


def _write_updates(directory: str, name: str, rows: list[tuple]) -> str:
    table = pa.table(
        {
            "s_suppkey": pa.array([r[0] for r in rows], pa.int64()),
            "s_name": pa.array([r[1] for r in rows], pa.string()),
            "s_acctbal": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    path = os.path.join(directory, name)
    pq.write_table(table, path)
    return path


def test_streaming_upsert_last_writer_wins(spark, tmp_path):
    src = tmp_path / "updates"
    src.mkdir()
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    # Batch 1: initial snapshot (keys 1, 2, 3).
    p1 = _write_updates(
        str(src), "b1.parquet", [(1, "alpha", 10.0), (2, "beta", 20.0), (3, "gamma", 30.0)]
    )
    os.utime(p1, (time.time() - 20, time.time() - 20))
    # Batch 2: update key 2, insert key 4.
    p2 = _write_updates(
        str(src), "b2.parquet", [(2, "beta-v2", 99.0), (4, "delta", 40.0)]
    )
    os.utime(p2, (time.time() - 10, time.time() - 10))

    schema = "s_suppkey long, s_name string, s_acctbal double"
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    q = streaming_upsert_sink(stream, snap, ["s_suppkey"], ckpt)
    q.awaitTermination(120)

    got = {
        r["s_suppkey"]: (r["s_name"], r["s_acctbal"])
        for r in spark.read.parquet(snap).collect()
    }
    assert got == {
        1: ("alpha", 10.0),
        2: ("beta-v2", 99.0),
        3: ("gamma", 30.0),
        4: ("delta", 40.0),
    }
