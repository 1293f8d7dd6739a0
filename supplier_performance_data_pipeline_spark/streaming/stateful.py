"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed aggregations (streaming/events.py) cover
tumbling/session shapes; this is the escape hatch for state machines
they can't express — here a per-user running activity profile (event
count, value sum, last-seen timestamp) that emits an updated row per
user per micro-batch and expires idle users' state on processing-time
timeout.

Scale notes: state is keyed by user_id — partitioned across executors
like any keyed state; the timeout bounds state size to active users.
Arrow batches carry the grouped rows, so the Python hop is vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)


def _make_update_profile(expire_ms: int | None):
    def _update_profile(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((n, total, last))
        if expire_ms is not None:
            state.setTimeoutDuration(expire_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_seen": [last],
            }
        )

    return _update_profile


def streaming_user_profiles(
    events: DataFrame, expire_ms: int | None = None
) -> DataFrame:
    """Per-user running profile — custom keyed state.

    ``expire_ms`` turns on processing-time state expiry for idle users —
    the production setting for unbounded key spaces. Leave it ``None``
    for bounded/batch-style runs: with a timeout configured, Spark keeps
    scheduling timeout-handling micro-batches after the source drains,
    so drive-to-completion harnesses (processAllAvailable) never settle.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expire_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(expire_ms),
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
