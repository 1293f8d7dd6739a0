"""Event-time analytics over the ``events`` table (batch path).

The reference is pure batch with no streaming operators (SURVEY.md §2.8);
these are the engine's extension operators for event data, built so the
same logical shapes run under Structured Streaming (streaming/events.py).

Scale notes: the tumbling rollup is a single hash aggregation keyed by
(bucket, type) — fully parallel. Sessionization partitions by user_id,
so state is bounded per user and skew-safe under AQE; there is no
global window anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STEP_RX = re.compile(
    r"^\s*(\d+)\s+(second|minute|hour|day|week)s?\s*$", re.IGNORECASE
)
_STEP_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def step_seconds(step: str) -> int:
    """Parse a fixed-length interval like ``'15 minutes'`` to seconds.

    Restricted to units of constant length (≤ weeks): months/years vary
    per calendar and cannot drive epoch-aligned bucketing — reject them
    loudly instead of mis-bucketing."""
    m = _STEP_RX.match(step)
    if not m:
        raise ValueError(
            f"unsupported resample step {step!r}: expected "
            "'<n> second|minute|hour|day|week(s)'"
        )
    return int(m.group(1)) * _STEP_UNIT_SECONDS[m.group(2).lower()]


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup per event type: count / sum / avg of value.

    ``value`` converts per-row to DECIMAL(18,6) BEFORE the sum: double
    summation is reduction-order-dependent, and at bench scale (~1e6
    rows/group) the drift crosses 6-dp rounding boundaries, breaking
    cross-engine and batch-vs-streaming equality. The per-row
    conversion is one deterministic rounding of the same IEEE double in
    every engine; the decimal sum is then exact and order-free, and
    avg is the exact sum over the exact NON-NULL count (ONE double
    division at the output edge — denominator COUNT(value), preserving
    SQL AVG's ignore-NULLs semantics)."""
    vdec = F.col("value").cast("decimal(18,6)")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(vdec).cast("double").alias("sum_value"),
            (F.sum(vdec).cast("double") / F.count(F.col("value"))).alias(
                "avg_value"
            ),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_minutes``. Classic lag + cumulative-sum pattern
    (guide: 'Sessionization'); per-user windows keep state bounded.

    Deterministic ordering: (ts, event_id) so runs and engines agree.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + gap), 1
    ).otherwise(0)
    with_sessions = events.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def top_n_per_group(
    df: DataFrame, group: list[str], order: list, n: int, rank_col: str = "rank"
) -> DataFrame:
    """Top-N per group via row_number — the standard OLAP ranking shape."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Time-series resample + gap-fill: per key, a dense ``step``-spaced
    grid from the key's first to last bucket, actual values aggregated
    into their bucket (exact DECIMAL sum), gaps forward-filled with the
    last observation (the hypertable `time_bucket_gapfill` + `locf`
    shape).

    Output: (key, bucket, filled_value, is_gap) — is_gap = 1 where the
    bucket had no observation and the value was carried forward.

    Scale: the grid is built per key from a (key)-keyed span agg and
    explodes to span/step rows per key — bounded by time range, not data
    volume; the fill is a per-key ordered window (running last-non-null,
    no global sort); observations reach the join pre-aggregated to one
    row per (key, bucket). Leading buckets before the first observation
    keep NULL — nothing to carry yet.

    Observation bucketing floors the epoch to ``step`` (tumbling,
    epoch-aligned — identical to date_trunc for whole hours/days under
    the engine's pinned UTC session timezone), so ANY fixed-length step
    produces buckets that land exactly on the grid the ``sequence``
    below generates from the same aligned origin; a truncation unit
    hardcoded independently of ``step`` would silently drop every
    observation into never-joined buckets for non-default steps.
    """
    secs = step_seconds(step)
    k = F.col(key_col)
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / secs) * secs
    )
    ag = (
        df.select(k.alias("key"), bucket.alias("bucket"),
                  F.col(value_col).cast("decimal(18,6)").alias("v"))
        .groupBy("key", "bucket")
        .agg(F.sum("v").cast("double").alias("v"))
    )
    span = ag.groupBy("key").agg(
        F.min("bucket").alias("h0"), F.max("bucket").alias("h1")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr(f"interval {step}"))
        ).alias("bucket"),
    )
    j = grid.join(ag, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col("key").alias(key_col),
        "bucket",
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_gap"),
    )


def debounce(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    quiet_seconds: int = 60,
    order_col: str | None = None,
) -> DataFrame:
    """Telemetry debounce: keep only the FIRST event of each burst per
    key — IDENTICAL to "``sessionize`` with gap=quiet_seconds and keep
    each session's opening event": a new burst opens on a gap STRICTLY
    greater than ``quiet_seconds`` (matching sessionize's ``ts >
    prev + gap`` boundary, so the two operators can cross-validate).
    The dedup family's time-axis member: exact dedup collapses
    identical payloads, debounce collapses temporal repeats regardless
    of payload.

    Rows with a NULL ``ts_col`` are dropped (a timestampless event has
    no position in any burst; passing them through would also disable
    debouncing of the event that follows, since its lag-gap would be
    NULL). The keep-relative-to-last-KEPT variant is an inherently
    sequential running state and deliberately not this operator.

    One key-keyed shuffle (the lag window); ties on ``ts`` order by
    ``order_col`` (pass an id column for a total order, else equal-ts
    rows within a burst are kept/dropped by an unspecified tiebreak)."""
    tmp = "__debounce_gap"
    if tmp in events.columns:
        raise ValueError(f"input already has a {tmp!r} column")
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    gap = F.col(ts_col).cast("double") - F.lag(
        F.col(ts_col).cast("double")
    ).over(w)
    return (
        events.filter(F.col(ts_col).isNotNull())
        .withColumn(tmp, gap)
        .filter(F.col(tmp).isNull() | (F.col(tmp) > quiet_seconds))
        .drop(tmp)
    )
