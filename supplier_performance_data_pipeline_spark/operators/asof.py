"""As-of (backward) join — an operator Spark's API lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key (inclusive backward match,
the ASOF JOIN of kdb+/DuckDB/pandas ``merge_asof``).

Spark-first implementation: the union trick — tag both sides, union,
then one pass of ``last(value, ignorenulls=True)`` over a
(key)-partitioned window ordered by (ts, side). Cost is a single
shuffle on the key — same as any equi-join — and per-key state in the
sort; no range explosion, no per-key driver loops. Right rows sort
before left rows at equal timestamps, which is exactly the inclusive
semantics. At 100 TB this scales like a sort-merge join keyed by
``on``; skewed keys fall to AQE skew handling like any other window.

Determinism: callers must ensure (key, ts) is unique on the right side
(pre-aggregate otherwise) — with duplicates the winner among equal sort
keys is unspecified, in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: list[str],
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join; right ``value_cols`` (+ the matched right timestamp
    as ``{prefix}{ts_col}``) appended to every left row, NULL when no
    right row matches. ``direction="backward"`` (default) attaches the
    most recent right row with ``right.ts <= left.ts``;
    ``direction="forward"`` the nearest upcoming right row with
    ``right.ts >= left.ts`` — the "next maintenance window / next
    error" lookup. Same single-shuffle union-trick plan either way:
    only the window frame and the equal-timestamp side ordering flip
    (inclusive semantics need the right row adjacent to the left row
    INSIDE the frame)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    # A right row with NULL ts must be ignored in BOTH directions: it
    # has no time position. Without this guard it still carries a
    # non-null _rv struct and (NULLS FIRST) sorts to the head of the
    # backward frame, so a left row with no real predecessor would get
    # a fabricated match with NULL r_ts but non-null value columns —
    # while the forward frame never matched it: asymmetric semantics.
    rv = F.when(
        F.col(ts_col).isNotNull(),
        F.struct(
            F.col(ts_col).alias(ts_col),
            *[F.col(c).alias(c) for c in value_cols],
        ),
    )
    right_tagged = right.select(
        F.col(on), F.col(ts_col), rv.alias("_rv"), F.lit(0).alias("_side")
    )
    rv_type = right_tagged.schema["_rv"].dataType

    left_payload = [c for c in left.columns if c not in (on, ts_col)]
    left_tagged = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(1).alias("_side"),
        *left_payload,
    )
    # Align schemas: right side carries typed NULLs for the left payload.
    for c in left_payload:
        right_tagged = right_tagged.withColumn(
            c, F.lit(None).cast(left.schema[c].dataType)
        )
    unioned = left_tagged.unionByName(right_tagged)

    if direction == "backward":
        # Right (0) sorts before left (1) at equal ts -> inclusive.
        w = (
            Window.partitionBy(on)
            .orderBy(ts_col, "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match_expr = F.last("_rv", ignorenulls=True).over(w)
    else:
        # Left (1) sorts before right (0) at equal ts -> the equal-ts
        # right row is inside the FOLLOWING frame: inclusive forward.
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match_expr = F.first("_rv", ignorenulls=True).over(w)
    # A NULL left timestamp has no order position: Spark sorts NULLs
    # first, which the backward frame turns into a correct no-match but
    # the forward frame would turn into a fabricated match with the
    # partition's EARLIEST right row. Both directions must agree: NULL
    # ts -> NULL match.
    match_expr = F.when(F.col(ts_col).isNotNull(), match_expr)
    matched = unioned.withColumn("_match", match_expr).filter(
        F.col("_side") == 1
    )

    out_cols = [F.col(on), F.col(ts_col), *[F.col(c) for c in left_payload]]
    out_cols.append(F.col(f"_match.{ts_col}").alias(f"{prefix}{ts_col}"))
    out_cols.extend(
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in value_cols
    )
    return matched.select(*out_cols)
