"""Serving / presentation queries — the dashboard's read path, pushed down.

Reference parity: dashboard/app.py:84-214. The reference pulls the whole
summary into pandas and filters client-side; Spark-first we push filters,
top-N, and aggregates into the DataFrame plan and only ``.toPandas()`` the
final small result (SURVEY.md §3.3). Top-k compiles to
TakeOrderedAndProject — no full sort, no single-partition shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_filters(
    df: DataFrame,
    equals: dict[str, object] | None = None,
    between: dict[str, tuple[object, object]] | None = None,
) -> DataFrame:
    """Equality + range predicates (reference: dashboard/app.py:99-103)."""
    for col, val in (equals or {}).items():
        df = df.filter(F.col(col) == val)
    for col, (lo, hi) in (between or {}).items():
        df = df.filter(F.col(col).between(lo, hi))
    return df


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """Distinct non-null values for filter widgets
    (reference: dashboard/app.py:86-87)."""
    return df.select(col).na.drop().distinct()


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k (reference: src/compute_kpis.py:80-98,
    src/compute_risk.py:117-133, dashboard/app.py:149).

    Callers should include a unique key as the final sort column so the
    selected SET is deterministic under ties.
    """
    return df.orderBy(*order).limit(k)


def kpi_tiles(df: DataFrame, cols: list[str]) -> DataFrame:
    """Means over the (filtered) summary for dashboard tiles
    (reference: dashboard/app.py:107-111)."""
    return df.agg(*[F.avg(c).alias(f"avg_{c}") for c in cols])


def column_bounds(df: DataFrame, col: str) -> DataFrame:
    """min/max of one column for slider widgets
    (reference: dashboard/app.py:92-93)."""
    return df.agg(F.min(col).alias(f"min_{col}"), F.max(col).alias(f"max_{col}"))


def display_projection(df: DataFrame) -> DataFrame:
    """Dashboard display columns (reference: dashboard/app.py:63-69):
    ``*_pct`` percent renderings of the rate columns (×100, 1 decimal)
    next to the raw values, delay rounded to 2, scores to 3. A pure
    projection — runs at the serving edge, never a shuffle."""
    return df.withColumns(
        {
            "on_time_delivery_rate_pct": F.round(
                F.col("on_time_delivery_rate") * 100, 1
            ),
            "fill_rate_pct": F.round(F.col("fill_rate") * 100, 1),
            "quality_issue_rate_pct": F.round(
                F.col("quality_issue_rate") * 100, 1
            ),
            "avg_delivery_delay_days": F.round(
                F.col("avg_delivery_delay_days"), 2
            ),
            "performance_score": F.round(F.col("performance_score"), 3),
            "risk_score": F.round(F.col("risk_score"), 3),
        }
    )


def preview(df: DataFrame, key: str, n: int) -> DataFrame:
    """Deterministic table preview: the reference's ``SELECT * LIMIT n``
    (dashboard/app.py:204) ordered by key so the returned set is stable."""
    return df.orderBy(key).limit(n)
