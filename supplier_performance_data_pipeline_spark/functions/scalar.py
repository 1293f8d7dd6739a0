"""Scalar expression helpers — all native Column expressions.

Everything here stays inside WholeStageCodegen (no Python UDFs): these are
the reference's scalar surface (SURVEY.md §2.7) as composable builders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def nullif_div(num: Column, den: Column) -> Column:
    """NULL-safe division: ``num / NULLIF(den, 0)``.

    Reference parity: src/compute_kpis.py:64. Spark's non-ANSI division
    already NULLs on 0/0, but the explicit guard keeps semantics stable
    under ``spark.sql.ansi.enabled`` (SURVEY.md §7.3).
    """
    return num.cast("double") / F.nullif(den, F.lit(0))


def on_time_flag(delivery_date: Column, promised_date: Column) -> Column:
    """1 if delivered on or before the promised date, else 0.

    Reference parity: src/compute_kpis.py:44-45 (0/1 INTEGER so it can be
    averaged directly into a rate).
    """
    return F.when(delivery_date <= promised_date, 1).otherwise(0)


def minmax_normalize(
    value: Column, vmin: Column, vmax: Column, invert: bool = False
) -> Column:
    """Guarded min-max normalization ``(x - min) / (max - min)``.

    Degenerate range (max == min) yields 1.0 — "everyone equal" —
    matching the reference's defensive CASE (src/compute_risk.py:58-80).
    ``invert=True`` flips lower-is-better metrics (delay, quality).
    """
    norm = F.when(vmax == vmin, F.lit(1.0)).otherwise(
        (value - vmin) / (vmax - vmin)
    )
    if invert:
        norm = F.when(vmax == vmin, F.lit(1.0)).otherwise(
            F.lit(1.0) - (value - vmin) / (vmax - vmin)
        )
    return norm


def round_doubles(df: DataFrame, scale: int = 6) -> DataFrame:
    """Round every DoubleType column to ``scale`` decimals.

    Canonicalization for oracle comparison: float reduction order differs
    across partitionings (SURVEY.md §7.3), so both the Spark query and the
    DuckDB oracle round to the same scale before hashing.
    """
    cols = [
        F.round(F.col(f.name), scale).alias(f.name)
        if isinstance(f.dataType, T.DoubleType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)
