"""Data-quality assertions — the reference's load-time integrity checks.

Reference parity: src/load_duckdb.py:97-128 (row-count sanity prints and
bidirectional orphan checks via LEFT JOIN ... IS NULL). Spark-first, the
anti pattern is a ``left_anti`` join — same semantics, and Catalyst plans
it as a broadcast/shuffled anti join without materializing the outer rows.

PRIMARY KEY constraints have no Spark equivalent; ``assert_unique_key``
is the declarative replacement (count vs. countDistinct in one agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_count(child: DataFrame, parent: DataFrame, on: str) -> int:
    """Rows of ``child`` with no match in ``parent`` on key ``on``
    (reference: src/load_duckdb.py:108-124, both directions)."""
    return child.join(parent, on, "left_anti").count()


def orphan_counts_df(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_name: str = "left_orphans",
    right_name: str = "right_orphans",
) -> DataFrame:
    """Both-direction orphan counts as a 1-row DataFrame (lazy; used by
    the correctness harness)."""
    lo = (
        left.join(right, left[left_key] == right[right_key], "left_anti")
        .agg(F.count("*").alias(left_name))
    )
    ro = (
        right.join(left, right[right_key] == left[left_key], "left_anti")
        .agg(F.count("*").alias(right_name))
    )
    return lo.crossJoin(ro)


def assert_unique_key(df: DataFrame, key: str) -> None:
    """PK-style uniqueness check: COUNT(*) == COUNT(DISTINCT key) and no NULLs."""
    row = df.agg(
        F.count("*").alias("n"),
        F.count(key).alias("n_nonnull"),
        F.countDistinct(key).alias("n_distinct"),
    ).collect()[0]
    if row.n != row.n_distinct or row.n != row.n_nonnull:
        raise AssertionError(
            f"key {key!r} not unique/non-null: rows={row.n} "
            f"nonnull={row.n_nonnull} distinct={row.n_distinct}"
        )


def assert_referential_integrity(
    child: DataFrame, parent: DataFrame, on: str, label: str = ""
) -> None:
    """Fail if any child row lacks a parent (reference's hard invariant:
    every PO has exactly one delivery and vice versa)."""
    n = orphan_count(child, parent, on)
    if n:
        raise AssertionError(f"referential integrity violated {label}: {n} orphans")


def row_counts(tables: dict[str, DataFrame]) -> dict[str, int]:
    """Row-count sanity (reference: src/load_duckdb.py:97-105)."""
    return {name: df.count() for name, df in tables.items()}
