"""Differential-test helper: run a registry query in Spark and its oracle
SQL in DuckDB over the same parquet tables, compare order-insensitively.

Mirrors the driver's t2 check (row-count + schema-ish + values) so we
catch mismatches before the driver does.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from supplier_performance_data_pipeline_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype(str)
        elif df[col].dtype == object:
            df[col] = df[col].map(lambda x: str(x) if x is not None else None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame, name: str):
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} vs {len(expected)}"
    )
    a, e = canonicalize(actual), canonicalize(expected)
    for col in a.columns:
        av, ev = a[col], e[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(ev):
            ok = np.isclose(
                av.astype(float), ev.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            ).all()
            assert ok, f"{name}: value mismatch in float column {col}"
        else:
            assert av.fillna("<NULL>").astype(str).equals(
                ev.fillna("<NULL>").astype(str)
            ), f"{name}: value mismatch in column {col}"


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()
