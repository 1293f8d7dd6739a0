"""Differential-test helper: run a registry query in Spark and its oracle
SQL in DuckDB over the same parquet tables, compare order-insensitively.

Mirrors the driver's t2 check (row-count + schema-ish + values) so we
catch mismatches before the driver does.
"""

from __future__ import annotations

import decimal
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


def assert_frames_match(
    actual: pd.DataFrame,
    expected: pd.DataFrame,
    name: str,
    approx_cols: frozenset[str] = frozenset(),
):
    """Exact comparison by default, EVEN for float columns.

    The driver hashes exact values; round 4 proved that a tolerant
    local gate (the old rtol=1e-9, which at 1e8 magnitude tolerates
    cent-level absolute error) certifies queries the driver then
    fails. Float columns are compared by repr (bit-identity up to the
    0.0/-0.0 distinction the shortest-roundtrip repr makes visible —
    which the driver's canonicalization would also see); only columns
    a spec explicitly declares in ``approx_cols`` fall back to the
    tolerance check.
    """
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    # A decimal.Decimal object column on EITHER side is a hard fail
    # BEFORE any comparison: the float branch's astype(float) would
    # coerce it and erase exactly the rendering drift the driver's
    # value hash sees (round-5 `totalprice_benford_audit`: Spark
    # decimal(7,6) renders "0.301030", DuckDB's fetch renders 0.30103
    # — values bit-identical, hash red). Cast to DOUBLE at the output
    # edge in both arms instead.
    for side, frame in (("actual", actual), ("expected", expected)):
        for col in frame.columns:
            if frame[col].dtype == object:
                non_null = frame[col].dropna()
                if len(non_null) and isinstance(
                    non_null.iloc[0], decimal.Decimal
                ):
                    raise AssertionError(
                        f"{name}: {side} column {col!r} holds "
                        "decimal.Decimal objects — the driver hashes "
                        "its rendering, which drifts from the other "
                        "arm's float repr even when values are "
                        "bit-identical. Cast to DOUBLE in both arms."
                    )
    # IEEE NEGATIVE ZERO in a float column on EITHER side is a hard
    # fail even when both arms agree: DuckDB's ROUND(double) preserves
    # the sign of a tiny negative (-0.001 -> -0.0) while Spark's
    # BigDecimal-based round always emits +0.0, so any negative-capable
    # rounded column diverges the moment a value lands in
    # (-0.5*10^-s, 0) — supplier_risk_display realized this at sf0.1.
    # Agreement on -0.0 is an accident of which arm computed it;
    # normalize at the output edge instead (SQL: `ROUND(x, s) + 0`).
    for side, frame in (("actual", actual), ("expected", expected)):
        for col in frame.columns:
            if pd.api.types.is_float_dtype(frame[col]):
                vals = frame[col].to_numpy()
                zeros = vals == 0.0
                if (np.signbit(vals) & zeros).any():
                    raise AssertionError(
                        f"{name}: {side} column {col!r} contains IEEE "
                        "-0.0 — engines disagree on the sign of a "
                        "rounded zero (DuckDB keeps it, Spark does "
                        "not) and the driver hashes the rendering. "
                        "Normalize at the output edge: ROUND(x, s) + 0 "
                        "in the oracle / the Spark round is already "
                        "+0.0-safe."
                    )
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} vs {len(expected)}"
    )
    a, e = canonicalize(actual), canonicalize(expected)
    for col in a.columns:
        av, ev = a[col], e[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(ev):
            af = av.astype(float)
            ef = ev.astype(float)
            if col in approx_cols:
                ok = np.isclose(
                    af, ef, rtol=1e-9, atol=1e-9, equal_nan=True
                ).all()
                assert ok, f"{name}: value mismatch in approx float column {col}"
            else:
                ar = af.map(repr)
                er = ef.map(repr)
                mism = ar[ar != er]
                assert mism.empty, (
                    f"{name}: exact float mismatch in column {col} "
                    f"({len(mism)} rows), first: "
                    f"{ar[mism.index[0]]} vs {er[mism.index[0]]} "
                    "(declare in approx_cols ONLY with a documented "
                    "approximate contract)"
                )
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
