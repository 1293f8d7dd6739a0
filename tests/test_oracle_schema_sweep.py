"""Spark-vs-oracle SCHEMA sweep over every registered query.

The round-4 `ship_delay_priority_counts` red was values-bit-exact but
schema-mismatched: the oracle's uncast SUM returned DuckDB HUGEINT
(fetched as decimal128) while Spark returned bigint, and the driver's
schema-sensitive hash failed. pandas-level value comparison cannot see
that class of bug (fetchdf coerces), so this sweep compares the Spark
DataFrame schema against the oracle's ARROW schema with an explicit
normalization map and fails on any int-vs-decimal/double drift.

Cost note: for most specs the Spark side only BUILDS the plan, but
~10 specs (streaming equivalence verdicts, CTAS/bucketed layouts)
execute real work inside build() before .schema is readable — the
sweep re-pays that (~comparable to one parity run at sf0.001). Keep
action-at-build specs rare; the sweep's value (it caught the only
schema drift in a 152-query registry) justifies the current cost.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest
from pyspark.sql import types as T

from supplier_performance_data_pipeline_spark.plans.registry import load_all
from tests.conftest import SF_SMOKE
from tests.oracle_utils import duckdb_connection

SPECS = load_all()


def _compatible(spark_type: T.DataType, arrow_type: pa.DataType) -> bool:
    # Integer WIDTH differences are invisible to the driver's value
    # hash (every width renders the same digits) — r01-r04 proved
    # int32-vs-int64 rows hash green. int-vs-decimal/double is the
    # class that fails, so integers only match integers.
    if isinstance(
        spark_type, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    ):
        return pa.types.is_integer(arrow_type)
    if isinstance(spark_type, T.DoubleType):
        return pa.types.is_float64(arrow_type)
    if isinstance(spark_type, T.FloatType):
        return pa.types.is_float32(arrow_type)
    if isinstance(spark_type, T.StringType):
        return pa.types.is_string(arrow_type) or pa.types.is_large_string(
            arrow_type
        )
    if isinstance(spark_type, T.BooleanType):
        return pa.types.is_boolean(arrow_type)
    if isinstance(spark_type, T.DateType):
        return pa.types.is_date(arrow_type)
    if isinstance(spark_type, T.TimestampType) or isinstance(
        spark_type, T.TimestampNTZType
    ):
        return pa.types.is_timestamp(arrow_type)
    if isinstance(spark_type, T.DecimalType):
        # Spark-side DECIMAL in an output schema is ALWAYS a sweep
        # failure: the driver fetches DuckDB via fetchdf (NOT Arrow),
        # so the oracle side reaches the value hash as float64 while
        # Spark ships Decimal objects whose rendering drifts
        # ("0.301030" vs 0.30103) even when values are bit-identical
        # (round-5 `totalprice_benford_audit`). Scale-matched
        # decimal-vs-decimal is NOT safe. Cast to DOUBLE (or integer
        # units) at the output edge.
        return False
    if isinstance(spark_type, T.BinaryType):
        return pa.types.is_binary(arrow_type) or pa.types.is_large_binary(
            arrow_type
        )
    if isinstance(spark_type, T.ArrayType):
        return (
            pa.types.is_list(arrow_type) or pa.types.is_large_list(arrow_type)
        ) and _compatible(spark_type.elementType, arrow_type.value_type)
    return False  # unhandled type: surface it loudly


@pytest.fixture(scope="module")
def oracle_con() -> duckdb.DuckDBPyConnection:
    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_spark_and_oracle_schemas_agree(spark, oracle_con, name):
    spec = SPECS[name]
    if spec.oracle is None:
        pytest.skip("rows-only query (no oracle)")
    spark_schema = spec.build(spark, SF_SMOKE).schema
    arrow = oracle_con.execute(spec.oracle).fetch_arrow_table().schema
    spark_cols = {f.name: f.dataType for f in spark_schema.fields}
    arrow_cols = {f.name: f.type for f in arrow}
    assert sorted(spark_cols) == sorted(arrow_cols), (
        f"{name}: column sets differ {sorted(spark_cols)} vs {sorted(arrow_cols)}"
    )
    bad = {
        col: (str(spark_cols[col]), str(arrow_cols[col]))
        for col in spark_cols
        if not _compatible(spark_cols[col], arrow_cols[col])
    }
    assert not bad, (
        f"{name}: schema drift (spark vs oracle-arrow): {bad} — the "
        "driver's value hash is schema-sensitive; cast both arms to the "
        "same type (e.g. CAST(SUM(...) AS BIGINT) in the oracle)"
    )
