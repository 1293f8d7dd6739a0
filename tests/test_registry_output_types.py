"""Registry-wide OUTPUT-TYPE lint: every column a query ships across
the driver's hash boundary must be driver-hashable.

Both round-5 reds were output-encoding classes, not logic bugs:

* ``embedding_pq_codes`` shipped ``array<int>`` — the driver's
  canonicalizer (pandas ``sort_values``/``factorize`` over all
  columns) throws ``unhashable type: 'list'`` before any comparison,
  so the operator is unverifiable from the driver's seat no matter
  how correct it is. The same holds for any array/map/struct column.
* ``totalprice_benford_audit`` shipped ``decimal(7,6)`` — Spark
  round-trips it to pandas as ``decimal.Decimal`` whose rendering
  ("0.301030") drifts from the oracle fetch's float64 (0.30103) even
  when values are bit-identical.

This lint turns both classes into impossible states: a registered
query whose BUILT schema (at sf0.001) contains any nested or decimal
type fails here, long before the driver sees it. Allowed leaf types
are exactly what the driver's pandas canonicalizer hashes stably:
integers of any width, float/double, string, boolean, date,
timestamp, binary.

Complements ``test_oracle_schema_sweep`` (Spark-vs-oracle drift);
this one also covers rows-only specs, which the sweep skips.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from supplier_performance_data_pipeline_spark.plans.registry import load_all
from tests.conftest import SF_SMOKE

SPECS = load_all()

# Driver-hashable leaf types. NO ArrayType / MapType / StructType
# (canonicalizer crash) and NO DecimalType (rendering drift vs the
# oracle's float64 fetch) — see module docstring.
_ALLOWED = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.StringType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BinaryType,
)


def _violations(schema: T.StructType) -> dict[str, str]:
    return {
        f.name: f.dataType.simpleString()
        for f in schema.fields
        if not isinstance(f.dataType, _ALLOWED)
    }


@pytest.mark.parametrize("name", sorted(SPECS))
def test_output_schema_is_driver_hashable(spark, name):
    bad = _violations(SPECS[name].build(spark, SF_SMOKE).schema)
    assert not bad, (
        f"{name}: non-driver-hashable output column(s) {bad} — "
        "array/map/struct crash the driver's canonicalizer "
        "(unhashable in pandas sort_values) and decimal hash-drifts "
        "against the oracle's float64 fetch. Serialize arrays "
        "(concat_ws) or explode to columns; cast decimals to DOUBLE "
        "or integer units at the output edge."
    )


def test_lint_catches_the_round5_red_shapes():
    """The unfixed pq/benford output shapes must fail this lint."""
    pq_shape = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("distortion", T.DoubleType()),
        ]
    )
    benford_shape = T.StructType(
        [
            T.StructField("digit", T.IntegerType()),
            T.StructField("benford_freq", T.DecimalType(7, 6)),
        ]
    )
    assert _violations(pq_shape) == {"codes": "array<int>"}
    assert _violations(benford_shape) == {"benford_freq": "decimal(7,6)"}
    ok_shape = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    assert _violations(ok_shape) == {}
