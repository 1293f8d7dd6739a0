"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same differential check the driver runs at sf0.01 — running
it in CI-speed form keeps the correctness gate green by construction.
"""

from __future__ import annotations

import pytest

from supplier_performance_data_pipeline_spark.plans.registry import load_all
from tests.conftest import SF_SMOKE
from tests.oracle_utils import assert_frames_match, run_oracle

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, name):
    spec = SPECS[name]
    actual = spec.build(spark, SF_SMOKE).toPandas()
    if spec.oracle is None:
        assert len(actual) >= 0  # rows-only check, mirrors the driver
        return
    expected = run_oracle(SF_SMOKE, spec.oracle)
    assert_frames_match(actual, expected, name)
