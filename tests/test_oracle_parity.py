"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same differential check the driver runs at sf0.01 — running
it in CI-speed form keeps the correctness gate green by construction.
Set SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 to run the whole
suite at driver scale (the pre-round full sweep; ~10 min).
"""

from __future__ import annotations

import os

import pytest

from supplier_performance_data_pipeline_spark.plans.registry import load_all
from tests.conftest import SF_SMOKE
from tests.oracle_utils import assert_frames_match, run_oracle

SPECS = load_all()
PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", SF_SMOKE)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, name):
    spec = SPECS[name]
    actual = spec.build(spark, PARITY_SF_DIR).toPandas()
    _assert_no_cache_residue(spark, name)
    if spec.oracle is None:
        assert len(actual) >= 0  # rows-only check, mirrors the driver
        return
    expected = run_oracle(PARITY_SF_DIR, spec.oracle)
    assert_frames_match(actual, expected, name, approx_cols=spec.approx_cols)


def _assert_no_cache_residue(spark, name: str) -> None:
    """Cache hygiene as a pinned invariant: no registered query may
    leave an entry in the session CacheManager after its action — an
    unowned ``persist`` accumulates across a 77-query × multi-run
    session until eviction (the round-2 bench drift). Materialization
    inside queries must be either a scoped persist (unpersisted before
    the build returns) or a localCheckpoint, whose blocks the
    ContextCleaner reclaims by liveness instead of leaking by default.
    """
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    assert cache_mgr.isEmpty(), (
        f"{name} left persisted plans in the CacheManager after its action"
    )
