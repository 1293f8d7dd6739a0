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
from tests.plan_lint import ALLOWED_UNPARTITIONED, unpartitioned_window_specs

SPECS = load_all()
PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", SF_SMOKE)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, name):
    spec = SPECS[name]
    df = spec.build(spark, PARITY_SF_DIR)
    _assert_unpartitioned_windows_allowlisted(df, name)
    actual = df.toPandas()
    _assert_no_cache_residue(spark, name)
    if spec.oracle is None:
        assert len(actual) >= 0  # rows-only check, mirrors the driver
        return
    expected = run_oracle(PARITY_SF_DIR, spec.oracle)
    assert_frames_match(actual, expected, name, approx_cols=spec.approx_cols)


def _assert_unpartitioned_windows_allowlisted(df, name: str) -> None:
    """Suite-wide single-partition-window ban (round-8): a window with
    no PARTITION BY sorts its whole input in ONE task — the shape that
    dies on an entity-grain table at 100 TB. Every query whose physical
    plan contains one must carry a documented bounded-domain reason in
    tests/plan_lint.py::ALLOWED_UNPARTITIONED; entity-grain ranking
    must instead use operators/ranking.py's two-level parallel prefix.
    Zero extra build cost: the plan comes from the DataFrame the parity
    check is about to collect anyway."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = unpartitioned_window_specs(plan)
    if hits and name not in ALLOWED_UNPARTITIONED:
        raise AssertionError(
            f"{name}: physical plan contains {len(hits)} unpartitioned "
            f"window(s) and is not allowlisted in tests/plan_lint.py — "
            f"either rank via operators/ranking.py (two-level prefix) or "
            f"add a documented bounded-domain reason. First hit: "
            f"{hits[0]}"
        )


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
