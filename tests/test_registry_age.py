"""Every registered query must be stamped in REGISTRY_AGE.json.

The driver samples a bounded number of queries per round; the rotation
in __spark_entry__ orders the never-checked tier by registration age so
new additions cannot starve queries that already missed the cap. That
only works if the age file is maintained — this test makes forgetting
it a failure: when you register a query, add it to REGISTRY_AGE.json
with the CURRENT round number."""

from __future__ import annotations

import json
import os

from supplier_performance_data_pipeline_spark.plans.registry import load_all

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_a_registration_age():
    with open(os.path.join(HERE, "REGISTRY_AGE.json")) as f:
        age = json.load(f)
    names = set(load_all())
    missing = sorted(names - set(age))
    assert not missing, (
        f"add these to REGISTRY_AGE.json with the current round: {missing}"
    )
    stale = sorted(set(age) - names)
    assert not stale, f"REGISTRY_AGE.json lists unregistered queries: {stale}"
    assert all(isinstance(v, int) and v >= 1 for v in age.values())


def test_rotation_prefers_senior_never_checked():
    import __spark_entry__ as e

    age = e._registration_age()
    assert age, "REGISTRY_AGE.json must load"
    last, failed = e._board_state()
    order = e._rotation_order(list(load_all()))
    never = [n for n in order if n not in last and n not in failed]
    # Within the never-checked tier, ages must be non-decreasing.
    ages = [age.get(n, 99) for n in never]
    assert ages == sorted(ages), never


def test_rotation_puts_latest_row_failures_first():
    """Round-4 lesson: with a pure LRU rotation, a query that failed in
    the immediately previous round sorts LAST (it was just checked) and
    its fix cannot be re-proved for several rounds. Queries whose
    LATEST driver row failed must lead queries(); a later green row
    clears the flag."""
    import __spark_entry__ as e

    last, failed = e._board_state()
    order = e._rotation_order(list(load_all()))
    # board rows for renamed/deregistered queries linger in the failed
    # set forever; only registry members can occupy rotation slots
    failed &= set(order)
    k = len(failed)
    assert set(order[:k]) == failed, (
        f"failed queries must occupy the first {k} rotation slots"
    )
    # lsh_near_dup_pairs failed in r01 but re-proved green in r04 — the
    # flag must reflect the LATEST row, not any historical failure.
    if "lsh_near_dup_pairs" in last:
        assert "lsh_near_dup_pairs" not in failed
