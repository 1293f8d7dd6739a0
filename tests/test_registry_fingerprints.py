"""Every registered query must carry a CURRENT content fingerprint in
REGISTRY_FINGERPRINTS.json, and the rotation must re-check modified
queries with failure-grade priority.

Round-8 verdict, top item: the driver board is the canonical
correctness record, but its rotation (failed → never-checked → LRU)
had no "implementation changed" tier, so the round-8 ranking rewrites
kept green rows that certified code that no longer existed. The
fingerprint file closes that: hash(build source + oracle SQL) per
query, stamped with the round the fingerprint first appeared; the
rotation sorts stamped-round > last-driver-row queries right after
failures. When this test fails after you edit a query, run

    python -m supplier_performance_data_pipeline_spark.plans.fingerprints

to re-stamp changed entries with the current round. Helper-module-only
changes (an operators/ rewrite behind an unchanged build function)
don't move the hash — hand-bump the stamped round for the affected
queries in that case."""

from __future__ import annotations

import json

from supplier_performance_data_pipeline_spark.plans import fingerprints as fp
from supplier_performance_data_pipeline_spark.plans.registry import load_all


def test_every_query_fingerprint_is_stamped_and_current():
    stamped = fp.load_stamped()
    assert stamped, "REGISTRY_FINGERPRINTS.json must exist and load"
    specs = load_all()
    live = fp.compute_fingerprints(specs)
    missing = sorted(set(live) - set(stamped))
    assert not missing, (
        "unstamped queries — run python -m "
        "supplier_performance_data_pipeline_spark.plans.fingerprints: "
        f"{missing}"
    )
    stale_names = sorted(set(stamped) - set(live))
    assert not stale_names, f"stamps for unregistered queries: {stale_names}"
    drifted = sorted(
        n for n in live if stamped[n].get("fp") != live[n]
    )
    assert not drifted, (
        "fingerprint drift (query changed without re-stamping) — run "
        "python -m supplier_performance_data_pipeline_spark.plans."
        f"fingerprints: {drifted}"
    )
    assert all(
        isinstance(r.get("round"), int) and r["round"] >= 0
        for r in stamped.values()
    )


def test_rotation_tier_order_failed_modified_never_lru(monkeypatch):
    """Synthetic board: a failed query leads, a modified-since-checked
    query follows, then never-checked, then stale LRU."""
    import __spark_entry__ as e

    names = ["lru_q", "failed_q", "modified_q", "never_q"]
    monkeypatch.setattr(
        e,
        "_board_state",
        lambda: (
            {"failed_q": 8, "modified_q": 4, "lru_q": 3},
            {"failed_q"},
        ),
    )
    monkeypatch.setattr(e, "_registration_age", lambda: dict.fromkeys(names, 1))
    monkeypatch.setattr(
        fp,
        "load_stamped",
        lambda path=fp.FINGERPRINT_FILE: {
            "modified_q": {"fp": "x", "round": 8},  # 8 > last row 4
            "lru_q": {"fp": "y", "round": 2},       # 2 < last row 3
        },
    )
    assert e._rotation_order(names) == [
        "failed_q", "modified_q", "never_q", "lru_q",
    ]


def test_refresh_bumps_changed_keeps_unchanged(tmp_path, monkeypatch):
    specs = load_all()
    live = fp.compute_fingerprints(specs)
    a, b = sorted(live)[:2]
    path = tmp_path / "fps.json"
    path.write_text(json.dumps({
        a: {"fp": live[a], "round": 3},       # unchanged -> keeps 3
        b: {"fp": "0" * 16, "round": 3},      # drifted   -> current round
    }))
    out = fp.refresh(str(path))
    cur = fp.current_round()
    assert out[a] == {"fp": live[a], "round": 3}
    assert out[b] == {"fp": live[b], "round": cur}
    on_disk = json.loads(path.read_text())
    assert set(on_disk) == set(live)


def test_modified_tier_excludes_never_checked():
    stamped = {"q": {"fp": "x", "round": 9}}
    import __spark_entry__ as e
    from unittest import mock

    with mock.patch.object(fp, "load_stamped", return_value=stamped):
        assert e._modified_since_checked(["q"], {}) == set()
        assert e._modified_since_checked(["q"], {"q": 4}) == {"q"}
        assert e._modified_since_checked(["q"], {"q": 9}) == set()
