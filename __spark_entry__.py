"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``supplier_performance_data_pipeline_spark``;
this file is a thin view over its query registry.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from supplier_performance_data_pipeline_spark.plans.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _board_state() -> tuple[dict[str, int], set[str]]:
    """(last-checked round per query, queries whose LATEST row FAILED).

    Queries absent from every round file have never been driver-checked.
    A row passes only if rows/schema/hash all match; the failed set is
    computed from each query's most recent row, so a later green row
    clears the flag.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    passed_at: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            last[name] = max(last.get(name, 0), rnd)
            ok = bool(
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            if name not in passed_at or rnd > passed_at[name][0]:
                passed_at[name] = (rnd, ok)
    failed = {n for n, (_, ok) in passed_at.items() if not ok}
    return last, failed


# Registration age per query (committed REGISTRY_AGE.json: name -> the
# round it was first registered). Within the never-checked rotation tier
# OLDER registrations sort first: the round-3 board showed that a purely
# alphabetical tier lets a batch of new names push queries that already
# missed the driver's per-round sample cap (alphabetically late names
# like vocab_top_terms missed it two rounds running) past the cap again
# indefinitely. Seniority-first makes the wait bounded: a query can only
# be deferred by queries registered before it. tests/test_registry_age.py
# fails if a registered query is missing from the file, so every future
# round MUST stamp its additions with the current round number.


def _registration_age() -> dict[str, int]:
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "REGISTRY_AGE.json")) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}
    return {k: int(v) for k, v in data.items()} if isinstance(data, dict) else {}


def _modified_since_checked(
    names: list[str], last: dict[str, int]
) -> set[str]:
    """Queries whose content fingerprint was stamped in a round NEWER
    than their latest driver row — their board green certifies code
    that no longer exists, so they re-check with failure priority
    (round-8 verdict, top item: the ranking rewrites sat on r04–r07
    rows for a full round). Never-checked queries are excluded — the
    never-checked tier already front-runs them."""
    from supplier_performance_data_pipeline_spark.plans.fingerprints import (
        load_stamped,
        modified_round,
    )

    stamped = load_stamped()
    return {
        n
        for n in names
        if n in last and modified_round(n, stamped) > last[n]
    }


def _rotation_order(names: list[str]) -> list[str]:
    """Failed-latest-row first, then modified-since-last-driver-row,
    then least-recently-driver-checked (never-checked, then by
    ascending last-checked round); within a tier, senior registrations
    before newer ones, alphabetical last.

    The driver samples a bounded number of queries per round in
    ``queries()`` iteration order. The round-4 verdict showed why
    failures must lead: with a pure LRU rotation a query that failed
    in the immediately previous round sorts LAST (it was just
    checked), so its fix can't be re-proved for several rounds. The
    failed tier bounds re-proof latency to one round; the modified
    tier (round-8 verdict) does the same for rewrites of queries
    whose latest row is green.
    """
    last, failed = _board_state()
    age = _registration_age()
    modified = _modified_since_checked(names, last)
    return sorted(
        names,
        key=lambda n: (
            n not in failed,
            n not in modified,
            last.get(n, -1),
            age.get(n, 99),
            n,
        ),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core query — supplier KPIs from the 3-way join
    (reference: src/compute_kpis.py:24-74) — over the TPC-H→domain
    adapter.
    """
    specs = load_all()
    return specs["supplier_kpis"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-recently-driver-checked first (see ``_rotation_order``)."""
    specs = load_all()
    return {name: specs[name].build for name in _rotation_order(list(specs))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only),
    in the same rotation order as ``queries()``."""
    specs = load_all()
    return {
        name: specs[name].oracle
        for name in _rotation_order(list(specs))
        if specs[name].oracle is not None
    }
