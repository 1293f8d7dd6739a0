"""Operator-level characterizations of the round-8 additions: the
scale-safe global-ranking helpers (operators/ranking.py) and the
PPJoin+ suffix filter (operators/dedup.py::_suffix_filter).

The registered queries stay differentially gated against DuckDB (the
parity suite, whose oracles — plain NTILE / plain verify — did NOT
change this round); these tests pin the operator semantics and the
strict-pruning guarantees directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from supplier_performance_data_pipeline_spark.operators.ranking import (
    blocked_row_number,
    ntile_from_rank,
    quantile_blocks,
)

from tests.conftest import SF_SMOKE as SF  # single source of truth


# --- ntile_from_rank: closed form vs Spark's own NTILE -----------------------


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (5, 4), (7, 3),
                                 (10, 10), (11, 10), (97, 10), (100, 7)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, k):
    """The remainder-first split must be bit-identical to WindowExec's
    NTILE for every (n, k) shape: n < k, n == k, n % k == 0, and
    remainder cases."""
    df = spark.range(1, n + 1).select(F.col("id").alias("v"))
    w = Window.orderBy("v")
    expect = df.select("v", F.ntile(k).over(w).alias("t"))
    got = df.select(
        "v",
        ntile_from_rank(F.col("v"), F.lit(n).cast("long"), k).alias("t"),
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in expect.collect()
    }


# --- blocked_row_number: exact global rank, any monotone blocking ------------


def _rank_fixture(spark):
    """Values with heavy ties (so ties span would-be block edges if the
    block were not a pure function of the value) plus a unique
    tie-break key."""
    rows = [(i, (i * i) % 13) for i in range(200)]
    return spark.createDataFrame(rows, "k long, v long")


def test_blocked_row_number_matches_global_row_number_asc(spark):
    df = _rank_fixture(spark)
    got = blocked_row_number(
        df.withColumn("_blk", (F.col("v") / 4).cast("long")),
        [F.asc("v"), F.asc("k")],
    )
    w = Window.orderBy(F.asc("v"), F.asc("k"))
    expect = df.select("k", F.row_number().over(w).alias("rn"))
    g = {(r["k"], r["rn"]) for r in got.select("k", "rn").collect()}
    e = {tuple(r) for r in expect.collect()}
    assert g == e
    totals = {r["n_total"] for r in got.select("n_total").collect()}
    assert totals == {200}


def test_blocked_row_number_matches_global_row_number_desc(spark):
    df = _rank_fixture(spark)
    got = blocked_row_number(
        df.withColumn("_blk", -F.col("v")),  # every value its own block
        [F.desc("v"), F.asc("k")],
    )
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    expect = df.select("k", F.row_number().over(w).alias("rn"))
    assert {(r["k"], r["rn"]) for r in got.select("k", "rn").collect()} == {
        tuple(r) for r in expect.collect()
    }


def test_blocked_row_number_single_block_degenerates_gracefully(spark):
    """A constant block is a legal (if useless) blocking — the result
    must still be the exact global rank."""
    df = _rank_fixture(spark)
    got = blocked_row_number(
        df.withColumn("_blk", F.lit(0)), [F.asc("v"), F.asc("k")]
    )
    w = Window.orderBy(F.asc("v"), F.asc("k"))
    expect = df.select("k", F.row_number().over(w).alias("rn"))
    assert {(r["k"], r["rn"]) for r in got.select("k", "rn").collect()} == {
        tuple(r) for r in expect.collect()
    }


def test_quantile_blocks_is_monotone_and_tie_consistent(spark):
    """Blocks from approx_percentile cuts must be monotone with the
    sort order and a pure function of the value (equal values share a
    block), in both directions."""
    rows = [(i, float((i * 37) % 101)) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, v double")
    for desc in (False, True):
        out = quantile_blocks(df, "v", desc=desc, num_blocks=8).collect()
        by_v: dict[float, set[int]] = {}
        for r in out:
            by_v.setdefault(r["v"], set()).add(r["_blk"])
        assert all(len(s) == 1 for s in by_v.values())  # tie-consistent
        ordered = sorted(by_v, reverse=desc)
        blks = [next(iter(by_v[v])) for v in ordered]
        assert blks == sorted(blks)  # monotone with sort order
        assert len(set(blks)) > 1  # actually splits the domain


def test_blocked_row_number_composed_with_quantile_blocks(spark):
    """End-to-end: quantile blocks + blocked rank == plain global
    row_number, on a value column with duplicates."""
    rows = [(i, float((i * 7) % 23)) for i in range(250)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = blocked_row_number(
        quantile_blocks(df, "v", desc=True, num_blocks=8),
        [F.desc("v"), F.asc("k")],
    )
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    expect = df.select("k", F.row_number().over(w).alias("rn"))
    assert {(r["k"], r["rn"]) for r in got.select("k", "rn").collect()} == {
        tuple(r) for r in expect.collect()
    }


# --- PPJoin+ suffix filter ----------------------------------------------------


def _jaccard_candidates(spark, num, den):
    """The length+positional-pruned, pair-distinct candidate set of
    jaccard_prefix_join on the real fixture — the suffix filter's
    input, reproduced exactly as the operator builds it."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        SHINGLE_N,
        _prefix_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dt, dl, pfx, _ = _prefix_index(docs, num, den, "text", SHINGLE_N)
    a = pfx.select(
        F.col("doc_id").alias("doc_a"), "tok",
        F.col("pos").alias("pos_a"), F.col("len").alias("la"),
    )
    b = pfx.select(
        F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b"),
        F.col("pos").alias("pos_b"), F.col("len").alias("lb"),
    )
    alpha = F.expr(
        f"({num} * (la + lb) + {num + den - 1}) div {num + den}"
    )
    cand = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.lit(num) * F.col("la") <= F.lit(den) * F.col("lb"))
            & (F.lit(num) * F.col("lb") <= F.lit(den) * F.col("la"))
            & (
                F.lit(1)
                + F.least(
                    F.col("la") - F.col("pos_a"),
                    F.col("lb") - F.col("pos_b"),
                )
                >= alpha
            ),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return cand, dt, dl


def test_suffix_filter_cuts_candidates_strictly(spark):
    """The multi-probe suffix filter must strictly shrink the candidate
    set on the real fixture (a no-op rewrite passes parity but fails
    here) while never dropping a pair the verify step accepts. At the
    registered queries' own thresholds (3/5, 4/5) the length+positional
    filters already leave near-pure candidates on this corpus, so the
    pin runs at 2/5 where false candidates demonstrably exist."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        _pair_overlap_stats,
        _suffix_filter,
    )

    num, den = 2, 5
    cand, dt, dl = _jaccard_candidates(spark, num, den)
    before = {tuple(r) for r in cand.collect()}
    filtered = _suffix_filter(
        cand, dt,
        lambda bound, la, lb: F.lit(num + den) * bound
        >= F.lit(num) * (la + lb),
    )
    after = {tuple(r) for r in filtered.collect()}
    assert after < before, (len(after), len(before))
    # Losslessness: every verified-true pair survives the filter.
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in _pair_overlap_stats(cand, dt, dl)
        .filter(
            F.lit(den) * F.col("ni")
            >= F.lit(num) * (F.col("la") + F.col("lb") - F.col("ni"))
        )
        .select("doc_a", "doc_b")
        .collect()
    }
    assert true_pairs <= after


@pytest.mark.parametrize("probes", [1, 3, 8])
def test_suffix_filter_bound_dominates_true_overlap(spark, probes):
    """The segmented bound must upper-bound the exact overlap for EVERY
    candidate pair at every probe depth: filtering with the predicate
    ``bound >= k`` must keep every pair whose TRUE overlap is >= k, for
    a ladder of k values — the dominance property stated pair-by-pair,
    without reaching into the filter's internals."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        SHINGLE_N,
        _pair_overlap_stats,
        _prefix_index,
        _suffix_filter,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    dt, dl, pfx, _ = _prefix_index(docs, 1, 100, "text", SHINGLE_N)
    a = pfx.select(F.col("doc_id").alias("doc_a"), "tok")
    b = pfx.select(F.col("doc_id").alias("doc_b"), F.col("tok").alias("tb"))
    cand = (
        a.join(b, (F.col("tok") == F.col("tb"))
               & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b").distinct()
    )
    overlaps = {
        (r["doc_a"], r["doc_b"]): r["ni"]
        for r in _pair_overlap_stats(cand, dt, dl)
        .select("doc_a", "doc_b", "ni").collect()
    }
    assert overlaps, "fixture produced no candidate pairs"
    for k in (1, 2, 4, 8, 16):
        kept = {
            tuple(r)
            for r in _suffix_filter(
                cand, dt,
                lambda bound, la, lb, k=k: bound >= F.lit(k),
                probes=probes,
            ).collect()
        }
        must_keep = {p for p, ni in overlaps.items() if ni >= k}
        assert must_keep <= kept, (k, sorted(must_keep - kept)[:5])


# --- window-lint allowlist hygiene --------------------------------------------


def test_window_allowlist_names_are_registered():
    """Every ALLOWED_UNPARTITIONED entry must name a live registered
    query — stale entries would silently widen the ban's escape hatch."""
    from supplier_performance_data_pipeline_spark.plans.registry import (
        load_all,
    )
    from tests.plan_lint import ALLOWED_UNPARTITIONED

    specs = load_all()
    stale = sorted(set(ALLOWED_UNPARTITIONED) - set(specs))
    assert not stale, f"allowlisted but not registered: {stale}"


def test_suffix_filter_knob_preserves_join_results(spark):
    """jaccard_prefix_join with the suffix stage enabled must return
    exactly the default path's pairs (the filter is plan-only pruning;
    losslessness end-to-end, not just at candidate grain)."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        jaccard_prefix_join,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_prefix_join(docs, 2, 5).collect()
    }
    with_suffix = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_prefix_join(docs, 2, 5, suffix_probes=8).collect()
    }
    assert base == with_suffix and base


# --- property tests for the ranking helpers -----------------------------------


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(n=st.integers(min_value=1, max_value=400),
       k=st.integers(min_value=1, max_value=17))
@_SLOW
def test_ntile_from_rank_model(spark, n, k):
    """Model check against the SQL-standard definition computed in
    Python: q = n // k, r = n % k; first r buckets hold q+1 ranks."""
    q, r = divmod(n, k)

    def model(rn: int) -> int:
        big = r * (q + 1)
        if rn <= big:
            return (rn - 1) // (q + 1) + 1
        return r + (rn - big - 1) // q + 1

    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    got = {
        row["rn"]: row["t"]
        for row in df.select(
            "rn",
            ntile_from_rank(F.col("rn"), F.lit(n).cast("long"), k).alias("t"),
        ).collect()
    }
    assert got == {rn: model(rn) for rn in range(1, n + 1)}


@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50),
                  min_size=1, max_size=60),
    width=st.integers(min_value=1, max_value=20),
    desc=st.booleans(),
)
@_SLOW
def test_blocked_row_number_model(spark, vals, width, desc):
    """Any value-derived block (here: floor-division buckets, negated
    for desc) must reproduce the exact global row_number over
    (value, key) — duplicates, negatives, and single-block inputs
    included."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    blk = (-F.col("v") if desc else F.col("v")) / width
    order = [F.desc("v") if desc else F.asc("v"), F.asc("k")]
    got = {
        (r["k"], r["rn"])
        for r in blocked_row_number(
            df.withColumn("_blk", blk.cast("long")), order
        ).select("k", "rn").collect()
    }
    ranked = sorted(rows, key=lambda t: (-t[1] if desc else t[1], t[0]))
    expect = {(key, i + 1) for i, (key, _v) in enumerate(ranked)}
    assert got == expect


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # doc token sets as
            st.integers(min_value=1, max_value=30),  # (seed, size) pairs
        ),
        min_size=2,
        max_size=5,
    ),
    probes=st.integers(min_value=1, max_value=10),
)
@_SLOW
def test_suffix_bound_dominates_on_synthetic_sets(spark, data, probes):
    """Hypothesis net for the suffix bound: on arbitrary synthetic
    token sets (deterministically derived from (seed, size)), for every
    candidate pair, filtering at ``bound >= k`` must keep every pair
    whose true overlap is >= k — the same dominance property as the
    fixture test, explored over adversarial set shapes (tiny sets,
    disjoint sets, near-identical sets, single-token sets)."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        _suffix_filter,
    )

    sets = [
        {f"t{(seed * 7 + j * 11) % 37:02d}" for j in range(size)}
        for seed, size in data
    ]
    rows = [(i, tok) for i, s in enumerate(sets) for tok in sorted(s)]
    dt = spark.createDataFrame(rows, "doc_id long, tok string")
    cand = spark.createDataFrame(
        [(a, b) for a in range(len(sets)) for b in range(len(sets)) if a < b],
        "doc_a long, doc_b long",
    )
    overlaps = {
        (a, b): len(sets[a] & sets[b])
        for a in range(len(sets))
        for b in range(len(sets))
        if a < b
    }
    for k in (1, 3, 9):
        kept = {
            tuple(r)
            for r in _suffix_filter(
                cand, dt,
                lambda bound, la, lb, k=k: bound >= F.lit(k),
                probes=probes,
            ).collect()
        }
        must = {p for p, ni in overlaps.items() if ni >= k}
        assert must <= kept, (k, sorted(must - kept)[:3])


# --- fixed-width source/sink --------------------------------------------------


def test_fixed_width_overflow_fails_loudly(spark, tmp_path):
    """A value wider than its declared field must fail the WRITE (silent
    truncation would shear the column grid for every later field)."""
    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_fixed_width,
    )

    df = spark.createDataFrame([(1, "way_too_long_for_field")], "k long, s string")
    import pytest as _pytest

    # raise_error surfaces as a PySpark-converted runtime exception
    with _pytest.raises(Exception, match="fixed-width overflow"):
        write_fixed_width(df, str(tmp_path / "fw"), [("k", 4, "bigint"), ("s", 8, "string")])


def test_fixed_width_roundtrip_types_and_pad(spark, tmp_path):
    from supplier_performance_data_pipeline_spark.sources.readers import (
        read_fixed_width,
    )
    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_fixed_width,
    )

    fields = [("k", 6, "bigint"), ("name", 10, "string"), ("x", 8, "double")]
    rows = [(7, "abc", 1.5), (42, "de f", -0.25)]
    df = spark.createDataFrame(rows, "k long, name string, x double")
    path = str(tmp_path / "fw")
    write_fixed_width(df, path, fields)
    back = read_fixed_width(spark, path, fields)
    assert {tuple(r) for r in back.collect()} == set(rows)
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "bigint", "string", "double",
    ]


def test_fixed_width_null_and_newline_fail_loudly(spark, tmp_path):
    """NULL (no fixed-width representation) and embedded line breaks
    (grid shear) must fail the write, not corrupt the file."""
    import pytest as _pytest

    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_fixed_width,
    )

    fields = [("k", 4, "bigint"), ("s", 8, "string")]
    with _pytest.raises(Exception, match="fixed-width NULL"):
        write_fixed_width(
            spark.createDataFrame([(1, None)], "k long, s string"),
            str(tmp_path / "fw1"), fields,
        )
    with _pytest.raises(Exception, match="fixed-width line break"):
        write_fixed_width(
            spark.createDataFrame([(1, "ab\ncd")], "k long, s string"),
            str(tmp_path / "fw2"), fields,
        )
