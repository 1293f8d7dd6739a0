"""Property-based checks (hypothesis) for operators whose edge cases a
fixed fixture can miss: NULL/duplicate keys in the orphan counter,
degenerate ranges in normalization, empty/short documents in the
shingle pipeline.

Examples are kept small and few — each one builds real DataFrames — but
hypothesis explores the corner regions (empty lists, all-NULL keys,
single-value ranges) far better than hand-picked rows.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from supplier_performance_data_pipeline_spark.functions.scalar import (
    minmax_normalize,
)
from supplier_performance_data_pipeline_spark.operators.dedup import (
    SHINGLE_N,
    shingle_sets,
)
from supplier_performance_data_pipeline_spark.operators.quality import (
    orphan_counts_df,
)

keys = st.lists(
    st.one_of(st.integers(min_value=0, max_value=5), st.none()), max_size=8
)

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(left=keys, right=keys)
@SLOW
def test_orphan_counts_match_bruteforce(spark, left, right):
    """Model: a left row is an orphan iff its key is NULL or absent from
    the right side (NULL never equi-matches) — LEFT JOIN ... IS NULL
    semantics, the reference's integrity check."""
    schema = T.StructType([T.StructField("k", T.IntegerType(), True)])
    ldf = spark.createDataFrame([(v,) for v in left], schema)
    rdf = spark.createDataFrame([(v,) for v in right], schema)
    got = orphan_counts_df(ldf, rdf, "k", "k", "lo", "ro").collect()[0]
    rset = {v for v in right if v is not None}
    lset = {v for v in left if v is not None}
    want_lo = sum(1 for v in left if v is None or v not in rset)
    want_ro = sum(1 for v in right if v is None or v not in lset)
    assert (got.lo, got.ro) == (want_lo, want_ro)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=6,
    ),
    invert=st.booleans(),
)
@SLOW
def test_minmax_normalize_bounded(spark, vals, invert):
    """Normalized values stay in [0, 1]; a degenerate (max == min) range
    maps every row to exactly 1.0 (the reference's CASE guard)."""
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    lo, hi = min(vals), max(vals)
    out = df.select(
        minmax_normalize(
            F.col("x"), F.lit(lo), F.lit(hi), invert=invert
        ).alias("n")
    ).collect()
    for row in out:
        assert 0.0 <= row.n <= 1.0
    if lo == hi:
        assert all(row.n == 1.0 for row in out)


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), max_size=6
    )
)
@SLOW
def test_shingles_never_empty_and_sized(spark, words):
    """Every doc yields >= 1 shingle (short docs fall back to the whole
    document); long docs yield exactly n_tokens - N + 1 shingles."""
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    sh = shingle_sets(df).collect()[0]["shingles"]
    n_tok = len([w for w in words if w])
    assert len(sh) >= 1
    if n_tok >= SHINGLE_N:
        assert len(sh) == n_tok - SHINGLE_N + 1


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=16,
)


@given(edges=edges_strategy)
@SLOW
def test_connected_components_match_union_find(spark, edges):
    """Model: classic union-find over the same edges; every vertex's
    component must be the minimum id reachable from it, regardless of
    edge order, duplicates, or chain shapes."""
    from supplier_performance_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in parent}

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == expected


base_rows = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=99),
    max_size=8,
)


@given(base=base_rows, updates=base_rows)
@SLOW
def test_upsert_matches_dict_merge(spark, base, updates):
    """Model: dict(base) | dict(updates) — updates win on key collision,
    inserts land, untouched base rows carry over."""
    from supplier_performance_data_pipeline_spark.operators.merge import (
        upsert,
    )

    schema = "k long, v long"
    bdf = spark.createDataFrame(list(base.items()) or [], schema)
    udf_ = spark.createDataFrame(list(updates.items()) or [], schema)
    got = {r["k"]: r["v"] for r in upsert(bdf, udf_, ["k"]).collect()}
    assert got == {**base, **updates}
