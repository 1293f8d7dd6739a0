"""Exact-collapse-first component equivalence (operators/dedup.py::
near_dup_component_edges / doc_components).

The claim being pinned: for any corpus and any min_match >= 1, the
connected components (vertex set included) of the collapse-first edge
graph are EXACTLY those of near_dup_pairs(docs) filtered to
n_matching_components >= min_match. The fixtures are chosen
adversarially for the equivalence argument's edge cases: exact-dup
groups larger than 2 (the clique the member->rep star must replace),
cross-group near-dup links (rep-pair transitivity), NULL texts (must
stay isolated — all-NULL signatures bucket together but verify to 0),
empty-string texts (a legitimate exact-dup group), and a corpus whose
duplicates dominate (the 100 TB hazard the collapse exists for).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.dedup import (
    doc_components,
    near_dup_pairs,
)
from supplier_performance_data_pipeline_spark.operators.graph import (
    connected_components,
)
from tests.conftest import SF_SMOKE


def _components_reference(spark, docs, min_match):
    pairs = (
        near_dup_pairs(docs)
        .filter(F.col("n_matching_components") >= min_match)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    return connected_components(pairs)


def _assert_equal(a, b):
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_collapse_equivalence_adversarial_corpus(spark):
    """Dup groups of size 3 and 4, a near-dup bridge between two
    groups, NULL texts, an empty-string pair, and unique filler."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    rows = (
        [(i, base) for i in range(4)]           # exact group of 4
        + [(10 + i, near) for i in range(3)]    # exact group of 3,
        # near-dup of the first group (3-token shingles mostly shared)
        + [(20, None), (21, None)]              # NULLs: must stay apart
        + [(30, ""), (31, "")]                  # empty-string group
        + [(40, "completely different words here nothing shared at all"),
           (41, "another unique document with its own token stream ok")]
    )
    docs = _mk(spark, rows)
    for mm in (1, 4, 8):
        got = doc_components(docs, min_match=mm)
        ref = _components_reference(spark, docs, mm)
        _assert_equal(got, ref)


def test_collapse_equivalence_duplicate_dominated(spark):
    """The hazard shape: one text repeated 60x (collapse makes this 59
    member edges instead of 1,770 bucket pairs) plus a mutated copy."""
    hot = "boilerplate nav header footer copyright contact about terms"
    mut = "boilerplate nav header footer copyright contact about privacy"
    rows = (
        [(i, hot) for i in range(60)]
        + [(100, mut)]
        # fillers with NO shared shingles (every token carries i): a
        # shared 3-token prefix would legitimately cluster them and
        # muddy the assertion below
        + [(200 + i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f")
           for i in range(10)]
    )
    docs = _mk(spark, rows)
    got = doc_components(docs, min_match=4)
    ref = _components_reference(spark, docs, 4)
    _assert_equal(got, ref)
    # and the hot clique + its mutation really is ONE cluster
    n = got.select("component").distinct().count()
    assert got.count() == 61 and n == 1


def test_collapse_equivalence_on_fixture(spark):
    """The real sf0.001 documents table at the registered CC_MIN_MATCH:
    the path the cluster-keyed queries would take."""
    import os

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    got = doc_components(docs, min_match=4)
    ref = _components_reference(spark, docs, 4)
    _assert_equal(got, ref)


def test_collapse_knob_off_matches_reference(spark):
    docs = _mk(
        spark,
        [(0, "a b c d e f g h"), (1, "a b c d e f g h"), (2, "x y z w")],
    )
    got = doc_components(docs, min_match=1, collapse_exact=False)
    ref = _components_reference(spark, docs, 1)
    _assert_equal(got, ref)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny vocab + short docs: random corpora land on every edge of the
# equivalence argument (exact-dup groups, high-Jaccard cross-group
# pairs through shared shingles, singletons) with realistic frequency.
_doc_text = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
    min_size=3,
    max_size=7,
).map(" ".join)


@given(
    texts=st.lists(_doc_text, min_size=2, max_size=12),
    dup_mask=st.lists(st.integers(min_value=0, max_value=11), max_size=6),
    mm=st.sampled_from([1, 4, 8]),
)
@_SLOW
def test_collapse_equivalence_random_corpora(spark, texts, dup_mask, mm):
    """Randomized model check: components of the collapse-first graph
    equal the direct pair graph's on corpora hypothesis invents —
    duplicates injected by re-appending randomly chosen existing texts."""
    all_texts = list(texts) + [texts[i % len(texts)] for i in dup_mask]
    docs = _mk(spark, list(enumerate(all_texts)))
    got = doc_components(docs, min_match=mm)
    ref = _components_reference(spark, docs, mm)
    _assert_equal(got, ref)


def test_min_match_zero_rejected(spark):
    docs = _mk(spark, [(0, "a b c")])
    try:
        doc_components(docs, min_match=0)
    except AssertionError as e:
        assert "min_match" in str(e)
    else:  # pragma: no cover
        raise AssertionError("min_match=0 must be rejected")


def test_min_match_above_k_rejected(spark):
    """min_match > k breaks the collapse equivalence the other way: an
    exact-dup clique verifies at exactly k matching components in the
    direct pair graph, so the reference drops those pairs while the
    unconditional member->representative star edges would still
    cluster the group — the guard must catch it, not silently diverge."""
    docs = _mk(spark, [(0, "a b c"), (1, "a b c")])
    try:
        doc_components(docs, min_match=9)  # k defaults to MINHASH_K == 8
    except AssertionError as e:
        assert "min_match" in str(e)
    else:  # pragma: no cover
        raise AssertionError("min_match > k must be rejected")
