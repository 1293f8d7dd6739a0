"""Scale-parameterization of the dedup/similarity knobs.

The 100 TB story for MinHash-LSH and hyperplane-LSH is "grow the knob
with log(N)" (operators/dedup.py and operators/similarity.py module
docstrings). These tests exercise the non-default sizes (k=16 signature,
16 bands, 16 hyperplanes) and pin the containment laws that make the
parameterization trustworthy:

- minhash component j is the same hash-family member for every k, so a
  k=16 signature extends the k=8 signature;
- banding with fewer rows per band is strictly more permissive, so
  r=2 candidate pairs are a subset of r=1 candidate pairs;
- a 16-plane LSH bucket refines the 8-plane bucket, so 16-plane
  near-dup pairs are a subset of 8-plane pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
)
from supplier_performance_data_pipeline_spark.operators.similarity import (
    embedding_near_dup_pairs,
)
from tests.conftest import SF_SMOKE

DOCS = f"{SF_SMOKE}/documents.parquet"
EMB = f"{SF_SMOKE}/embeddings.parquet"


def _pairs_set(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}


def test_minhash_k16_extends_k8(spark):
    docs = spark.read.parquet(DOCS).limit(100)
    s8 = minhash_signatures(docs, k=8).toPandas().set_index("doc_id")
    s16 = minhash_signatures(docs, k=16).toPandas().set_index("doc_id")
    assert list(s16.columns) == [f"mh{j}" for j in range(16)]
    for j in range(8):
        assert (s8[f"mh{j}"] == s16.loc[s8.index, f"mh{j}"]).all()


def test_verified_pairs_between_matches_joinback(spark):
    """The inline-verify incremental shape must emit exactly the
    join-back formulation's rows: lsh_candidate_pairs_between then a
    k-component score join, on a real probe/index split."""
    from pyspark.sql import functions as F

    from supplier_performance_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs_between,
        verified_pairs_between,
    )

    sigs = minhash_signatures(spark.read.parquet(DOCS)).localCheckpoint()
    probe = sigs.filter(F.col("doc_id") % 5 == 0)
    index = sigs.filter(F.col("doc_id") % 5 != 0)
    inline = verified_pairs_between(probe, index)
    cand = lsh_candidate_pairs_between(probe, index)
    a = probe.selectExpr(
        "doc_id AS doc_a", *[f"mh{j} AS a_mh{j}" for j in range(8)]
    )
    b = index.selectExpr(
        "doc_id AS doc_b", *[f"mh{j} AS b_mh{j}" for j in range(8)]
    )
    matches = " + ".join(f"if(a_mh{j} = b_mh{j}, 1, 0)" for j in range(8))
    ref = cand.join(a, "doc_a").join(b, "doc_b").selectExpr(
        "doc_a", "doc_b",
        f"cast(({matches}) AS int) AS n_matching_components",
    )
    assert inline.exceptAll(ref).isEmpty() and ref.exceptAll(inline).isEmpty()
    assert inline.count() > 0


def test_wider_bands_are_more_permissive(spark):
    docs = spark.read.parquet(DOCS).limit(200)
    sigs = minhash_signatures(docs, k=16).persist()
    try:
        r2 = _pairs_set(
            lsh_candidate_pairs(sigs, k=16, bands=8)
            .withColumnRenamed("doc_a", "doc_a")
        )
        r1 = _pairs_set(lsh_candidate_pairs(sigs, k=16, bands=16))
        assert r2 <= r1  # agreeing on a 2-row band implies each row agrees
    finally:
        sigs.unpersist()


def test_near_dup_pairs_k16_bands16(spark):
    docs = spark.read.parquet(DOCS).limit(200)
    out = near_dup_pairs(docs, k=16, bands=16).toPandas()
    assert set(out.columns) == {
        "doc_a",
        "doc_b",
        "n_matching_components",
        "jaccard_est",
    }
    assert (out["n_matching_components"] >= 1).all()  # shared band ⇒ ≥1 match
    assert (out["n_matching_components"] <= 16).all()
    # The double ratio is exactly n/k — the integer is the verified
    # surface, the ratio a derived convenience.
    assert (out["jaccard_est"] == (out["n_matching_components"] / 16).round(6)).all()


def test_bands_must_divide_k(spark):
    docs = spark.read.parquet(DOCS).limit(10)
    with pytest.raises(AssertionError):
        near_dup_pairs(docs, k=8, bands=3).collect()


def test_embedding_near_dup_16_planes_refines_8(spark):
    emb = spark.read.parquet(EMB).limit(300)
    lo = embedding_near_dup_pairs(emb, 64, 0.0, n_planes=8)
    hi = embedding_near_dup_pairs(emb, 64, 0.0, n_planes=16)
    lo_set = {
        (r["vec_a"], r["vec_b"]) for r in lo.select("vec_a", "vec_b").collect()
    }
    hi_set = {
        (r["vec_a"], r["vec_b"]) for r in hi.select("vec_a", "vec_b").collect()
    }
    assert hi_set <= lo_set  # same 16-plane bucket ⇒ same first-8-plane bucket
    # 2^16 buckets over ≤300 vectors: collisions should be strictly rarer.
    assert len(hi_set) <= len(lo_set)


def test_embedding_near_dup_bucket_is_genuine_filter(spark):
    """More planes must not invent pairs: every surviving pair shares a
    bucket under the exact same projection arithmetic the oracle uses."""
    emb = spark.read.parquet(EMB).limit(100)
    out = embedding_near_dup_pairs(emb, 64, -1.0, n_planes=16)
    n_pairs = out.count()
    n = emb.count()
    assert n_pairs < n * (n - 1) / 2  # strictly fewer than all-pairs


def test_ivf_probe_guard():
    """The IVF probe collect is bounded: probe counts past the hard cap
    fail loudly instead of materializing driver-side."""
    from supplier_performance_data_pipeline_spark.plans.queries_sim import (
        MAX_PROBE_LABELS,
        _ivf_probe_labels,
    )

    with pytest.raises(ValueError, match="MAX_PROBE_LABELS"):
        _ivf_probe_labels(None, None, MAX_PROBE_LABELS + 1)


def test_knn_banded_one_band_degenerates_to_single_bucket(spark):
    """banded_buckets_expr indexes hyperplanes globally, so band 0 of
    the banded scheme IS lsh_bucket_expr's bucketing — n_bands=1 must
    reproduce knn_join_topk exactly (same candidates, same ranks)."""
    from supplier_performance_data_pipeline_spark.operators.similarity import (
        knn_join_topk,
        knn_join_topk_banded,
    )

    emb = spark.read.parquet(EMB)
    single = knn_join_topk(emb, 64, 3, n_planes=4)
    banded = knn_join_topk_banded(emb, 64, 3, n_bands=1, planes_per_band=4)
    a = {tuple(r) for r in single.collect()}
    b = {tuple(r) for r in banded.collect()}
    assert a == b


def test_knn_banded_coverage_and_recall_monotone(spark):
    """Each extra band re-rolls every vector's bucket: covered queries
    and candidate pairs grow monotonically, and the single-bucket
    neighbor pairs that survive ranking at the SAME k stay a subset in
    coverage terms (every query covered by 1 band is covered by 2)."""
    from supplier_performance_data_pipeline_spark.operators.similarity import (
        knn_join_topk_banded,
    )

    emb = spark.read.parquet(EMB)
    one = knn_join_topk_banded(emb, 64, 3, n_bands=1, planes_per_band=4)
    two = knn_join_topk_banded(emb, 64, 3, n_bands=2, planes_per_band=4)
    q1 = {r["vec_a"] for r in one.select("vec_a").distinct().collect()}
    q2 = {r["vec_a"] for r in two.select("vec_a").distinct().collect()}
    assert q1 <= q2  # band-OR can only ADD covered queries
    assert one.count() <= two.count()


def test_knn_recall_banded_dominates_single(spark):
    """The registered recall query's invariant: overlap with exact
    ground truth is at least as high for band-OR as for single-bucket
    (band 0 is the single-bucket scheme, so banded candidates are a
    superset per query; ranking at the same k can only improve or
    match the exact-overlap count when candidates grow toward the
    true top-k)."""
    from supplier_performance_data_pipeline_spark.plans.registry import (
        load_all,
    )

    row = (
        load_all()["knn_join_recall"].build(spark, SF_SMOKE).collect()[0]
    )
    assert row["n_exact_pairs"] > 0
    assert row["n_overlap_banded"] >= row["n_overlap_single"]
    assert row["n_overlap_banded"] <= row["n_exact_pairs"]


# --- product quantization (banked for round-5 registration) ------------------


def _pq_fixture(spark, n=40, dim=8):
    # Two well-separated blobs per half-space so every subspace has
    # clear structure; deterministic values.
    rows = []
    for i in range(n):
        hot = 10.0 if i % 2 == 0 else -10.0
        vec = [hot + (i % 5) * 0.01] * (dim // 2) + [
            -hot + (i % 3) * 0.01
        ] * (dim // 2)
        rows.append((i, [float(v) for v in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_codes_shape_and_range(spark):
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        pq_encode,
    )

    emb = _pq_fixture(spark)
    out = pq_encode(emb, dim=8, m=4, k=4).collect()
    assert len(out) == 40
    for r in out:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 4 for c in r["codes"])
        assert r["distortion"] >= 0.0


def test_pq_deterministic_under_repartition(spark):
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        pq_encode,
    )

    emb = _pq_fixture(spark)
    a = {
        r["vec_id"]: (tuple(r["codes"]), r["distortion"])
        for r in pq_encode(emb, dim=8, m=2, k=3).collect()
    }
    b = {
        r["vec_id"]: (tuple(r["codes"]), r["distortion"])
        for r in pq_encode(emb.repartition(7), dim=8, m=2, k=3).collect()
    }
    assert a == b


def test_pq_more_centroids_never_increase_distortion(spark):
    # Regression PIN on this deterministic fixture, not a Lloyd's
    # theorem (post-iteration distortion is not monotone in k in
    # general): on these two well-separated blobs the larger codebook
    # lands at or below the smaller one's distortion.
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        pq_encode,
    )

    emb = _pq_fixture(spark)

    def total(k):
        return sum(
            r["distortion"] for r in pq_encode(emb, dim=8, m=2, k=k).collect()
        )

    assert total(8) <= total(2) + 1e-6


def test_pq_rejects_indivisible_dim(spark):
    import pytest

    from supplier_performance_data_pipeline_spark.operators.clustering import (
        pq_encode,
    )

    emb = _pq_fixture(spark)
    with pytest.raises(ValueError, match="divisible"):
        pq_encode(emb, dim=8, m=3, k=4)
