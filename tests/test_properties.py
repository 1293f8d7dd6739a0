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


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=900,
        ),
        min_size=1,
        max_size=5,
    )
)
@SLOW
def test_document_chunks_reconstruct_text(spark, texts):
    """Model: chunks at stride S with width C >= S cover the text, and
    dropping each chunk's leading overlap (C - S chars, except chunk 0)
    and concatenating in order reproduces the document exactly."""
    from supplier_performance_data_pipeline_spark.plans.queries_corpus import (
        _CHUNK_CHARS,
        _CHUNK_STRIDE,
        q_document_chunks,
    )

    rows = [(i, t, len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = q_document_chunks(spark, d).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(texts)))
    overlap = _CHUNK_CHARS - _CHUNK_STRIDE
    for i, text in enumerate(texts):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # Offsets are the stride grid; every char position is covered.
        assert [c["start_char"] for c in chunks] == [
            j * _CHUNK_STRIDE
            for j in range(len(chunks))
        ]
        rebuilt = ""
        for c in chunks:
            piece = text[c["start_char"]: c["start_char"] + _CHUNK_CHARS]
            assert c["chunk_chars"] == len(piece)
            rebuilt += piece if c["chunk_idx"] == 0 else piece[overlap:] \
                if len(piece) > overlap else ""
            # note: trailing chunks shorter than the overlap contribute
            # nothing new — their content is already covered.
        assert rebuilt == text


@given(
    vecs=st.lists(
        st.lists(
            # magnitude x sign: keeps components away from zero (a zero
            # vector has no cosine) without rejection filtering
            st.builds(
                lambda m, s: m * s,
                st.floats(min_value=0.125, max_value=1.0, width=32),
                st.sampled_from([1.0, -1.0]),
            ),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=8,
    )
)
@SLOW
def test_knn_join_matches_bruteforce_within_buckets(spark, vecs):
    """Model: restricted to its LSH bucket, each vector's neighbor list
    must be exactly the bucket's true cosine top-k (numpy reference),
    ranked by rounded similarity with id tie-break."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.similarity import (
        knn_join_topk,
        py_lsh_bucket,
    )

    k = 3
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {}
    for r in knn_join_topk(df, 4, k, n_planes=2).collect():
        got.setdefault(r["vec_a"], []).append((r["rank"], r["vec_b"]))
    # numpy model over float32-cast inputs (the operator reads float32)
    arr = np.array(vecs, dtype=np.float32).astype(np.float64)
    buckets = [py_lsh_bucket(list(v), 4, n_planes=2) for v in arr]
    for i in range(len(vecs)):
        cands = [
            j for j in range(len(vecs))
            if j != i and buckets[j] == buckets[i]
        ]
        sims = sorted(
            (
                (
                    -round(
                        float(arr[i] @ arr[j])
                        / (np.linalg.norm(arr[i]) * np.linalg.norm(arr[j])),
                        6,
                    ),
                    j,
                )
                for j in cands
            ),
        )[:k]
        want = [j for _, j in sims]
        have = [j for _, j in sorted(got.get(i, []))]
        assert have == want


# --- PageRank: mass conservation + reference parity -------------------------

pr_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=12,
)


@given(und=pr_edges)
@SLOW
def test_pagerank_conserves_mass_on_symmetric_graphs(spark, und):
    """With no dangling nodes (symmetric edges), total PageRank mass is
    conserved at 1 up to the per-round rounding slack — a wrong degree,
    a dropped node, or a double-counted edge all break this."""
    from supplier_performance_data_pipeline_spark.operators.graph import (
        PR_ITERS,
        pagerank,
    )

    edges = sorted({(u, v) for u, v in und} | {(v, u) for u, v in und})
    df = spark.createDataFrame(edges, "u long, v long")
    ranks = pagerank(df).collect()
    n = len({x for e in edges for x in e})
    assert len(ranks) == n
    total = sum(r.r for r in ranks)
    # per round: n ranks rounded at 1e-9 + n contributions at 1e-12
    slack = PR_ITERS * n * (1e-9 + 1e-12) + 1e-9
    assert abs(total - 1.0) <= slack, (total, slack)


# --- byte entropy: bounds + degenerate payloads -----------------------------

payloads = st.lists(
    st.binary(min_size=0, max_size=64), min_size=1, max_size=6
)


@given(ps=payloads)
@SLOW
def test_byte_entropy_bounds(spark, ps):
    """0 <= H <= ln(256); H == 0 iff the payload uses a single distinct
    byte (or is empty)."""
    import math

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        byte_entropy,
    )

    media = spark.createDataFrame(
        [(i, p, "application/octet-stream", None, None)
         for i, p in enumerate(ps)],
        "media_id long, payload binary, mime string, width int, height int",
    )
    rows = {r.media_id: r for r in byte_entropy(media).collect()}
    for i, p in enumerate(ps):
        r = rows[i]
        assert r.n_bytes == len(p)
        assert -1e-9 <= r.entropy <= math.log(256) + 1e-6
        if len(set(p)) <= 1:
            assert r.entropy == 0.0
        else:
            assert r.entropy > 0.0


def test_mg_candidates_never_miss_heavy_hitters(spark):
    """Misra-Gries superset guarantee under adversarial partitioning:
    any item with global frequency > n/(k+1) appears in the candidate
    union, for every repartitioning of a skewed synthetic stream."""
    from supplier_performance_data_pipeline_spark.operators.sketch import (
        mg_candidate_items,
    )

    # 57% 'a', 29% 'b', rest singleton-ish noise; n = 420.
    rows = (
        [("a",)] * 240
        + [("b",)] * 120
        + [(f"z{i}",) for i in range(60)]
    )
    df = spark.createDataFrame(rows, "v string")
    n = len(rows)
    k = 3
    exact = {}
    for (v,) in rows:
        exact[v] = exact.get(v, 0) + 1
    true_heavy = {v for v, c in exact.items() if c * (k + 1) > n}
    assert true_heavy == {"a", "b"}  # the test is non-vacuous
    for parts in (1, 3, 7, 32):
        cands = {
            r["item"]
            for r in mg_candidate_items(
                df.repartition(parts), "v", k
            ).collect()
        }
        assert true_heavy <= cands, (parts, sorted(cands))
        # and the summary stays small: at most k keys per partition
        assert len(cands) <= k * parts


def test_mg_candidates_keep_source_column_type(spark):
    """The candidate column carries the SOURCE type (here bigint), so
    joins back against the typed column match instead of silently
    stringifying."""
    from supplier_performance_data_pipeline_spark.operators.sketch import (
        mg_candidate_items,
    )

    rows = [(7,)] * 50 + [(i,) for i in range(100, 110)]
    df = spark.createDataFrame(rows, "user_id long")
    cands = mg_candidate_items(df, "user_id", 2)
    assert dict(cands.dtypes)["item"] == "bigint"
    items = {r["item"] for r in cands.collect()}
    assert 7 in items  # 50/60 > n/3: the heavy user survives


@given(
    lts=st.lists(
        st.integers(min_value=0, max_value=100), min_size=1, max_size=10
    ),
    rts=st.lists(
        st.integers(min_value=0, max_value=100), max_size=10, unique=True
    ),
)
@SLOW
def test_asof_forward_matches_pandas_merge_asof(spark, lts, rts):
    """Forward as-of must agree with pandas merge_asof(direction=
    'forward') — an independent reference implementation — on random
    timestamp sets including equal-ts collisions and no-match tails."""
    import pandas as pd

    from supplier_performance_data_pipeline_spark.operators.asof import (
        asof_join,
    )

    base = pd.Timestamp("2024-01-01")
    left = spark.createDataFrame(
        [(1, (base + pd.Timedelta(seconds=t)).to_pydatetime(), i)
         for i, t in enumerate(lts)],
        "k int, ts timestamp, row_id int",
    )
    right = spark.createDataFrame(
        [(1, (base + pd.Timedelta(seconds=t)).to_pydatetime(), float(t))
         for t in rts],
        "k int, ts timestamp, value double",
    ) if rts else spark.createDataFrame([], "k int, ts timestamp, value double")
    got = {
        r["row_id"]: r["next_value"]
        for r in asof_join(
            left, right, on="k", ts_col="ts", value_cols=["value"],
            prefix="next_", direction="forward",
        ).collect()
    }
    lpd = pd.DataFrame(
        {"ts": [base + pd.Timedelta(seconds=t) for t in lts],
         "row_id": range(len(lts))}
    ).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(
        {"ts": pd.to_datetime(
            [base + pd.Timedelta(seconds=t) for t in sorted(rts)]
        ),
         "value": [float(t) for t in sorted(rts)]}
    )
    exp = pd.merge_asof(lpd, rpd, on="ts", direction="forward")
    for _, row in exp.iterrows():
        want = None if pd.isna(row["value"]) else row["value"]
        assert got[row["row_id"]] == want


snap_vals = st.one_of(st.none(), st.text(max_size=4), st.just("\x1f"))


@given(
    old=st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.tuples(snap_vals, snap_vals),
        max_size=8,
    ),
    new=st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.tuples(snap_vals, snap_vals),
        max_size=8,
    ),
)
@SLOW
def test_snapshot_diff_matches_dict_diff(spark, old, new):
    """snapshot_diff must agree with a dict-based reference diff on
    random snapshots including NULLs, empty strings, and separator
    characters inside values."""
    from supplier_performance_data_pipeline_spark.operators.merge import (
        snapshot_diff,
    )

    schema = "k long, a string, b string"

    def df(d):
        rows = [(k, v[0], v[1]) for k, v in d.items()]
        return (
            spark.createDataFrame(rows, schema)
            if rows
            else spark.createDataFrame([], schema)
        )

    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(df(old), df(new), ["k"]).collect()
    }
    expect = {}
    for k in set(old) | set(new):
        if k not in old:
            expect[k] = "added"
        elif k not in new:
            expect[k] = "removed"
        elif old[k] != new[k]:
            expect[k] = "changed"
        else:
            expect[k] = "unchanged"
    assert got == expect


# --- round-5 operators -------------------------------------------------------

_throttle_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user
        st.integers(min_value=0, max_value=400),  # seconds offset
    ),
    max_size=14,
)


@given(evs=_throttle_events, quiet=st.integers(min_value=1, max_value=120))
@SLOW
def test_batch_throttle_complete_characterization(spark, evs, quiet):
    """Two-way spec: (a) consecutive KEPT events per key are strictly
    more than ``quiet`` apart; (b) every DROPPED event is within
    ``quiet`` of the latest kept event at or before it. Together these
    uniquely determine the kept set, so the test is a full functional
    characterization, not a smoke check."""
    import datetime as dt

    from supplier_performance_data_pipeline_spark.streaming.stateful import (
        batch_throttle,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, i, base + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )
    kept = {
        r.event_id for r in batch_throttle(df, quiet).collect()
    }
    by_user: dict[int, list[tuple[int, int]]] = {}
    for u, i, ts in rows:
        by_user.setdefault(u, []).append(
            (int(ts.timestamp() * 1_000_000), i)
        )
    for seq in by_user.values():
        seq.sort()
        last = None
        for us, i in seq:
            if last is None or us > last + quiet * 1_000_000:
                assert i in kept, (i, quiet)
                last = us
            else:
                assert i not in kept, (i, quiet)


_mix_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # doc_id
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=1, max_value=500),  # size
    ),
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(rows=_mix_rows, frac=st.sampled_from([0.25, 0.5, 1.0]))
@SLOW
def test_mixture_resample_matches_python_model(spark, rows, frac):
    """The kept set equals the Python re-derivation of thresholds +
    md5 membership (same op chain), and is always a subset of the
    input — resampling never upsamples."""
    import hashlib

    from supplier_performance_data_pipeline_spark.operators.sampling import (
        GRAIN,
        mixture_resample,
    )

    if not rows:
        return
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    got = {
        r.doc_id for r in mixture_resample(df, "source", "n_chars", frac).collect()
    }
    totals: dict[str, int] = {}
    for _, src, n in rows:
        totals[src] = totals.get(src, 0) + n
    tot = sum(totals.values())
    ns = len(totals)
    thr = {
        src: int(
            __import__("math").floor(
                min(1.0, float(tot) * frac / ns / float(sz)) * GRAIN + 0.5
            )
        )
        for src, sz in totals.items()
    }

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(f"42|{doc_id}".encode()).hexdigest()[:14]
        return int(h, 16) % GRAIN

    want = {d for d, src, _ in rows if bucket(d) < thr[src]}
    assert got == want
    assert got <= {d for d, _, _ in rows}


@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300),
            st.integers(min_value=0, max_value=300),
        ),
        min_size=1,
        max_size=8,
    ),
    bucket=st.sampled_from([7, 60, 100]),
)
@SLOW
def test_interval_overlap_randomized_vs_brute(spark, ivs, bucket):
    """Randomized intervals (including empty and reversed ones, which
    must match nothing) against the nested-loop reference."""
    import datetime as dt
    import itertools

    from supplier_performance_data_pipeline_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    base = dt.datetime(2024, 1, 1)

    def ts(sec):
        return base + dt.timedelta(seconds=sec)

    left = [(i, ts(a), ts(b)) for i, (a, b) in enumerate(ivs)]
    right = [
        (i, ts(a), ts(b)) for i, (a, b) in enumerate(reversed(ivs))
    ]
    ldf = spark.createDataFrame(left, "lid int, ls timestamp, le timestamp")
    rdf = spark.createDataFrame(right, "rid int, rs timestamp, re timestamp")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf, "ls", "le", "rs", "re", bucket
        ).collect()
    )
    want = sorted(
        (li, ri)
        for (li, ls, le), (ri, rs, re) in itertools.product(left, right)
        if ls < le and rs < re and ls < re and rs < le
    )
    assert got == want
