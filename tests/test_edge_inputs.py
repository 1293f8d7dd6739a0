"""Empty/degenerate-input behavior of the round-2 operators: an empty
source must flow through to an empty (not crashing, not NULL-filled)
result, because at 100 TB a filter that matches nothing is routine."""

from __future__ import annotations

from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.curation import (
    contamination_report,
    eval_ngram_set,
)
from supplier_performance_data_pipeline_spark.operators.merge import upsert
from supplier_performance_data_pipeline_spark.operators.windows import (
    resample_ffill,
)


def test_resample_ffill_empty_input(spark):
    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, value double"
    )
    assert resample_ffill(ev, "user_id", "ts", "value").count() == 0


def test_resample_ffill_single_row_is_gapless(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00", 5.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = resample_ffill(ev, "user_id", "ts", "value").collect()
    assert len(rows) == 1
    assert rows[0]["is_gap"] == 0 and rows[0]["filled_value"] == 5.0


def test_resample_ffill_non_default_step(spark):
    """Observation bucketing must follow the step, not a hardcoded
    hour: with a 15-minute step, values at :05 / :20 / :50 land in the
    :00 / :15 / :45 grid buckets and the :30 bucket gap-fills."""
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", 1.0),
            (1, "2024-01-01 10:20:00", 2.0),
            (1, "2024-01-01 10:50:00", 4.0),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {
        r["bucket"].strftime("%H:%M"): (r["filled_value"], r["is_gap"])
        for r in resample_ffill(
            ev, "user_id", "ts", "value", step="15 minutes"
        ).collect()
    }
    assert rows == {
        "10:00": (1.0, 0),
        "10:15": (2.0, 0),
        "10:30": (2.0, 1),
        "10:45": (4.0, 0),
    }


def test_resample_ffill_daily_step(spark):
    """'1 day' buckets align to UTC midnights and gap-fill missing days."""
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", 3.0),
            (1, "2024-01-03 23:59:59", 7.0),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {
        r["bucket"].strftime("%m-%d"): (r["filled_value"], r["is_gap"])
        for r in resample_ffill(
            ev, "user_id", "ts", "value", step="1 day"
        ).collect()
    }
    assert rows == {
        "01-01": (3.0, 0),
        "01-02": (3.0, 1),
        "01-03": (7.0, 0),
    }


def test_resample_ffill_rejects_calendar_steps(spark):
    import pytest

    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="unsupported resample step"):
        resample_ffill(ev, "user_id", "ts", "value", step="1 month")


def test_upsert_empty_updates_is_identity(spark):
    base = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    empty = spark.createDataFrame([], "k long, v long")
    got = {r["k"]: r["v"] for r in upsert(base, empty, ["k"]).collect()}
    assert got == {1: 10, 2: 20}


def test_contamination_empty_eval_set_reports_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    empty_eval = spark.createDataFrame([], "sh string")
    assert contamination_report(docs, empty_eval).count() == 0


def test_eval_ngram_set_empty_docs(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert eval_ngram_set(docs).count() == 0


def test_knn_join_empty_and_singleton(spark):
    """Empty input -> empty neighbor lists; a lone vector has no
    same-bucket neighbor and is absent (not a self-match: the join
    filters vec_a != vec_b)."""
    from supplier_performance_data_pipeline_spark.operators.similarity import (
        knn_join_topk,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert knn_join_topk(empty, 4, 3).count() == 0
    one = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert knn_join_topk(one, 4, 3).count() == 0


def test_knn_join_identical_vectors_rank_deterministically(spark):
    from supplier_performance_data_pipeline_spark.operators.similarity import (
        knn_join_topk,
    )

    vecs = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(4)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = knn_join_topk(df, 4, 2).collect()
    # All cosines tie at 1.0 -> rank order must fall back to vec_b asc.
    by_query = {}
    for r in rows:
        by_query.setdefault(r["vec_a"], []).append((r["rank"], r["vec_b"]))
    for qa, lst in by_query.items():
        expect = [v for v in range(4) if v != qa][:2]
        assert [vb for _, vb in sorted(lst)] == expect


def test_knn_join_zero_vector_excluded(spark):
    """A zero vector has no direction: it must neither receive a
    neighbor list nor appear in anyone else's. Unguarded, its cosine is
    0/0 = NaN, which Spark sorts ABOVE all real similarities — the
    degenerate vector would rank as everyone's top neighbor."""
    from supplier_performance_data_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
        knn_join_topk,
    )

    vecs = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [1.0, 2.0, 3.0, 4.1]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = knn_join_topk(df, 4, 3).collect()
    ids_seen = {r["vec_a"] for r in rows} | {r["vec_b"] for r in rows}
    assert 3 not in ids_seen
    # 1 and 2 still pair with each other (same bucket, near-identical).
    assert {r["vec_a"] for r in rows} == {1, 2}
    for r in rows:
        assert r["cosine_sim"] == r["cosine_sim"]  # no NaN survives
    pairs = embedding_near_dup_pairs(df, 4, threshold=0.0).collect()
    assert all(3 not in (p["vec_a"], p["vec_b"]) for p in pairs)
    assert {(p["vec_a"], p["vec_b"]) for p in pairs} == {(1, 2)}


def test_quantization_zero_vector(spark):
    """The all-zero embedding must quantize to zero codes with zero
    scale, not divide by zero."""
    from supplier_performance_data_pipeline_spark.operators.similarity import (
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    row = quantize_int8(df).collect()[0]
    assert row["scale_micro"] == 0
    assert list(row["codes"]) == [0, 0, 0]


def test_mixture_weights_plan_invariants(spark, tmp_path):
    """The sampling plan must be feasible and maximal: every acceptance
    rate in (0, 1], the binding source exactly 1, budgets never exceed
    availability, and target shares sum to 1."""
    import os

    from supplier_performance_data_pipeline_spark.plans.queries_corpus import (
        q_source_mixture_weights,
    )

    rows = []
    doc_id = 0
    for i, n_docs in enumerate([2, 5, 1, 8]):
        for _ in range(n_docs):
            text = " ".join(f"w{j}" for j in range(10 + 7 * i))
            rows.append((doc_id, text, "en", f"src{i}", len(text)))
            doc_id += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = q_source_mixture_weights(spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert all(0.0 < r["accept_rate"] <= 1.0 for r in out)
    assert any(abs(r["accept_rate"] - 1.0) < 1e-9 for r in out)
    assert all(r["budget_tokens"] <= r["n_tokens"] for r in out)
    assert abs(sum(r["target_share"] for r in out) - 1.0) < 1e-5


def test_pagerank_empty_edges(spark):
    from supplier_performance_data_pipeline_spark.operators.graph import (
        pagerank,
    )

    e = spark.createDataFrame([], "u long, v long")
    assert pagerank(e).count() == 0


def test_pagerank_two_node_cycle_is_uniform(spark):
    from supplier_performance_data_pipeline_spark.operators.graph import (
        pagerank,
    )

    e = spark.createDataFrame([(1, 2), (2, 1)], "u long, v long")
    rows = {r.s: r.r for r in pagerank(e).collect()}
    # Symmetric 2-cycle: the uniform vector is the fixed point.
    assert abs(rows[1] - 0.5) < 1e-9 and abs(rows[2] - 0.5) < 1e-9


def test_scd2_empty_update_batch_keeps_all_current(spark):
    from supplier_performance_data_pipeline_spark.operators.merge import (
        scd2_apply,
    )

    base = spark.createDataFrame(
        [(1, "a", "2024-01-01")], "k int, attr string, valid_from string"
    ).withColumn("valid_from", F.col("valid_from").cast("date"))
    upd = spark.createDataFrame(
        [], "k int, attr string, valid_from date"
    )
    rows = scd2_apply(base, upd, ["k"]).collect()
    assert len(rows) == 1
    assert rows[0].is_current and rows[0].valid_to is None


def test_correlation_constant_column_is_null(spark, tmp_path):
    """Zero variance in either variable must yield NULL correlation
    (NULLIF guard), never a divide-by-zero or NaN ranking artifact."""
    import os

    from supplier_performance_data_pipeline_spark.plans.queries_analytics import (
        q_discount_quantity_correlation,
    )

    li = spark.createDataFrame(
        [
            (1, 0.05, 10.0), (1, 0.05, 20.0), (1, 0.05, 30.0),  # const disc
            (2, 0.01, 5.0), (2, 0.07, 9.0), (2, 0.04, 7.0),     # varying
        ],
        "l_partkey long, l_discount double, l_quantity double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#A"), (2, "Brand#B")], "p_partkey long, p_brand string"
    )
    li.write.mode("overwrite").parquet(os.path.join(tmp_path, "lineitem.parquet"))
    part.write.mode("overwrite").parquet(os.path.join(tmp_path, "part.parquet"))
    got = {
        r["p_brand"]: (r["corr_disc_qty"], r["covar_disc_qty"])
        for r in q_discount_quantity_correlation(spark, str(tmp_path)).collect()
    }
    assert got["Brand#A"][0] is None          # constant x -> undefined corr
    assert got["Brand#A"][1] == 0.0           # but covariance is exactly 0
    assert got["Brand#B"][0] == 1.0           # perfectly linear: disc ~ qty


def test_transition_matrix_single_event_users_empty(spark, tmp_path):
    """Users with one event produce no transitions; equal timestamps
    order by event_id so the sequence is deterministic."""
    import datetime as dt
    import os

    from supplier_performance_data_pipeline_spark.plans.queries_events import (
        q_events_type_transition_matrix,
    )

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, t, 10, "view", 0.0, "{}"),
            (2, t, 11, "view", 0.0, "{}"),   # same ts as event 3: id order
            (3, t, 11, "purchase", 0.0, "{}"),
            (4, t, 12, "error", 0.0, "{}"),  # singleton user: no pair
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.mode("overwrite").parquet(os.path.join(tmp_path, "events.parquet"))
    rows = q_events_type_transition_matrix(spark, str(tmp_path)).collect()
    got = {(r["from_type"], r["to_type"]): r["n_transitions"] for r in rows}
    assert got == {("view", "purchase"): 1}
    assert rows[0]["p_transition"] == 1.0


def test_hhi_single_supplier_nation_is_one(spark, tmp_path):
    """A nation with one supplier is maximally concentrated: HHI = 1."""
    import os

    from supplier_performance_data_pipeline_spark.plans.queries_analytics import (
        q_nation_supplier_hhi,
    )

    li = spark.createDataFrame(
        [(1, 100.0, 0.0), (1, 50.0, 0.0), (2, 30.0, 0.0), (3, 30.0, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    )
    sup = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 20)], "s_suppkey long, s_nationkey int"
    )
    nat = spark.createDataFrame(
        [(10, "SOLO"), (20, "DUO")], "n_nationkey int, n_name string"
    )
    import os as _os
    li.write.mode("overwrite").parquet(_os.path.join(tmp_path, "lineitem.parquet"))
    sup.write.mode("overwrite").parquet(_os.path.join(tmp_path, "supplier.parquet"))
    nat.write.mode("overwrite").parquet(_os.path.join(tmp_path, "nation.parquet"))
    got = {
        r["nation_name"]: (r["n_suppliers"], r["hhi"], r["total_revenue"])
        for r in q_nation_supplier_hhi(spark, str(tmp_path)).collect()
    }
    assert got["SOLO"] == (1, 1.0, 150.0)
    # Two equal suppliers: HHI = 2 * (1/2)^2 = 0.5.
    assert got["DUO"] == (2, 0.5, 60.0)


def test_hourly_rollup_avg_ignores_null_values(spark):
    """SQL AVG semantics: NULL values drop from the denominator (a
    bucket [10.0, NULL] averages 10.0, not 5.0) while n_events still
    counts every row."""
    import datetime as dt

    from supplier_performance_data_pipeline_spark.operators.windows import (
        hourly_rollup,
    )

    t = dt.datetime(2024, 1, 1, 12, 30, 0)
    ev = spark.createDataFrame(
        [(t, "view", 10.0), (t, "view", None)],
        "ts timestamp, event_type string, value double",
    )
    row = hourly_rollup(ev).collect()[0]
    assert row["n_events"] == 2
    assert row["sum_value"] == 10.0
    assert row["avg_value"] == 10.0


def test_decode_rgb_null_width_raises_cleanly(spark):
    """A NULL width in an Arrow batch coerces the int column to float64
    (valid rows become e.g. 2.0, NULLs become NaN) — the decoder must
    reject NaN dimensions with the clean ValueError and still decode
    the valid rows in the same batch."""
    import numpy as np
    import pytest as _pytest

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        RAW_RGB_MIME,
        decode_rgb,
    )

    px = np.full((2, 2, 3), 7, dtype=np.uint8)
    arr = decode_rgb(px.tobytes(), RAW_RGB_MIME, 2.0, 2.0)  # float dims OK
    assert arr.shape == (2, 2, 3)
    with _pytest.raises(ValueError, match="width/height"):
        decode_rgb(px.tobytes(), RAW_RGB_MIME, float("nan"), 2.0)
    with _pytest.raises(ValueError, match="width/height"):
        decode_rgb(px.tobytes(), RAW_RGB_MIME, None, None)


def test_zorder_writer_constant_column(spark, tmp_path):
    """A constant clustering key (span 1) must not divide by zero or
    scatter rows: every row buckets to 0 on that dimension and the
    layout degrades to a 1-d sort on the other key."""
    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_parquet_zorder_layout,
    )

    df = spark.range(100).select(
        F.lit(7).alias("a"), F.col("id").alias("b")
    )
    path = str(tmp_path / "zconst")
    write_parquet_zorder_layout(df, path, "a", "b", 2)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.agg(F.count_distinct("a")).first()[0] == 1
    assert back.agg(F.sum("b")).first()[0] == 99 * 100 // 2


def test_wav_empty_payload_raises(spark):
    """An empty/garbage payload is a corrupt container, not silence —
    the decoder refuses rather than returning zero samples."""
    import pytest

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        decode_pcm,
    )

    with pytest.raises(ValueError, match="RIFF"):
        decode_pcm(b"")
    with pytest.raises(ValueError, match="RIFF"):
        decode_pcm(b"RIFFxxxxJUNK")


def test_psi_emits_all_buckets_even_when_empty(spark, tmp_path):
    """A bucket empty in BOTH halves still owes its Laplace-smoothed
    term: the output is densified to the full spine, never just the
    occupied buckets (bimodal data would otherwise underreport PSI)."""
    import datetime as _dt
    import os

    from supplier_performance_data_pipeline_spark.plans.registry import load_all

    rows = []
    base = _dt.datetime(2024, 1, 1)
    for i in range(20):  # values only at the extremes -> buckets 0 and 9;
        # late events pushed far out so the time MIDPOINT splits 15/5
        # (unequal halves -> empty buckets owe a nonzero smoothed term)
        rows.append(
            (i, base + _dt.timedelta(hours=i if i < 15 else 100 + i),
             i % 3, "view", 0.0 if i < 15 else 100.0, None)
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = str(tmp_path)
    ev.write.parquet(os.path.join(sf, "events.parquet"))
    out = load_all()["events_value_drift_psi"].build(spark, sf).collect()
    assert len(out) == 10
    occupied = {r["bucket"] for r in out if r["n_before"] + r["n_after"] > 0}
    assert occupied == {0, 9}
    # Halves differ in size (15 early vs 5 late), so even empty buckets
    # carry a nonzero smoothed term.
    empties = [r for r in out if r["n_before"] + r["n_after"] == 0]
    assert empties and all(r["psi_term"] != 0.0 for r in empties)


def test_lateness_two_level_prefix_matches_naive_running_max(spark, tmp_path):
    """The two-level parallel prefix must equal the naive single
    running max on genuinely out-of-order data — including late rows
    whose predecessor maximum lives MANY BLOCKS back (prev_max beats
    intra_max) and in-order stretches (intra_max wins)."""
    import datetime as _dt
    import os

    from supplier_performance_data_pipeline_spark.plans.registry import load_all

    base = _dt.datetime(2024, 1, 1)
    # A spike early (eid 10 jumps an hour ahead) makes a long stretch
    # late until time catches up; smaller jitter scatters in_order /
    # le_1m / le_10m cases across block boundaries; eid 3001 lands
    # 0.4s behind the running max — FRACTIONAL lateness on purpose
    # (0.5s late is le_1m, not in_order; a divide-then-truncate before
    # bucketing collapses it wrong).
    rows, run_max, lateness = [], 0.0, {}
    for eid in range(5000):
        if eid == 10:
            off = 10 * 30 + 3600.0
        elif eid == 3001:
            off = run_max - 0.4  # sub-second-late: the trap case
        else:
            off = eid * 30 - (eid % 7) * 45 + (eid % 3) * 0.5
        run_max = max(run_max, off)
        lateness[eid] = round((run_max - off) * 1_000_000)
        rows.append(
            (eid, base + _dt.timedelta(seconds=off), eid % 11, "view",
             1.0, None)
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = str(tmp_path)
    ev.write.parquet(os.path.join(sf, "events.parquet"))
    out = {
        r["lateness_bucket"]: (r["n_events"], r["max_lateness_s"])
        for r in load_all()["events_lateness_histogram"]
        .build(spark, sf)
        .collect()
    }

    def bucket(us):
        return ("in_order" if us == 0 else "le_1m" if us <= 60_000_000
                else "le_10m" if us <= 600_000_000
                else "le_1h" if us <= 3_600_000_000
                else "gt_1h")

    expect = {}
    for us in lateness.values():
        b = bucket(us)
        n, mx = expect.get(b, (0, 0))
        expect[b] = (n + 1, max(mx, us // 1_000_000))
    assert out == expect
    assert len(out) >= 3  # the fixture genuinely exercises several buckets
    # And sub-second lateness is genuinely present (the 0.5s jitter
    # produces late_us in (0, 1s) — the truncation-bug trap).
    assert any(0 < us < 1_000_000 for us in lateness.values())


def test_left_outer_equivalence_degenerate_inputs(spark, tmp_path):
    """One-sided and short-span event sets must yield the EMPTY closed
    region (0, 0, 0, TRUE) — least() skipping a NULL max would instead
    fabricate a cutoff the streaming watermark never reaches, and SUM
    over zero rows would leak NULL into the verdict columns."""
    import datetime as _dt
    import os

    from supplier_performance_data_pipeline_spark.plans.registry import load_all

    base = _dt.datetime(2024, 1, 1)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def run(rows, sub):
        d = str(tmp_path / sub)
        spark.createDataFrame(rows, schema).write.parquet(
            os.path.join(d, "events.parquet")
        )
        row = (
            load_all()["streaming_left_outer_equivalence"]
            .build(spark, d)
            .collect()[0]
        )
        return (
            row["n_rows"], row["n_unmatched"], row["n_mismatched"],
            row["streaming_equals_batch"],
        )

    # Purchases ancient, but ZERO error events: joint watermark never
    # advances -> closed region must be empty, not every purchase.
    one_sided = [
        (i, base + _dt.timedelta(seconds=i), 1, "purchase", 1.0, None)
        for i in range(5)
    ]
    assert run(one_sided, "onesided") == (0, 0, 0, True)

    # Both sides present but the span is < 2h10m: no purchase clears
    # the cutoff; empty aggregate must still read (0, 0, 0, TRUE).
    short = [
        (1, base, 1, "purchase", 1.0, None),
        (2, base + _dt.timedelta(minutes=5), 1, "error", 1.0, None),
    ]
    assert run(short, "short") == (0, 0, 0, True)


def test_mixture_resample_empty_and_single_source(spark):
    from supplier_performance_data_pipeline_spark.operators.sampling import (
        mixture_resample,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, source string, n_chars long"
    )
    assert mixture_resample(empty, "source", "n_chars", 0.5).count() == 0
    # single source at budget_frac=1.0: uniform share == its own total,
    # rate clamps to 1, everything kept
    one = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 20)], "doc_id long, source string, n_chars long"
    )
    assert mixture_resample(one, "source", "n_chars", 1.0).count() == 2


def test_sequence_pack_empty_and_all_zero_tokens(spark):
    from supplier_performance_data_pipeline_spark.operators.curation import (
        sequence_pack,
    )

    empty = spark.createDataFrame([], "doc_id long, n long")
    assert sequence_pack(empty, "doc_id", "n", 128).count() == 0
    zeros = spark.createDataFrame(
        [(1, 0), (2, 0)], "doc_id long, n long"
    )
    assert sequence_pack(zeros, "doc_id", "n", 128).count() == 0


def test_sequence_pack_rejects_string_ids(spark):
    import pytest as _pytest

    from supplier_performance_data_pipeline_spark.operators.curation import (
        sequence_pack,
    )

    df = spark.createDataFrame([("a", 5)], "doc_id string, n long")
    with _pytest.raises(TypeError, match="numeric id"):
        sequence_pack(df, "doc_id", "n", 128)


def test_interval_overlap_empty_sides(spark):
    from supplier_performance_data_pipeline_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    iv = "lid long, s timestamp, e timestamp"
    empty = spark.createDataFrame([], iv)
    some = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "rid long, rs string, re string",
    ).selectExpr(
        "rid", "CAST(rs AS TIMESTAMP) AS rs", "CAST(re AS TIMESTAMP) AS re"
    )
    assert (
        interval_overlap_join(empty, some, "s", "e", "rs", "re", 3600).count()
        == 0
    )


def test_debounce_single_event_per_key_always_kept(spark):
    from supplier_performance_data_pipeline_spark.operators.windows import (
        debounce,
    )

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10), (2, "2024-01-01 00:00:01", 11)],
        "user_id long, ts string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    assert debounce(ev, ["user_id"], "ts", 60, "event_id").count() == 2


def test_cm_sketch_empty_input_estimates_zero(spark):
    from supplier_performance_data_pipeline_spark.operators.sketch import (
        cm_cell_table,
        cm_estimates,
    )

    empty = spark.createDataFrame([], "k string")
    cells = cm_cell_table(empty, "k")
    assert cells.count() == 0
    items = spark.createDataFrame([("x",)], "k string")
    est = cm_estimates(cells, items, "k").collect()
    assert est[0]["est"] == 0  # absent cells count 0, not NULL
