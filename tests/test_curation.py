"""Curation operators on adversarial fixtures (the registered queries
cover the clean synthetic corpus; these cover the dirty cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.curation import (
    ngram_repetition_metrics,
    packing_stats,
    pii_scrub,
    redact_pii,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pii_scrub_counts_and_redacts(spark):
    docs = _docs(
        spark,
        [
            (1, "contact me at alice.smith+x@example.co.uk today", "en"),
            (2, "server 192.168.001.1 then call 555-867-5309 now", "en"),
            (3, "no pii here at all", "en"),
            (4, "two mails a@b.io and c.d@e-f.org", "en"),
        ],
    )
    out = pii_scrub(docs).orderBy("doc_id").collect()
    assert [r["n_email"] for r in out] == [1, 0, 0, 2]
    assert [r["n_ipv4"] for r in out] == [0, 1, 0, 0]
    assert [r["n_phone"] for r in out] == [0, 1, 0, 0]

    red = docs.select("doc_id", redact_pii(F.col("text")).alias("t")).orderBy(
        "doc_id"
    ).collect()
    assert red[0]["t"] == "contact me at <EMAIL> today"
    assert red[1]["t"] == "server <IP> then call <PHONE> now"
    assert red[2]["t"] == "no pii here at all"
    assert red[3]["t"] == "two mails <EMAIL> and <EMAIL>"


def test_repetition_metrics_flag_degenerate_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam", "en"),  # one 2-gram, 5×
            (2, "the quick brown fox jumps high", "en"),  # all distinct
            (3, "ab cd ab cd ab cd", "en"),  # alternating pair
        ],
    )
    m = {
        r["doc_id"]: r
        for r in ngram_repetition_metrics(docs).collect()
    }
    # doc 1: 5 bigrams, all the same → top count 5, every one a dup.
    assert m[1]["n_ngrams"] == 5
    assert m[1]["n_distinct_ngrams"] == 1
    assert m[1]["top_ngram_count"] == 5
    assert m[1]["dup_ngram_count"] == 5
    # doc 2: clean text → no duplicated bigram at all.
    assert m[2]["n_ngrams"] == 5
    assert m[2]["dup_ngram_count"] == 0
    assert m[2]["top_ngram_count"] == 1
    # doc 3: "ab cd" ×3 and "cd ab" ×2 → 5 bigrams, 2 distinct, all dup.
    assert m[3]["n_ngrams"] == 5
    assert m[3]["n_distinct_ngrams"] == 2
    assert m[3]["top_ngram_count"] == 3
    assert m[3]["dup_ngram_count"] == 5

    # The Gopher-style gate these integers feed: top-2-gram share > 0.2
    # flags docs 1 and 3, keeps doc 2.
    flagged = {
        d for d, r in m.items() if r["top_ngram_count"] / r["n_ngrams"] > 0.2
    }
    assert flagged == {1, 3}


def test_packing_stats_budget_math(spark):
    # 3 en docs of 4 tokens → 12 tokens; budget 10 → 2 sequences, 8 pad.
    docs = _docs(
        spark,
        [
            (1, "a b c d", "en"),
            (2, "e f g h", "en"),
            (3, "i j k l", "en"),
            (4, "uno dos tres", "es"),
        ],
    )
    out = {
        r["lang"]: r for r in packing_stats(docs, budget=10).collect()
    }
    assert out["en"]["total_tokens"] == 12
    assert out["en"]["n_sequences"] == 2
    assert out["en"]["padding_tokens"] == 8
    assert out["es"]["n_sequences"] == 1
    assert out["es"]["padding_tokens"] == 7


def test_sequence_pack_matches_sequential_spec(spark):
    """The two-level parallel prefix must reproduce the sequential
    concat-and-chunk layout exactly, including multi-block inputs,
    budget-boundary docs, docs spanning many sequences, and dropped
    zero-token docs."""
    from supplier_performance_data_pipeline_spark.operators.curation import (
        sequence_pack,
    )

    rows = [(i, (i * 37) % 500) for i in range(50)]  # includes 0-token
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: (
            r["start_offset"], r["first_seq"], r["last_seq"],
            r["n_seqs_spanned"],
        )
        for r in sequence_pack(df, "doc_id", "n", 256, block=8).collect()
    }
    cum = 0
    expect = {}
    for i, n in rows:
        if n <= 0:
            continue
        start, end = cum, cum + n - 1
        expect[i] = (start, start // 256, end // 256,
                     end // 256 - start // 256 + 1)
        cum += n
    assert got == expect
