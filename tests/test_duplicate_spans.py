"""Brute-force property pins for ``operators/dedup.py::duplicate_spans``
(r12 VERDICT #6): the relational sorted-gram-run extraction must agree
with a direct definition-chasing reference on adversarial overlap
shapes — periodic strings, self-overlapping repeats, boundary runs,
within-doc vs cross-doc duplication."""

import re

import pytest

TOKEN_RX = re.compile(r"[^0-9a-z]+")


def _brute_spans(corpus, gram_len, min_occ=2):
    """Definition-chasing reference: a gram start is duplicated when
    its token window occurs >= min_occ times anywhere in the corpus;
    maximal spans are maximal runs of consecutive duplicated starts."""
    toks = {
        d: [t for t in TOKEN_RX.split(text.lower()) if t]
        for d, text in corpus
    }
    from collections import Counter

    occ = Counter(
        tuple(ts[i : i + gram_len])
        for ts in toks.values()
        for i in range(len(ts) - gram_len + 1)
    )
    out = set()
    for d, ts in toks.items():
        marked = [
            i
            for i in range(len(ts) - gram_len + 1)
            if occ[tuple(ts[i : i + gram_len])] >= min_occ
        ]
        run: list[int] = []
        for i in marked + [None]:
            if run and (i is None or i != run[-1] + 1):
                out.add(
                    (
                        d,
                        run[0],
                        run[-1] + gram_len - 1,
                        run[-1] - run[0] + gram_len,
                        len(run),
                    )
                )
                run = []
            if i is not None:
                run.append(i)
    return out


def _op_spans(spark, corpus, gram_len, min_occ=2):
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
    )

    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    return {
        tuple(r)
        for r in duplicate_spans(
            docs, gram_len=gram_len, min_occurrences=min_occ, spread=False
        ).collect()
    }


CASES = {
    # cross-doc repeat mid-document, unique elsewhere
    "cross_doc": [
        (1, "u1 u2 the quick brown fox jumps over the lazy dog u3"),
        (2, "v1 the quick brown fox jumps over the lazy dog v2 v3"),
    ],
    # WITHIN-doc repeat: the refrain duplicates against itself
    "within_doc": [
        (1, "a b c d e f x1 x2 x3 a b c d e f y1 y2"),
        (2, "unrelated tokens only here nothing repeats at all"),
    ],
    # periodic string: every window equals every other aligned window
    "periodic": [(1, " ".join(["p q"] * 12) + " tail1 tail2")],
    # self-overlapping unary run
    "unary_run": [(1, " ".join(["z"] * 15) + " end")],
    # duplicated run flush against BOTH document boundaries
    "boundary": [
        (1, "s1 s2 s3 s4 s5 s6"),
        (2, "s1 s2 s3 s4 s5 s6"),
    ],
    # two maximal spans separated by a one-token gap (no merge across)
    "gap_split": [
        (1, "a1 a2 a3 a4 GAPTOKEN b1 b2 b3 b4 done"),
        (2, "a1 a2 a3 a4 ELSE b1 b2 b3 b4 other"),
    ],
    # shorter than gram_len: invisible by the documented relaxation
    "too_short": [(1, "dup dup"), (2, "dup dup")],
    # case folding + punctuation routed through the shared tokenizer
    "tokenizer": [
        (1, "The QUICK, brown-fox; jumps over . the lazy dog now"),
        (2, "the quick brown fox JUMPS over the LAZY dog indeed"),
    ],
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("gram_len", [2, 4])
def test_matches_brute_force(spark, name, gram_len):
    corpus = CASES[name]
    assert _op_spans(spark, corpus, gram_len) == _brute_spans(
        corpus, gram_len
    )


def test_min_occurrences_threshold(spark):
    corpus = [
        (1, "r1 r2 r3 r4 padding1 padding2"),
        (2, "r1 r2 r3 r4 padding3 padding4"),
        (3, "r1 r2 r3 r4 padding5 padding6"),
    ]
    # the triplicated run survives min_occurrences=3; nothing else does
    assert _op_spans(spark, corpus, 4, min_occ=3) == _brute_spans(
        corpus, 4, min_occ=3
    ) == {(1, 0, 3, 4, 1), (2, 0, 3, 4, 1), (3, 0, 3, 4, 1)}


def test_randomized_corpus_sweep(spark):
    """Seeded random corpora with planted repeats: the operator and
    the brute force agree on every document, including the empty-span
    documents that must NOT appear."""
    import random

    rng = random.Random(1301)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        refrain = [rng.choice(vocab) for _ in range(6)]
        corpus = []
        for d in range(8):
            body = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
            if rng.random() < 0.6:
                at = rng.randrange(0, len(body) + 1)
                body[at:at] = refrain
            corpus.append((d, " ".join(body)))
        assert _op_spans(spark, corpus, 3) == _brute_spans(corpus, 3)


def test_parameter_validation(spark):
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="gram_len"):
        duplicate_spans(docs, gram_len=0)
    with pytest.raises(ValueError, match="min_occurrences"):
        duplicate_spans(docs, min_occurrences=1)
