"""Corpus-curation operators: repetition metrics, PII redaction,
sequence-packing stats.

Training-data extension surface. Public background: repetition-based
quality filtering per the Gopher filters (Rae et al. '21, "Scaling
Language Models", App. A1.1) and C4's heuristics (Raffel et al. '20);
packing-efficiency accounting is standard LM-training bookkeeping.

Design constraints (same as operators/dedup.py):
- no Python in the row path — built-in functions only;
- integer or integer-derived outputs wherever results cross the
  cross-engine hash boundary;
- per-doc metrics are projections or (doc_id,·)-keyed aggs with
  map-side partial aggregation — no global state, no windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from supplier_performance_data_pipeline_spark.operators.textops import tokens

REP_NGRAM = 2  # repetition metric n-gram size

# PII patterns — deliberately the portable subset of regex (character
# classes, bounded counts, \b): identical semantics in Java regex
# (Spark) and RE2 (DuckDB). Case-insensitivity is explicit ([a-zA-Z])
# rather than flag-based so the two engines can't diverge on flags.
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
}
PII_TOKEN = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def ngram_repetition_metrics(
    docs: DataFrame, text_col: str = "text", n: int = REP_NGRAM
) -> DataFrame:
    """Per-doc n-gram repetition profile (Gopher-style filters):

    - ``n_ngrams``: total n-grams;
    - ``n_distinct_ngrams``: distinct n-grams;
    - ``top_ngram_count``: occurrences of the most frequent n-gram;
    - ``dup_ngram_count``: occurrences belonging to n-grams seen ≥2×.

    The filter ratios (top-n-gram share, duplicate fraction) are
    integer quotients downstream — the integers ARE the verified
    surface. Plan: explode n-grams → (doc_id, ngram) count → doc_id
    re-agg; both aggs combine map-side, shuffle keys carry no text
    beyond the n-gram itself.
    """
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        shingle_sets,
    )

    grams = shingle_sets(docs, text_col, n).select(
        "doc_id", F.explode("shingles").alias("g")
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_ngrams"),
        F.count("*").cast("long").alias("n_distinct_ngrams"),
        F.max("c").cast("long").alias("top_ngram_count"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
        .cast("long")
        .alias("dup_ngram_count"),
    )


def redact_pii(text: Column) -> Column:
    """Replace each PII pattern with its typed token. Order is the
    fixed dict order so both engines apply the same rewrite chain."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, PII_TOKEN[kind])
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (size of regexp_extract_all — portable;
    regexp_count is newer and not in every engine)."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        .cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone, clean_fingerprint): counts per
    PII kind plus the md5 of the redacted text — the redaction itself
    stays in-engine; only integers and a hash cross the boundary.
    Pure projection, no shuffle."""
    counts = pii_counts(F.col(text_col))
    return docs.select(
        "doc_id",
        *[c.alias(name) for name, c in counts.items()],
        F.md5(redact_pii(F.col(text_col))).alias("clean_fingerprint"),
    )


def contamination_report(
    train: DataFrame,
    eval_ngrams: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Eval-set decontamination: flag training documents sharing any
    n-gram with a held-out eval set (the GPT-3 App. C / Dodge et al. '21
    C4-contamination procedure, expressed as a join).

    ``eval_ngrams`` is a 1-column (``sh``) DISTINCT n-gram set. Output:
    (doc_id, n_ngrams, n_hit_ngrams) for contaminated docs only — both
    counts over the doc's DISTINCT n-grams, integer-exact.

    Scale: eval/benchmark sets are small by construction (≤ millions of
    n-grams), so the hit test is a BROADCAST left join against them —
    the 100-TB train side never shuffles; the only exchange is the
    (doc_id)-keyed count agg, which combines map-side. For an eval set
    too big to broadcast, swap in a shuffle join or a Bloom-filter
    prefilter; the call shape is unchanged.
    """
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        shingle_sets,
    )

    tr = shingle_sets(train, text_col, n).select(
        "doc_id", F.explode(F.array_distinct("shingles")).alias("sh")
    )
    hits = tr.join(
        F.broadcast(eval_ngrams.withColumn("hit", F.lit(1))), "sh", "left"
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_ngrams"),
            F.count("hit").cast("long").alias("n_hit_ngrams"),
        )
        .filter(F.col("n_hit_ngrams") > 0)
    )


def eval_ngram_set(
    eval_docs: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """DISTINCT n-gram set (column ``sh``) of an eval split — the
    broadcast side of ``contamination_report``."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        shingle_sets,
    )

    # explode_OUTER on purpose: with plain explode, the optimizer infers
    # "array non-empty / element non-null" predicates (generator pruning
    # + join-key isnotnull), pushes them below the Generate, and
    # collapses the layered projections — re-evaluating the FULL
    # tokenization inside the per-element shingle lambda (the O(len^2)
    # trap shingle_sets layers projections to avoid; measured 8x the
    # cost of the whole query at sf0.1). Nothing pushes below an outer
    # generate; the explicit null filter afterwards is equivalent.
    return (
        shingle_sets(eval_docs, text_col, n)
        .select(F.explode_outer("shingles").alias("sh"))
        .filter(F.col("sh").isNotNull())
        .distinct()
    )


def packing_stats(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    budget: int = 2048,
) -> DataFrame:
    """Per-group sequence-packing accounting for a fixed token budget:
    ``n_sequences = ceil(total_tokens / budget)`` (the concat-and-chunk
    packing used by LM training pipelines — documents are concatenated
    with separators and sliced into budget-sized sequences, so waste is
    only the final partial sequence per group) plus the padding waste
    that budget implies. One hash agg on the group key."""
    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    agg = docs.select(F.col(group_col).alias("grp"), n_tok.alias("n")).groupBy(
        "grp"
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
    )
    n_seq = F.ceil(F.col("total_tokens") / F.lit(budget)).cast("long")
    return agg.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "total_tokens",
        n_seq.alias("n_sequences"),
        (n_seq * budget - F.col("total_tokens")).cast("long").alias(
            "padding_tokens"
        ),
    )


PACK_BLOCK = 1024  # id-order block size for the two-level prefix sum


def sequence_pack(
    docs: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    block: int = PACK_BLOCK,
) -> DataFrame:
    """Concat-and-chunk sequence-packing ASSIGNMENT: lay every document
    out on the concatenated token stream in ``id_col`` order and chunk
    the stream every ``budget`` tokens — each doc gets its byte-exact
    placement (start_offset, first_seq, last_seq, n_seqs_spanned), the
    materialization step that ``packing_stats``' ceil-accounting only
    estimates. This is what actually feeds an LM data loader: sequence
    i holds stream tokens [i·budget, (i+1)·budget).

    The prefix sum is the two-level PARALLEL construction (same as the
    lateness histogram's running max): per-block token sums (one
    map-side-combined agg), running block offsets over the
    dimension-sized block table (the only SinglePartition exchange),
    then intra-block running sums partitioned by block — never a
    global ordered window over the docs. ``block`` is the scale knob;
    at 10^12 docs use ~10^6, or add a third level (log-depth general
    construction).

    Zero-token docs occupy no stream positions and are dropped (their
    "placement" is an empty interval). All arithmetic is integer;
    sequence ids use floor division of non-negative longs — identical
    in both engines. ``id_col`` must be NUMERIC (it both orders the
    stream and derives the prefix blocks; a string id would cast to
    NULL blocks and silently pack nothing, so it raises instead) and
    UNIQUE per row (duplicate ids tie the intra-block ORDER BY, making
    their running-sum frames — and so their offsets —
    partition-order-dependent). ``budget``/``block`` must be positive:
    Spark's non-ANSI ``DIV 0`` would return NULL sequence ids where
    the oracle errors — a silent/loud divergence this guard
    forecloses."""
    from pyspark.sql import types as T

    if budget <= 0 or block <= 0:
        raise ValueError(
            f"sequence_pack needs positive budget/block, got "
            f"{budget}/{block}"
        )
    id_type = docs.schema[id_col].dataType
    if not isinstance(id_type, T.NumericType):
        raise TypeError(
            f"sequence_pack needs a numeric id column; {id_col} is "
            f"{id_type.simpleString()} (map string ids to a dense rank "
            "first)"
        )
    e = docs.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("_tok"),
        (F.col(id_col) / block).cast("long").alias("_block"),
    ).filter(F.col("_tok") > 0)
    blocks = e.groupBy("_block").agg(F.sum("_tok").alias("_bsum"))
    wprev = Window.orderBy("_block").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = blocks.select(
        "_block",
        F.coalesce(F.sum("_bsum").over(wprev), F.lit(0)).alias("_prev"),
    )
    win = (
        Window.partitionBy("_block")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.col("_prev") + F.sum("_tok").over(win)
    return (
        e.join(F.broadcast(prev), "_block")
        .select(
            F.col(id_col),
            F.col("_tok").alias("n_tokens"),
            (cum - F.col("_tok")).alias("start_offset"),
            (cum - 1).alias("_end_incl"),
        )
        # integer floor-division of non-negative longs: DIV in Spark,
        # // in the DuckDB oracle — identical results, no doubles
        .selectExpr(
            id_col,
            "n_tokens",
            "start_offset",
            f"start_offset DIV {budget} AS first_seq",
            f"_end_incl DIV {budget} AS last_seq",
        )
        .withColumn(
            "n_seqs_spanned", F.col("last_seq") - F.col("first_seq") + 1
        )
    )
