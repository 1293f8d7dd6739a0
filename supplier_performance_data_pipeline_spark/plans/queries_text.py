"""Text-analysis and dedup queries over ``documents``.

Oracle SQL is GENERATED from the same constants the Spark operators use
(stopword lists, shingle size, signature length) so the two dialects
can't drift. Hashing is md5 everywhere — portable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.dedup import (
    ACCENT_FROM,
    ACCENT_TO,
    CHAR_SHINGLE_N,
    LSH_BANDS,
    MINHASH_K,
    P61,
    SHINGLE_N,
    WS_RX,
    char_ngram_near_dup_pairs,
    doc_components,
    exact_dedup_groups,
    minhash_signatures,
    near_dup_pairs,
    near_dup_pairs_cached,
    ngram_jaccard,
    simhash32,
)
from supplier_performance_data_pipeline_spark.operators.textops import (
    LANG_STOPWORDS,
    PUNCT_CHARS,
    QUALITY_STOPWORDS,
    TOKEN_SPLIT_RX,
    fingerprint,
    fingerprint_t,
    lang_id_t,
    quality_score_t,
    tokens,
)
from supplier_performance_data_pipeline_spark.plans.registry import register
from supplier_performance_data_pipeline_spark.session import tune_session
from supplier_performance_data_pipeline_spark.sources.readers import spread_scan

# --- DuckDB dialect fragments (mirror textops/dedup exactly) ---------------

_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), "
    f"'{TOKEN_SPLIT_RX}'), x -> x <> '')"
)


def _in_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)



# THE quality-score SQL rendering (weights/caps/round in ONE place —
# mirrored by operators/textops.py::quality_score_t; change one, change
# both). Interpolate with {n_tok}/{stop}/{punct} sub-expressions.
_QUALITY_FORMULA_SQL = (
    "ROUND(0.4 * LEAST({n_tok} / 200.0, 1.0)"
    " + 0.4 * LEAST(COALESCE({stop}, 0.0) * 5.0, 1.0)"
    " + 0.2 * (1.0 - LEAST(COALESCE({punct}, 0.0) * 10.0, 1.0)), 6)"
)


def _stop_count(words: list[str]) -> str:
    return f"len(list_filter(toks, x -> x IN ({_in_list(words)})))"


_SHINGLES = (
    f"CASE WHEN len(toks) >= {SHINGLE_N} THEN "
    f"list_transform(range(0, len(toks) - {SHINGLE_N - 1}), i -> "
    "concat_ws(' ', "
    + ", ".join(f"toks[i + {j + 1}]" for j in range(SHINGLE_N))
    + ")) ELSE [array_to_string(toks, ' ')] END"
)

_TOKS_CTE = f"toks_cte AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)"
_SHINGLES_CTE = (
    f"sh_cte AS (SELECT doc_id, {_SHINGLES} AS shingles FROM toks_cte)"
)

# One md5 per shingle; component j = min (h1 + j*h2) mod 2^61-1 where
# h1/h2 are the two 14-hex-digit (56-bit) md5 halves — mirrors
# operators/dedup.py exactly.
_MS_CTE = (
    "ms_cte AS (SELECT doc_id, "
    "list_transform(shingles, s -> md5(s)) AS ms FROM sh_cte)"
)
_H1 = "CAST(concat('0x', substr(m, 1, 14)) AS BIGINT)"
_H2 = "CAST(concat('0x', substr(m, 15, 14)) AS BIGINT)"
_MH_COLS_SQL = ", ".join(
    f"list_min(list_transform(ms, m -> ({_H1} + {j} * {_H2}) % {P61})) AS mh{j}"
    for j in range(MINHASH_K)
)
_SIGS_CTE = f"sigs AS (SELECT doc_id, {_MH_COLS_SQL} FROM ms_cte)"

_PER_BAND = MINHASH_K // LSH_BANDS
_BAND_COLS_SQL = ", ".join(
    "md5(concat_ws('|', "
    + ", ".join(f"mh{b * _PER_BAND + j}" for j in range(_PER_BAND))
    + f")) AS band{b}"
    for b in range(LSH_BANDS)
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# --- text profile: token count, quality, language, fingerprint -------------


@register(
    "text_profile",
    oracle=f"""
WITH {_TOKS_CTE},
scored AS (
    SELECT
        doc_id,
        len(toks) AS n_tokens,
        CAST(len(toks) AS DOUBLE) AS n_tok_d,
        CAST({_stop_count(QUALITY_STOPWORDS)} AS DOUBLE)
            / NULLIF(CAST(len(toks) AS DOUBLE), 0.0) AS stop_ratio,
        CAST(length(text) - length(translate(text, '{PUNCT_CHARS}', '')) AS DOUBLE)
            / NULLIF(CAST(length(text) AS DOUBLE), 0.0) AS punct_ratio,
        {", ".join(
            f"CAST({_stop_count(w)} AS DOUBLE) / NULLIF(CAST(len(toks) AS DOUBLE), 0.0) AS s_{lang}"
            for lang, w in LANG_STOPWORDS.items()
        )},
        md5(array_to_string(toks, ' ')) AS fingerprint
    FROM toks_cte
)
SELECT
    doc_id,
    n_tokens,
    {_QUALITY_FORMULA_SQL.format(n_tok="n_tok_d", stop="stop_ratio", punct="punct_ratio")}
        AS quality_score,
    CASE
        WHEN COALESCE(s_en, 0.0) > 0 AND COALESCE(s_en, 0.0) >= COALESCE(s_es, 0.0)
             AND COALESCE(s_en, 0.0) >= COALESCE(s_de, 0.0)
             AND COALESCE(s_en, 0.0) >= COALESCE(s_fr, 0.0) THEN 'en'
        WHEN COALESCE(s_es, 0.0) > 0 AND COALESCE(s_es, 0.0) >= COALESCE(s_de, 0.0)
             AND COALESCE(s_es, 0.0) >= COALESCE(s_fr, 0.0) THEN 'es'
        WHEN COALESCE(s_de, 0.0) > 0 AND COALESCE(s_de, 0.0) >= COALESCE(s_fr, 0.0) THEN 'de'
        WHEN COALESCE(s_fr, 0.0) > 0 THEN 'fr'
        ELSE 'und'
    END AS lang_pred,
    fingerprint
FROM scored
""".strip(),
)
def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID + quality score + token count + fingerprint, all off
    ONE materialized tokenization (a single regexp split per row; the
    per-text wrappers would each rebuild it). No shuffle."""
    docs = _docs(spark, sf_dir)
    toks_df = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    )
    t = F.col("toks")
    return toks_df.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.round(quality_score_t(F.col("text"), t), 6).alias("quality_score"),
        lang_id_t(t).alias("lang_pred"),
        fingerprint_t(t).alias("fingerprint"),
    )


# --- exact dedup ------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS content_key, MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
""".strip(),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content hash; min-id survivor."""
    return exact_dedup_groups(_docs(spark, sf_dir), F.md5(F.col("text")))


@register(
    "dedup_normalized",
    oracle=f"""
WITH {_TOKS_CTE}
SELECT md5(array_to_string(toks, ' ')) AS content_key,
       MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM toks_cte GROUP BY md5(array_to_string(toks, ' '))
""".strip(),
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/case/punctuation-insensitive dedup on the token-stream
    fingerprint."""
    return exact_dedup_groups(_docs(spark, sf_dir), fingerprint(F.col("text")))


# --- MinHash signatures + LSH near-dup pairs -------------------------------


@register(
    "minhash_signatures",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE}
SELECT * FROM sigs
""".strip(),
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature via seeded md5 over 3-token shingles —
    bit-identical across engines."""
    return minhash_signatures(_docs(spark, sf_dir))


@register(
    "lsh_near_dup_pairs",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(({" + ".join(f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(MINHASH_K))})
            AS INTEGER) AS n_matching_components
FROM bands a JOIN bands b
  ON a.doc_id < b.doc_id
 AND ({" OR ".join(f"a.band{b} = b.band{b}" for b in range(LSH_BANDS))})
""".strip(),
)
def q_lsh_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate pairs + INTEGER matching-component count.
    Spark plans a bucket equi-join (explode bands → join on band hash);
    the oracle's all-pairs OR-join is only viable at oracle scale.

    The driver-checked output is the integer count, not the double
    ratio jaccard_est = n/k: the values agree bit-for-bit across
    engines (round-1 manual diff), but doubles can diverge at the
    hash-canonicalization boundary, so the verified surface is kept
    integer-exact. ``jaccard_est`` remains on the operator's API for
    in-engine consumers (checked in tests/test_dedup_sim_params.py)."""
    return near_dup_pairs(_docs(spark, sf_dir)).select(
        "doc_a", "doc_b", "n_matching_components"
    )


# --- character-n-gram MinHash: cross-lingual / CJK-safe near-dup -----------

_CHAR_FOLD = (
    f"trim(regexp_replace(translate(lower(text), '{ACCENT_FROM}', "
    f"'{ACCENT_TO}'), '{WS_RX}', ' ', 'g'))"
)
# k=8 in 2 bands of r=4 rows: band-collision threshold t ~ (1/b)^(1/r)
# = 0.84 estimated Jaccard — a strict near-dup bar. Looser bandings
# drown this small-shared-vocab corpus in coincidental candidates
# (r=2/t=0.5: 11% of ALL pairs collide). K stays at 8 because the
# signature projection is the cost center here (one md5 + K
# arithmetic mins per DISTINCT 5-gram — ~2.5M shingles at sf0.1, 10x
# the word-shingle volume); doubling K doubled that pass for little
# extra precision at this corpus's near-dup density. Real corpora
# tune r ~ log N per the MMDS s-curve — the same knob every MinHash
# query exposes.
CHAR_MH_K = 8
CHAR_LSH_BANDS = 2
_CHAR_PER_BAND = CHAR_MH_K // CHAR_LSH_BANDS
_CHAR_MH_COLS_SQL = ", ".join(
    f"list_min(list_transform(ms, m -> ({_H1} + {j} * {_H2}) % {P61})) AS mh{j}"
    for j in range(CHAR_MH_K)
)
_CHAR_BAND_COLS_SQL = ", ".join(
    "md5(concat_ws('|', "
    + ", ".join(f"mh{b * _CHAR_PER_BAND + j}" for j in range(_CHAR_PER_BAND))
    + f")) AS band{b}"
    for b in range(CHAR_LSH_BANDS)
)
_CHAR_SHINGLES = (
    f"CASE WHEN length(s) >= {CHAR_SHINGLE_N} THEN "
    f"list_transform(range(0, length(s) - {CHAR_SHINGLE_N - 1}), "
    f"i -> substr(s, i + 1, {CHAR_SHINGLE_N})) ELSE [s] END"
)


@register(
    "dedup_char_ngram_crosslingual",
    oracle=f"""
WITH norm AS (
    SELECT doc_id, lang, {_CHAR_FOLD} AS s FROM documents
),
csh AS (SELECT doc_id, lang, list_distinct({_CHAR_SHINGLES}) AS shingles FROM norm),
cms AS (SELECT doc_id, lang,
               list_transform(shingles, s -> md5(s)) AS ms FROM csh),
csigs AS (SELECT doc_id, lang, {_CHAR_MH_COLS_SQL} FROM cms),
cbands AS (SELECT csigs.*, {_CHAR_BAND_COLS_SQL} FROM csigs),
pairs AS (
    SELECT a.doc_id AS doc_a, a.lang AS lang_a, b.lang AS lang_b,
           ({" + ".join(f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(CHAR_MH_K))})
               AS n_match
    FROM cbands a JOIN cbands b
      ON a.doc_id < b.doc_id
     AND ({" OR ".join(f"a.band{b} = b.band{b}" for b in range(CHAR_LSH_BANDS))})
)
SELECT lang_a, lang_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN n_match = {CHAR_MH_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_full_signature,
       (lang_a <> lang_b) AS cross_lang
FROM pairs GROUP BY lang_a, lang_b
""".strip(),
)
def q_dedup_char_ngram_crosslingual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual / CJK-safe near-dup: MinHash-LSH over CHARACTER
    5-grams of diacritic-folded, case-folded, whitespace-collapsed
    text. The word-shingle pipeline (``lsh_near_dup_pairs``) assumes a
    whitespace-segmented script — an unsegmented zh document yields a
    handful of giant 'tokens' and its near-dups never share a band;
    character n-grams are the standard language-agnostic shingling
    (zh documents are 15% of this corpus), and the fold makes
    accent/case variants ("Café"/"cafe") collide.

    The driver-checked surface is the LANGUAGE-PAIR MATRIX (the
    ``near_dup_source_matrix`` pattern): per (lang_a, lang_b), the
    candidate-pair count, how many match on the FULL signature, and
    the cross-language flag — the translated/transliterated-duplicate
    screen of a multilingual curation pipeline. The pair LIST stays on
    the operator API (``char_ngram_near_dup_pairs``, unit-tested); at
    this corpus's near-dup density (~0.5M pairs at sf0.1 even at the
    t≈0.92 banding) registering the raw list would bench the Arrow
    transfer of the pair table, not the join.

    Plan: same scale path as every MinHash query — one md5 per
    5-gram, banded signature explode, bucket EQUI-join (never
    all-pairs; the oracle's OR-join form is viable only at oracle
    scale), pair dedup, two id-keyed joins to attach languages, and a
    tiny lang-pair agg. Portability: translate is a 1:1 codepoint map
    and substr/length are codepoint-indexed in both engines; the
    whitespace class is spelled explicitly because Java's \\s and
    RE2's \\s disagree on vertical tab."""
    docs = _docs(spark, sf_dir)
    pairs = char_ngram_near_dup_pairs(docs, k=CHAR_MH_K, bands=CHAR_LSH_BANDS)
    langs = docs.select("doc_id", "lang")
    tagged = pairs.join(
        langs.select(
            F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a")
        ),
        "doc_a",
    ).join(
        langs.select(
            F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b")
        ),
        "doc_b",
    )
    return (
        tagged.groupBy("lang_a", "lang_b")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(
                F.when(
                    F.col("n_matching_components") == CHAR_MH_K, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_full_signature"),
        )
        .withColumn("cross_lang", F.col("lang_a") != F.col("lang_b"))
    )


# --- SimHash ----------------------------------------------------------------

_SIMHASH_BITSUMS = ", ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS bit{b}"
    for b in range(32)
)
_SIMHASH_VALUE = " + ".join(
    f"CASE WHEN bit{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    for b in range(32)
)


@register(
    "simhash_signatures",
    oracle=f"""
WITH {_TOKS_CTE},
tok AS (
    SELECT doc_id, CAST(concat('0x', substr(md5(unnest.tok), 1, 8)) AS BIGINT) AS h
    FROM (SELECT doc_id, unnest(toks) AS tok FROM toks_cte) unnest
),
bits AS (
    SELECT doc_id, {_SIMHASH_BITSUMS}
    FROM tok GROUP BY doc_id
)
SELECT doc_id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash FROM bits
""".strip(),
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document — integer-only arithmetic, exact
    parity with the oracle."""
    return simhash32(_docs(spark, sf_dir))


# --- n-gram Jaccard on deterministic candidate pairs -----------------------


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
sh AS (SELECT doc_id, list_distinct(shingles) AS sh FROM sh_cte)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / NULLIF(CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE), 0.0), 6)
           AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
""".strip(),
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over consecutive-id candidate pairs —
    exercises the set-similarity kernel on definitely-nonempty input."""
    docs = _docs(spark, sf_dir)
    ids = docs.select("doc_id")
    pairs = (
        ids.alias("a")
        .join(
            ids.alias("b"),
            F.col("b.doc_id") == F.col("a.doc_id") + 1,
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    return ngram_jaccard(pairs, docs)


# --- rolling-hash fingerprint + BPE-ish token counting ----------------------

from supplier_performance_data_pipeline_spark.operators.textops import (  # noqa: E402
    BPE_TOKEN_RX,
    ROLL_B,
    ROLL_P,
    bpe_token_count,
    rolling_fingerprint_expr,
)

# DuckDB string literals are standard-conforming (backslash is a plain
# character), so only quotes need doubling — \s must reach RE2 intact.
_BPE_RX_SQL = BPE_TOKEN_RX.replace("'", "''")
# DuckDB list_reduce seeds the fold with the first element, which equals
# Spark's 0-seeded aggregate here (0*B + h1 = h1) — same recurrence.
_ROLL_SQL = (
    "CASE WHEN len(toks) = 0 THEN 0 ELSE list_reduce("
    "list_transform(toks, x -> "
    f"CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT) % {ROLL_P}), "
    f"(acc, x) -> (acc * {ROLL_B} + x) % {ROLL_P}) END"
)


@register(
    "text_fingerprints",
    oracle=f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       {_ROLL_SQL} AS rolling_fp,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_RX_SQL}')) AS BIGINT)
           AS n_bpe_tokens
FROM toks_cte
""".strip(),
)
def q_text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling fingerprint (incremental-update capable, vs
    the monolithic md5 fingerprint) + BPE-ish pre-tokenizer counts —
    the training-cost estimator. Pure projections, no shuffle."""
    docs = _docs(spark, sf_dir)
    with_toks = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    )
    return with_toks.select(
        "doc_id",
        F.expr(rolling_fingerprint_expr("toks")).alias("rolling_fp"),
        F.size("toks").cast("long").alias("n_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


# --- corpus curation: dedup -> quality/language gate -> token budget --------

_PROFILE_ORACLE = None  # filled below from the registered text_profile


@register(
    "corpus_curation_stats",
    oracle=None,  # assigned right after registration (reuses text_profile SQL)
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operators composed as an actual curation pipeline: profile
    (one tokenization) -> exact dedup on the normalized fingerprint
    (keep lowest doc_id) -> quality >= 0.4 gate -> per-language doc and
    token budget. Every stage is one of the already-verified operators;
    this query proves they compose into the end-to-end shape a training
    corpus build runs."""
    docs = _docs(spark, sf_dir)
    toks_df = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    )
    t = F.col("toks")
    profile = toks_df.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.round(quality_score_t(F.col("text"), t), 6).alias("quality_score"),
        lang_id_t(t).alias("lang_pred"),
        fingerprint_t(t).alias("fingerprint"),
    )
    kept = profile.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    dedup = profile.join(kept.select("doc_id"), "doc_id")
    return (
        dedup.filter(F.col("quality_score") >= 0.4)
        .groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
        )
    )


from supplier_performance_data_pipeline_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    QuerySpec,
)

_PROFILE_ORACLE = REGISTRY["text_profile"].oracle
REGISTRY["corpus_curation_stats"] = QuerySpec(
    name="corpus_curation_stats",
    build=REGISTRY["corpus_curation_stats"].build,
    oracle=f"""
WITH profile AS (
{_PROFILE_ORACLE}
),
kept AS (SELECT fingerprint, MIN(doc_id) AS doc_id FROM profile GROUP BY fingerprint),
dedup AS (SELECT p.* FROM profile p JOIN kept k ON p.doc_id = k.doc_id)
SELECT lang_pred,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(quality_score), 6) AS avg_quality
FROM dedup
WHERE quality_score >= 0.4
GROUP BY lang_pred
""".strip(),
)


# --- connected components: near-dup pairs -> dedup clusters -----------------

from supplier_performance_data_pipeline_spark.operators.graph import (  # noqa: E402
    CC_ITERS,
    connected_components,
)

# Keep pairs with at least half the signature components equal
# (jaccard_est >= 0.5) so clusters are near-dup groups, not every LSH
# candidate collision.
CC_MIN_MATCH = MINHASH_K // 2

_CC_MATCHES = " + ".join(
    f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(MINHASH_K)
)
_CC_PAIRS_SQL = (
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b "
    "ON a.doc_id < b.doc_id AND ("
    + " OR ".join(f"a.band{b} = b.band{b}" for b in range(LSH_BANDS))
    + f") WHERE ({_CC_MATCHES}) >= {CC_MIN_MATCH}"
)


def _cc_ctes(iters: int) -> list[str]:
    """Alternating large-star / small-star rounds, unrolled — the exact
    edge rewrites operators/graph.py runs, all-integer so any round
    count matches bit-for-bit."""
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    # each round references the previous edge set three times, so the
    # expansion would otherwise be 3^rounds copies of the base scan
    # (observed as "Too many open files") — the same lineage branching
    # the Spark side cuts with localCheckpoint.
    ctes = [
        f"pairs0 AS MATERIALIZED ({_CC_PAIRS_SQL})",
        "verts AS MATERIALIZED (SELECT doc_a AS v FROM pairs0 "
        "UNION SELECT doc_b FROM pairs0)",
        "e_0 AS MATERIALIZED (SELECT DISTINCT GREATEST(doc_a, doc_b) AS src, "
        "LEAST(doc_a, doc_b) AS dst FROM pairs0 WHERE doc_a <> doc_b)",
    ]
    for t in range(2 * iters):
        cond = "s.dst > s.src" if t % 2 == 0 else "s.dst <= s.src"
        ctes.append(
            f"sym_{t} AS MATERIALIZED (SELECT src, dst FROM e_{t} "
            f"UNION SELECT dst, src FROM e_{t} "
            "UNION SELECT v, v FROM verts)"
        )
        ctes.append(
            f"mins_{t} AS MATERIALIZED (SELECT src, MIN(dst) AS m "
            f"FROM sym_{t} GROUP BY src)"
        )
        ctes.append(
            f"e_{t + 1} AS MATERIALIZED "
            f"(SELECT DISTINCT s.dst AS src, mi.m AS dst "
            f"FROM sym_{t} s JOIN mins_{t} mi ON s.src = mi.src "
            f"WHERE {cond} AND s.dst <> mi.m)"
        )
    ctes.append(
        f"mn AS (SELECT src, MIN(dst) AS m FROM e_{2 * iters} GROUP BY src)"
    )
    return ctes


_CC_CTES_SQL = ",\n".join(_cc_ctes(CC_ITERS))


@register(
    "dedup_components",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
{_CC_CTES_SQL}
SELECT verts.v AS doc_id, COALESCE(mn.m, verts.v) AS component
FROM verts LEFT JOIN mn ON verts.v = mn.src
""".strip(),
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: LSH pairs (jaccard_est >= 0.5) →
    connected components via alternating large-star/small-star edge
    rewrites (operators/graph.py; Kiveris et al. SoCC '14). Each doc's
    ``component`` is the min doc_id of its cluster — the canonical
    survivor a retention pass keeps. The all-integer rounds are unrolled
    identically in the oracle, so the result is hash-verified even
    independent of convergence (a fixed point by CC_ITERS is separately
    asserted in tests/test_graph.py).

    Plan: ``doc_components`` builds the edge graph exact-collapse-first
    — byte-identical docs are grouped by md5(text) and reattached as
    member->representative star edges, so an M-copy boilerplate text
    costs M-1 edges instead of an M-row LSH bucket's M(M-1)/2 pair
    join (the quadratic hazard band-width tuning cannot fix, because
    exact copies share every band). Components are provably identical
    to the direct pair graph's (operators/dedup.py equivalence note +
    tests/test_exact_collapse.py), so the oracle's full-corpus unroll
    still hash-matches."""
    cc = doc_components(_docs(spark, sf_dir), min_match=CC_MIN_MATCH)
    return cc.select(F.col("id").alias("doc_id"), "component")


# --- deterministic hash sampling (reproducible corpus subsets) --------------

from supplier_performance_data_pipeline_spark.operators.sampling import (  # noqa: E402
    GRAIN,
    hash_sample,
    sample_threshold,
)

_SAMPLE_PCT = 0.2
_SAMPLE_SEED = 42
_BUCKET_SQL = (
    f"CAST(concat('0x', substr(md5(concat('{_SAMPLE_SEED}|', "
    f"CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % {GRAIN}"
)


@register(
    "documents_hash_sample",
    oracle=f"""
SELECT doc_id
FROM documents
WHERE {_BUCKET_SQL} < {sample_threshold(_SAMPLE_PCT)}
""".strip(),
)
def q_documents_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash 20% sample: membership is a pure function of
    (seed, doc_id), so the oracle reproduces the EXACT sampled set —
    reproducible across engines, partitionings, and reruns, which
    RNG-based sample() is not."""
    return hash_sample(_docs(spark, sf_dir), "doc_id", _SAMPLE_PCT,
                       _SAMPLE_SEED).select("doc_id")


# --- corpus vocabulary: term frequency top-k --------------------------------


@register(
    "vocab_top_terms",
    oracle=f"""
WITH {_TOKS_CTE},
tf AS (SELECT unnest(toks) AS term FROM toks_cte),
counts AS (SELECT term, COUNT(*) AS n FROM tf GROUP BY term)
SELECT term, CAST(n AS BIGINT) AS n
FROM counts ORDER BY n DESC, term LIMIT 100
""".strip(),
)
def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term-frequency top-100 (vocabulary building / tokenizer
    training input). Explode tokens → one term-keyed hash agg — partial
    counts combine map-side, so the shuffle carries one row per distinct
    term per partition, not one per token; the final top-k is
    TakeOrdered over the (small) distinct-term table, never a global
    sort of the corpus. Ties broken by term so the cut is total-ordered
    and deterministic in both engines."""
    docs = _docs(spark, sf_dir)
    tf = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    counts = tf.groupBy("term").agg(F.count("*").cast("long").alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("term")).limit(100)


# --- TF-IDF keyword extraction ----------------------------------------------

_TFIDF_TOP = 3


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, unnest(toks) AS term FROM toks_cte),
tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM tfc JOIN dfc USING (term) CROSS JOIN n
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
    FROM scored
)
SELECT doc_id, term, tf, df, tfidf FROM ranked WHERE rnk <= {_TFIDF_TOP}
""".strip(),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-{top} TF-IDF keywords. Plan: (doc, term) count agg →
    term-keyed doc-frequency agg (bounded by vocabulary size, so it
    BROADCASTS back onto the tf table; for a web-scale vocabulary past
    the broadcast threshold, drop the hint and the same plan becomes a
    term-keyed shuffle join — the tf table is already partitioned by
    term from its own agg) → corpus size attached as a
    broadcast 1-row cross join (the risk-bounds shape, never an empty
    window) → per-doc window rank over the few distinct terms each doc
    has — the window partitions by doc_id, so no global sort. Ranking
    keys on the ROUNDED score with a term tie-break: deterministic
    total order in both engines."""
    docs = _docs(spark, sf_dir)
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf", "df",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_TOP)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


# --- document length histogram ----------------------------------------------

_HIST_WIDTH = 10
_HIST_MAX_BUCKET = 20


@register(
    "doc_length_histogram",
    oracle=f"""
WITH {_TOKS_CTE},
b AS (
    SELECT LEAST(CAST(floor(len(toks) / {_HIST_WIDTH}.0) AS INTEGER),
                 {_HIST_MAX_BUCKET}) AS bucket
    FROM toks_cte
)
SELECT bucket,
       bucket * {_HIST_WIDTH} AS lo_tokens,
       COUNT(*) AS n_docs
FROM b GROUP BY bucket
""".strip(),
)
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram ({_HIST_WIDTH}-token buckets, clamped at
    bucket {_HIST_MAX_BUCKET}) — the length-distribution scan that
    precedes truncation/packing decisions. One integer-keyed hash agg;
    all columns integer."""
    docs = _docs(spark, sf_dir)
    n_tok = F.size(tokens(F.col("text")))
    bucket = F.least(
        F.floor(n_tok / float(_HIST_WIDTH)).cast("int"),
        F.lit(_HIST_MAX_BUCKET),
    )
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "bucket",
            (F.col("bucket") * _HIST_WIDTH).alias("lo_tokens"),
            "n_docs",
        )
    )


# --- full curation pipeline composite ---------------------------------------

from supplier_performance_data_pipeline_spark.operators.curation import (  # noqa: E402
    contamination_report,
    eval_ngram_set,
)
from supplier_performance_data_pipeline_spark.operators.sampling import (  # noqa: E402
    hash_bucket,
)
from supplier_performance_data_pipeline_spark.plans.queries_curation import (  # noqa: E402
    _DECON_BUCKET_SQL,
    _DECON_N,
    _DECON_PCT,
    _DECON_SEED,
)

_FULL_THR = sample_threshold(_DECON_PCT)

_FULL_CURATION_ORACLE = f"""
WITH profile AS (
{{profile}}
),
{_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
{{cc}},
cc_drop AS (
    SELECT verts.v AS doc_id FROM verts
    JOIN mn ON verts.v = mn.src WHERE mn.m <> verts.v
),
b AS (SELECT doc_id, {_DECON_BUCKET_SQL} AS bkt FROM documents),
ev_sh AS (
    SELECT DISTINCT unnest(sh_cte.shingles) AS sh
    FROM sh_cte JOIN b USING (doc_id) WHERE b.bkt < {_FULL_THR}
),
contaminated AS (
    SELECT DISTINCT s.doc_id
    FROM (SELECT doc_id, unnest(list_distinct(sh_cte.shingles)) AS sh
          FROM sh_cte JOIN b USING (doc_id)
          WHERE b.bkt >= {_FULL_THR}) s
    JOIN ev_sh e ON s.sh = e.sh
),
kept AS (SELECT fingerprint, MIN(doc_id) AS doc_id FROM profile
         GROUP BY fingerprint),
final AS (
    SELECT p.* FROM profile p
    JOIN kept k ON p.doc_id = k.doc_id
    JOIN b ON p.doc_id = b.doc_id
    WHERE b.bkt >= {_FULL_THR}
      AND p.doc_id NOT IN (SELECT doc_id FROM cc_drop)
      AND p.doc_id NOT IN (SELECT doc_id FROM contaminated)
      AND p.quality_score >= 0.4
)
SELECT lang_pred,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(quality_score), 6) AS avg_quality
FROM final GROUP BY lang_pred
""".strip()


@register("corpus_full_curation", oracle=None)  # assigned right below
def q_corpus_full_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE curation pipeline as one plan — what a training
    corpus build actually runs, every stage an already-verified
    operator:

      profile (one tokenization) ->
      exact dedup  (normalized fingerprint, min-id survivor) ->
      near-dup dedup (MinHash-LSH pairs -> large/small-star components,
                      only each cluster's min-id survives) ->
      train split  (deterministic hash split; eval docs excluded) ->
      decontamination (drop train docs sharing any 3-gram with eval) ->
      quality gate (score >= 0.4) ->
      per-language doc/token budget.

    Gates are computed corpus-wide and intersected, so they parallelize
    independently; the only driver-side step is the CC rounds'
    localCheckpoint materialization."""
    docs = _docs(spark, sf_dir)
    toks_df = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    )
    t = F.col("toks")
    # Materialize the scored profile ONCE: it feeds the dedup-survivor
    # agg, the join back, and two downstream filters — without the
    # checkpoint, predicate pushdown + projection collapse re-inline the
    # heavy HOF scoring expressions into every branch (measured 48s ->
    # 6s at sf0.01). Same lineage discipline as the CC rounds.
    profile = toks_df.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.round(quality_score_t(F.col("text"), t), 6).alias("quality_score"),
        lang_id_t(t).alias("lang_pred"),
        fingerprint_t(t).alias("fingerprint"),
    ).localCheckpoint()
    kept = profile.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    # Near-dup drop list via the collapse-first component builder
    # (exact copies become member->rep edges, never LSH bucket pairs;
    # identical components, tests/test_exact_collapse.py).
    nd_drop = (
        doc_components(docs, min_match=CC_MIN_MATCH)
        .filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias("doc_id"))
    )
    bkt = hash_bucket(F.col("doc_id"), _DECON_SEED)
    contaminated = contamination_report(
        docs.filter(bkt >= _FULL_THR),
        eval_ngram_set(docs.filter(bkt < _FULL_THR), n=_DECON_N),
        n=_DECON_N,
    ).select("doc_id")
    final = (
        profile.join(kept.select("doc_id"), "doc_id")
        .join(nd_drop, "doc_id", "left_anti")
        .filter(bkt >= _FULL_THR)
        .join(contaminated, "doc_id", "left_anti")
        .filter(F.col("quality_score") >= 0.4)
    )
    return final.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
    )


REGISTRY["corpus_full_curation"] = QuerySpec(
    name="corpus_full_curation",
    build=REGISTRY["corpus_full_curation"].build,
    oracle=_FULL_CURATION_ORACLE.format(
        profile=_PROFILE_ORACLE, cc=_CC_CTES_SQL
    ),
)


# --- cross-source near-dup contamination matrix -----------------------------

from supplier_performance_data_pipeline_spark.operators.dedup import (  # noqa: E402
    shingle_sets,
)


@register(
    "near_dup_source_matrix",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
pairs AS ({_CC_PAIRS_SQL}),
lab AS (
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b
    FROM pairs p
    JOIN documents da ON p.doc_a = da.doc_id
    JOIN documents db ON p.doc_b = db.doc_id
)
SELECT source_a, source_b, COUNT(*) AS n_pairs
FROM lab GROUP BY source_a, source_b
""".strip(),
)
def q_near_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE the near-duplicates come from: LSH near-dup pairs labeled
    with each side's ``source`` and rolled up per unordered source pair.
    The on-diagonal cells are within-source duplication (crawl overlap);
    off-diagonal cells are cross-source contamination — the number a
    corpus builder checks before deciding which source to drop copies
    from. Same bucketed pair generation as ``lsh_near_dup_pairs`` (never
    all-pairs); the (doc->source) side is a pure projection of the docs
    table joined twice on doc_id."""
    docs = _docs(spark, sf_dir)
    pairs_df, sigs = near_dup_pairs_cached(docs)
    pairs = pairs_df.filter(
        F.col("n_matching_components") >= CC_MIN_MATCH
    ).localCheckpoint()
    sigs.unpersist()
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    b = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- n-gram novelty: df-1 share per document --------------------------------


@register(
    "ngram_novelty_scores",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
ex AS (
    SELECT doc_id, unnest(list_distinct(shingles)) AS sh FROM sh_cte
),
dfreq AS (SELECT sh, COUNT(*) AS df FROM ex GROUP BY sh)
SELECT e.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_ratio
FROM ex e JOIN dfreq d ON e.sh = d.sh
GROUP BY e.doc_id
""".strip(),
)
def q_ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the share of a doc's distinct
    3-gram shingles that appear NOWHERE else in the corpus (document
    frequency 1). Low novelty = boilerplate/templated text; a standard
    pre-training quality signal that needs corpus-global state.

    Plan: explode distinct shingles -> shingle-keyed df agg (map-side
    partial combine) -> join back on the shingle key -> per-doc agg.
    Two shingle-keyed shuffles and one doc-keyed shuffle; the exploded
    shingle stream is recomputed rather than materialized — at 100 TB
    the exploded table is ~sequence-length x corpus and recompute from
    the column store is cheaper than caching it."""
    sh = shingle_sets(_docs(spark, sf_dir)).select(
        "doc_id", F.array_distinct(F.col("shingles")).alias("sh")
    )
    ex = sh.select("doc_id", F.explode(F.col("sh")).alias("sh"))
    dfreq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    novel = F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
    return (
        ex.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            novel.cast("bigint").alias("n_novel"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("novelty_ratio"),
        )
    )


# --- quality-weighted deterministic sampling --------------------------------

from supplier_performance_data_pipeline_spark.operators.sampling import (  # noqa: E402
    hash_bucket,
)

_QW_SEED = 7
_QW_BASE = 0.5  # acceptance rate at quality 1.0; scales linearly down
_QW_BUCKET_SQL = (
    f"CAST(concat('0x', substr(md5(concat('{_QW_SEED}|', "
    f"CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % {GRAIN}"
)


@register(
    "quality_weighted_sample",
    oracle=f"""
WITH profile AS (
{_PROFILE_ORACLE}
)
SELECT doc_id, quality_score
FROM profile
WHERE {_QW_BUCKET_SQL}
      < CAST({GRAIN * _QW_BASE} * quality_score AS BIGINT)
""".strip(),
)
def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling: each document's acceptance
    rate is ``_QW_BASE * quality_score`` — high-quality documents are
    kept proportionally more often — and membership is a pure function
    of (seed, doc_id, quality), so the EXACT sampled set reproduces
    across engines, partitionings, and reruns (the oracle materializes
    the identical set). The per-doc threshold is the truncated integer
    of an identical double product on both engines (6-dp-rounded
    quality x constant), compared against the md5 bucket — integer
    compare, no float boundary in the decision.

    Plan: pure projection + filter, no shuffle."""
    docs = _docs(spark, sf_dir)
    toks_df = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    )
    scored = toks_df.select(
        "doc_id",
        F.round(
            quality_score_t(F.col("text"), F.col("toks")), 6
        ).alias("quality_score"),
    )
    thr = (
        F.lit(float(GRAIN) * _QW_BASE) * F.col("quality_score")
    ).cast("long")
    return scored.filter(hash_bucket(F.col("doc_id"), _QW_SEED) < thr)


# --- SimHash banded near-dup pairs ------------------------------------------

# 4 bands x 8 bits over the 32-bit signature: any pair within Hamming
# distance 3 differs in at most 3 bands, so by pigeonhole it shares at
# least one full band — candidate recall at <=3 is exactly 1 (Manku,
# Jain & Sarma, WWW '07 sizing). 8-bit band values keep bucket
# occupancy ~n/256 per band; a 64-bit signature with 16-bit bands is
# the same code at larger corpus scale.
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 8
SIMHASH_HAMMING_MAX = 3

_SIM_CTE = f"""tok AS (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(u.tok), 1, 8)) AS BIGINT) AS h
    FROM (SELECT doc_id, unnest(toks) AS tok FROM toks_cte) u
),
bits AS (SELECT doc_id, {_SIMHASH_BITSUMS} FROM tok GROUP BY doc_id),
sim AS (SELECT doc_id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash FROM bits)"""


@register(
    "simhash_hamming_pairs",
    oracle=f"""
WITH {_TOKS_CTE},
{_SIM_CTE},
bands AS (
    SELECT doc_id,
           r.range AS band_idx,
           (simhash >> (8 * CAST(r.range AS INTEGER))) & 255 AS band_val
    FROM sim CROSS JOIN range({SIMHASH_BANDS}) r
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
FROM cand
JOIN sim sa ON sa.doc_id = doc_a
JOIN sim sb ON sb.doc_id = doc_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {SIMHASH_HAMMING_MAX}
""".strip(),
)
def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: banded bucketing (4 x 8-bit bands
    over the 32-bit signature) proposes candidates, exact Hamming
    distance over the full signature verifies — the Manku/Jain/Sarma
    WWW '07 web-dedup shape, and the bitwise sibling of the MinHash
    LSH pipeline (``lsh_near_dup_pairs``).

    Recall is EXACT at the emitted threshold: a pair within Hamming
    distance 3 differs in at most 3 of the 4 bands,
    so it must agree on one band and is always proposed (pigeonhole).

    Scale: signatures are one token-explode + hash-agg pass,
    materialized once (localCheckpoint) so the banded self-join's two
    sides don't recompute it. Candidates come from an equi-join on
    (band_idx, band_val) — bucket-sized work, never all-pairs — with
    the verify INLINE: the band stack carries the 32-bit signature
    (one long per row), the xor + popcount scores at the join, and no
    join-back onto the signature table exists. Multi-band dedup moves
    after scoring — hamming is a function of the pair, so the distinct
    is exact (the same inline-verify shape as
    operators/dedup.py::_pairs_from_sigs, where the k-long MinHash
    variant measured 11.7s vs 14.8s at the sf1 probe corpus).
    """
    sigs = simhash32(_docs(spark, sf_dir)).localCheckpoint()
    stack_args = ", ".join(
        f"{b}, cast(shiftright(simhash, {8 * b}) & 255 AS bigint)"
        for b in range(SIMHASH_BANDS)
    )
    bands = sigs.selectExpr(
        "doc_id",
        "simhash",
        f"stack({SIMHASH_BANDS}, {stack_args}) AS (band_idx, band_val)",
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "band_idx",
        "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .selectExpr(
            "doc_a",
            "doc_b",
            "cast(bit_count(sim_a ^ sim_b) AS int) AS hamming",
        )
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .distinct()
    )


# --- duplicate-cluster size distribution ------------------------------------


@register(
    "dedup_cluster_size_histogram",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
{_CC_CTES_SQL},
comp AS (
    SELECT verts.v AS doc_id, COALESCE(mn.m, verts.v) AS component
    FROM verts LEFT JOIN mn ON verts.v = mn.src
),
sizes AS (
    SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
)
SELECT cluster_size,
       COUNT(*) AS n_clusters,
       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size
""".strip(),
)
def q_dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of near-duplicate cluster sizes — the curation
    dashboard's "how duplicated is this corpus" histogram, and the
    sanity check that catches a degenerate giant component (a too-loose
    LSH threshold chains everything together; this surfaces it as one
    huge cluster_size row long before a retention pass eats the corpus).

    Same component builder as ``dedup_components`` (exact-collapse-
    first edge graph, alternating star rounds, per-round lineage
    truncation); the histogram itself is two cheap hash aggs over the
    component assignment — component-cardinality work, map-side
    combinable.
    """
    cc = doc_components(_docs(spark, sf_dir), min_match=CC_MIN_MATCH)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )


# --- BM25 keyword extraction ------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 3


@register(
    "bm25_top_terms",
    oracle=f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, unnest(toks) AS term FROM toks_cte),
tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tfc GROUP BY doc_id),
dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs,
             CAST(CAST(SUM(len(toks)) AS BIGINT) AS DOUBLE)
                 / COUNT(*) AS avgdl
      FROM toks_cte),
scored AS (
    SELECT tfc.doc_id, term, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df,
           ROUND(
               ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
               * (tf * ({_BM25_K1} + 1.0))
               / (tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * (dl / avgdl))),
               6) AS bm25
    FROM tfc
    JOIN dfc USING (term)
    JOIN dl ON dl.doc_id = tfc.doc_id
    CROSS JOIN n
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY bm25 DESC, term) AS rnk
    FROM scored
)
SELECT doc_id, term, tf, df, bm25 FROM ranked WHERE rnk <= {_BM25_TOP}
""".strip(),
)
def q_bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 BM25-weighted terms (Robertson–Spärck Jones idf,
    k1=1.2, b=0.75) — the retrieval-grade sibling of ``tfidf_top_terms``
    with document-length normalization, the scoring behind corpus
    search / hard-negative mining for retrieval training sets.

    Plan: ONE tokenize+explode → (doc,term) tf agg, MATERIALIZED
    (localCheckpoint) because three consumers read it — per-doc length,
    the term df table, and the scoring join; without the checkpoint
    Spark re-derives each branch and tokenizes the corpus three times
    (the plan pin asserts one corpus scan). df is vocabulary-sized and
    broadcasts back; N and avgdl attach as a broadcast 1-row cross
    join. avgdl is a single double division of exact integers (BIGINT
    token total — Σtf over the materialized aggregate, identical to
    Σlen(toks) since token-less docs contribute 0 — over the doc
    count); every BM25 input is an exact integer, the score expression
    is structured identically in both engines, and ranking keys on the
    ROUNDED score with a term tie-break — the same determinism
    contract as TF-IDF."""
    docs = _docs(spark, sf_dir)
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = (
        tf.agg(F.sum("tf").cast("long").alias("tok_total"))
        .crossJoin(docs.agg(F.count("*").alias("n_docs")))
        .select(
            "n_docs",
            (F.col("tok_total").cast("double") / F.col("n_docs")).alias(
                "avgdl"
            ),
        )
    )
    k1, b = _BM25_K1, _BM25_B
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf", "df",
            F.round(
                F.log(
                    (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))
                ),
                6,
            ).alias("bm25"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BM25_TOP)
        .select("doc_id", "term", "tf", "df", "bm25")
    )


# --- LSH estimator quality vs exact Jaccard ---------------------------------

_EST_CUT = 0.5  # the near-dup decision threshold under audit


@register(
    "lsh_estimator_error",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ({" + ".join(f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(MINHASH_K))})
               AS n_match
    FROM bands a JOIN bands b
      ON a.doc_id < b.doc_id
     AND ({" OR ".join(f"a.band{b} = b.band{b}" for b in range(LSH_BANDS))})
),
sh AS (SELECT doc_id, list_distinct(shingles) AS sh FROM sh_cte),
per_pair AS (
    SELECT n_match,
           CAST(n_match AS DOUBLE) / {MINHASH_K} AS est,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / NULLIF(CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE),
                        0.0) AS exact
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_a
    JOIN sh sb ON sb.doc_id = cand.doc_b
)
SELECT COUNT(*) AS n_pairs,
       ROUND(CAST(SUM(CAST(ROUND(ABS(est - exact), 6) AS DECIMAL(18,6)))
                      AS DOUBLE)
             / COUNT(*), 6) AS mean_abs_err,
       MAX(ROUND(ABS(est - exact), 6)) AS max_abs_err,
       CAST(SUM(CASE WHEN est >= {_EST_CUT} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_est_pos,
       CAST(SUM(CASE WHEN exact >= {_EST_CUT} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact_pos,
       CAST(SUM(CASE WHEN est >= {_EST_CUT} AND exact >= {_EST_CUT}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_both_pos
FROM per_pair
""".strip(),
)
def q_lsh_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-estimator audit: on every LSH candidate pair, the
    signature-based Jaccard estimate vs the EXACT shingle-set Jaccard —
    mean/max absolute error plus the confusion counts of the 0.5
    near-dup cut (est-positive, exact-positive, both). The dedup
    sibling of ``ann_recall_at_10``: it turns "trust the sketch" into a
    measured, driver-verified number.

    Plan: signatures materialize once (localCheckpoint) and feed the
    band-bucket equi-join; exact Jaccard joins the distinct-shingle
    sets onto ONLY the candidate pairs (bucket-sized, never all-pairs).
    Determinism: per-pair errors are double ops on exact integer
    operands ROUNDED to 6 before a DECIMAL sum; the mean is one double
    division at the edge; confusion counts are integers.
    """
    docs = _docs(spark, sf_dir)
    pairs_df, sigs = near_dup_pairs_cached(docs)
    pairs = pairs_df.localCheckpoint()
    sigs.unpersist()
    exact = ngram_jaccard(
        pairs.select("doc_a", "doc_b"), docs
    ).withColumnRenamed("jaccard", "exact")
    per_pair = (
        pairs.select(
            "doc_a",
            "doc_b",
            (F.col("n_matching_components").cast("double") / MINHASH_K)
            .alias("est"),
        )
        .join(exact, ["doc_a", "doc_b"])
        .select(
            "est",
            "exact",
            F.round(F.abs(F.col("est") - F.col("exact")), 6).alias("err"),
        )
    )
    cut = _EST_CUT
    return per_pair.agg(
        F.count("*").alias("n_pairs"),
        F.round(
            F.sum(F.col("err").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_abs_err"),
        F.max("err").alias("max_abs_err"),
        F.sum(F.when(F.col("est") >= cut, 1).otherwise(0))
        .cast("long")
        .alias("n_est_pos"),
        F.sum(F.when(F.col("exact") >= cut, 1).otherwise(0))
        .cast("long")
        .alias("n_exact_pos"),
        F.sum(
            F.when((F.col("est") >= cut) & (F.col("exact") >= cut), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_both_pos"),
    )


# --- language-ID confusion matrix -------------------------------------------


def _lang_pred_case() -> str:
    """The lang_id decision rule as one SQL CASE, GENERATED from the
    same ordered LANG_STOPWORDS the operator uses (first language in
    dict order wins ties) — so the oracle can never drift from
    operators/textops.py::lang_id_t."""
    langs = list(LANG_STOPWORDS)
    clauses = []
    for i, lang in enumerate(langs):
        conds = [f"COALESCE(s_{lang}, 0.0) > 0"] + [
            f"COALESCE(s_{lang}, 0.0) >= COALESCE(s_{l2}, 0.0)"
            for l2 in langs[i + 1:]
        ]
        clauses.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


@register(
    "lang_id_confusion",
    oracle=f"""
WITH {_TOKS_CTE},
labeled AS (
    SELECT d.lang, t.doc_id,
           {", ".join(
               f"CAST({_stop_count(w)} AS DOUBLE) / NULLIF(CAST(len(toks) AS DOUBLE), 0.0) AS s_{lang}"
               for lang, w in LANG_STOPWORDS.items()
           )}
    FROM toks_cte t JOIN documents d ON t.doc_id = d.doc_id
),
pred AS (
    SELECT lang, {_lang_pred_case()} AS lang_pred FROM labeled
)
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY lang, lang_pred
""".strip(),
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram/stopword language-ID heuristic
    against the corpus's labeled ``lang`` column — the accuracy audit
    every language-filtered training mix needs before trusting the
    classifier to route documents (off-diagonal mass = mislabeled
    training data; labels OUTSIDE the classifier's inventory, e.g.
    zh here, expose its blind spot honestly as their own rows).

    One tokenization, one projection, one (lang, lang_pred)-keyed agg
    — at 100 TB this is a scan plus a 25-cell rollup. The decision
    rule in the oracle is GENERATED from the operator's own ordered
    stopword table, so predictions cannot drift between engines."""
    docs = _docs(spark, sf_dir)
    toks_df = docs.select(
        "lang", tokens(F.col("text")).alias("toks")
    )
    return (
        toks_df.select("lang", lang_id_t(F.col("toks")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


# --- Misra-Gries heavy hitters, exact-verified ------------------------------

MG_K = 2  # counters per partition: heavy = frequency > n/(k+1) = n/3.
# The corpus's lang column is genuinely skewed (en ~ 44% > 1/3), so the
# guarantee is non-vacuous AND evictions actually happen (5 distinct
# values compete for 2 counters).


@register(
    "lang_heavy_hitters_verified",
    oracle=f"""
SELECT CAST({MG_K} AS BIGINT) AS k_counters,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (
            SELECT lang FROM documents GROUP BY lang
            HAVING COUNT(*) * ({MG_K} + 1) > (SELECT COUNT(*) FROM documents)
        )) AS n_true_heavy,
       CAST(0 AS BIGINT) AS n_missed
FROM documents
""".strip(),
)
def q_lang_heavy_hitters_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter languages (frequency > n/(k+1)) found by per-
    partition Misra-Gries summaries with k={k} counters and PROVEN
    complete against exact counts — the verified-approximation pattern
    (events_user_count_approx) applied to the frequent-items sketch.

    The guarantee under test (Agarwal et al., Mergeable Summaries,
    PODS '12): the union of per-partition MG candidate keys contains
    EVERY item with global frequency above n/(k+1), whatever the
    partitioning or arrival order — so ``n_missed`` (true heavy
    hitters absent from the candidates, via anti-join) is
    deterministically ZERO even though the candidate SET itself is
    order-dependent. The oracle asserts the exact heavy-hitter count
    and the zero; a broken sketch flips n_missed and hash-fails.

    Scale shape: the sketch pass is one scan with k counters per
    partition and no shuffle (Arrow ``mapInPandas``,
    operators/sketch.py); the exact pass — which at 100 TB you'd run
    only on the candidates — here also feeds the verification
    threshold. Integer-only output."""
    from supplier_performance_data_pipeline_spark.operators.sketch import (
        mg_candidate_items,
    )

    docs = _docs(spark, sf_dir)
    cands = mg_candidate_items(docs, "lang", MG_K)
    counts = docs.groupBy("lang").agg(F.count("*").alias("c"))
    totals = docs.agg(F.count("*").alias("n"))
    heavy = (
        counts.crossJoin(F.broadcast(totals))
        .filter(F.col("c") * (MG_K + 1) > F.col("n"))
        .select(F.col("lang").alias("item"))
    )
    missed = heavy.join(cands, "item", "left_anti")
    return (
        totals.select(
            F.lit(MG_K).cast("long").alias("k_counters"),
            F.col("n").cast("long").alias("n_docs"),
        )
        .crossJoin(heavy.agg(F.count("*").alias("n_true_heavy")))
        .crossJoin(missed.agg(F.count("*").alias("n_missed")))
    )


q_lang_heavy_hitters_verified.__doc__ = q_lang_heavy_hitters_verified.__doc__.format(
    k=MG_K
)


# --- canonical survivor selection per near-dup cluster ----------------------


@register(
    "dedup_canonical_selection",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
{_CC_CTES_SQL},
comp AS (
    SELECT verts.v AS doc_id, COALESCE(mn.m, verts.v) AS component
    FROM verts LEFT JOIN mn ON verts.v = mn.src
),
q AS (
    SELECT t.doc_id,
           {_QUALITY_FORMULA_SQL.format(
               n_tok="CAST(len(toks) AS DOUBLE)",
               stop=f"CAST({_stop_count(QUALITY_STOPWORDS)} AS DOUBLE)"
                    " / NULLIF(CAST(len(toks) AS DOUBLE), 0.0)",
               punct="CAST(length(text) - length(translate(text, '"
                     + PUNCT_CHARS
                     + "', '')) AS DOUBLE)"
                     " / NULLIF(CAST(length(text) AS DOUBLE), 0.0)",
           )} AS quality
    FROM toks_cte t JOIN comp c2 ON t.doc_id = c2.doc_id
),
ranked AS (
    SELECT c.component, c.doc_id, q.quality,
           ROW_NUMBER() OVER (PARTITION BY c.component
               ORDER BY q.quality DESC, c.doc_id DESC) AS rn
    FROM comp c JOIN q ON c.doc_id = q.doc_id
)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
           AS canonical_doc,
       MAX(CASE WHEN rn = 1 THEN quality END) AS canonical_quality,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM ranked GROUP BY component
""".strip(),
)
def q_dedup_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor selection per near-dup cluster: instead of
    the min-id survivor (``dedup_components``' convention), keep the
    HIGHEST-QUALITY member of each cluster (quality-desc, doc_id-desc
    tie-break — a total order, so both engines crown the same doc).
    This is the retention policy real curation uses: near-dup groups
    often pair a clean page with its boilerplate-wrapped copies, and
    min-id keeps whichever crawled first.

    Plan: the LSH pair list checkpoints once, components come from the
    alternating star rewrites, quality is a pure projection over one
    materialized tokenization, and the argmax is ROW_NUMBER over
    CLUSTER-grain partitions (dup-doc-count rows, never the corpus;
    the window key is the component id, high cardinality — no global
    sort). Output is cluster-grain: component, size, canonical doc +
    its quality, drop count."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    cc = doc_components(docs, min_match=CC_MIN_MATCH)
    # Restrict to cluster members BEFORE tokenizing: quality is a
    # regexp-split projection, and only docs appearing in LSH pairs
    # survive — scoring the whole corpus first would waste a full
    # tokenization pass at scale.
    members = cc.select(F.col("id").alias("doc_id"), "component")
    joined = members.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "component",
        F.round(
            quality_score_t(F.col("text"), tokens(F.col("text"))), 6
        ).alias("quality"),
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.desc("doc_id")
    )
    ranked = joined.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("component").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
        .cast("long")
        .alias("canonical_doc"),
        F.max(F.when(F.col("rn") == 1, F.col("quality"))).alias(
            "canonical_quality"
        ),
        (F.count("*") - 1).cast("long").alias("n_dropped"),
    )


# --- vocabulary growth (Heaps-law curve) ------------------------------------

_VOCAB_BUCKET = 100  # docs per growth checkpoint


@register(
    "corpus_vocabulary_growth",
    oracle=f"""
WITH {_TOKS_CTE},
per_doc AS (SELECT doc_id, len(toks) AS n_toks FROM toks_cte),
tok AS (SELECT doc_id, unnest(toks) AS t FROM toks_cte),
first_occ AS (SELECT t, MIN(doc_id) AS d0 FROM tok GROUP BY t),
new_per_doc AS (SELECT d0 AS doc_id, COUNT(*) AS n_new FROM first_occ GROUP BY d0),
bucketed AS (
    SELECT p.doc_id // {_VOCAB_BUCKET} AS bucket,
           COUNT(*) AS docs,
           SUM(p.n_toks) AS toks,
           SUM(COALESCE(n.n_new, 0)) AS news
    FROM per_doc p LEFT JOIN new_per_doc n USING (doc_id)
    GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(SUM(docs) OVER w AS BIGINT) AS docs_cum,
       CAST(SUM(toks) OVER w AS BIGINT) AS tokens_cum,
       CAST(SUM(news) OVER w AS BIGINT) AS vocab_cum
FROM bucketed
WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
""".strip(),
)
def q_corpus_vocabulary_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: cumulative distinct-token
    count vs cumulative token count at every {B}-document checkpoint
    (doc_id order = ingest order). The curve is how a corpus audit
    detects TEMPLATE COLLAPSE (vocab flattens early: boilerplate
    dominates) or CONTAMINATION SPIKES (vocab jumps: a foreign shard
    appended) without fitting the K·n^β power law itself — the fit
    needs log/pow, which the no-libm determinism contract bans; the
    integer curve IS the deliverable and any client can fit it.

    The cumulative-distinct trick: a token contributes to vocab at
    exactly its FIRST document (MIN doc_id per token — one hash agg
    over the exploded token table), so 'vocabulary at checkpoint' is a
    running SUM of per-bucket first-occurrence counts — no
    O(checkpoints × corpus) re-counting, no distinct-over-window.
    Plan: one tokenize pass → token-keyed agg (the only big shuffle) →
    doc-keyed bucket agg → a running sum over the checkpoint-grain
    table ({B}-doc buckets; at 100 TB that window is the two-level
    parallel-prefix shape the sequence-packing query already uses).
    All-integer outputs: exact in any engine."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    toks_df = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).localCheckpoint()
    per_doc = toks_df.select("doc_id", F.size("toks").alias("n_toks"))
    tok = toks_df.select("doc_id", F.explode("toks").alias("t"))
    first_occ = tok.groupBy("t").agg(F.min("doc_id").alias("doc_id"))
    new_per_doc = first_occ.groupBy("doc_id").agg(
        F.count("*").alias("n_new")
    )
    bucketed = (
        per_doc.join(new_per_doc, "doc_id", "left")
        .groupBy(F.expr(f"doc_id div {_VOCAB_BUCKET}").alias("bucket"))
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_toks").alias("toks"),
            F.sum(F.coalesce("n_new", F.lit(0))).alias("news"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return bucketed.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.sum("docs").over(w).cast("long").alias("docs_cum"),
        F.sum("toks").over(w).cast("long").alias("tokens_cum"),
        F.sum("news").over(w).cast("long").alias("vocab_cum"),
    )


q_corpus_vocabulary_growth.__doc__ = q_corpus_vocabulary_growth.__doc__.format(
    B=_VOCAB_BUCKET
)


# --- BPE merge candidates (tokenizer training, step 1) ----------------------

_BPE_TOP = 20


@register(
    "corpus_bpe_first_merges",
    oracle=f"""
WITH {_TOKS_CTE},
tok AS (SELECT unnest(toks) AS t FROM toks_cte),
pairs AS (
    SELECT unnest(list_transform(range(1, length(t)), i -> substr(t, i, 2))) AS pair
    FROM tok WHERE length(t) >= 2
),
counted AS (SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair),
ranked AS (
    SELECT pair, n, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank
    FROM counted
)
SELECT pair, CAST(n AS BIGINT) AS n_occurrences, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {_BPE_TOP}
""".strip(),
)
def q_corpus_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of byte-pair-encoding tokenizer training:
    count every ADJACENT character pair inside the corpus's word
    tokens and rank the top {K} merge candidates — the exact statistic
    the BPE loop (Sennrich '16) greedily merges, and the curation
    signal for "does this corpus want a new vocab" (a shifted top
    table vs the tokenizer's existing merges predicts fertility blow-
    up, which ``tokenizer_fertility_by_lang`` then measures).

    Full BPE training is inherently ITERATIVE (each merge rewrites the
    symbol stream — at scale that is one pair-count aggregate per
    merge over a re-encoded corpus, the same fixed-iteration pattern
    as Lloyd's/PageRank here); step 1 is the distributed-heavy part
    and is exactly reproducible.

    Plan: tokenize → in-row bigram expansion (no join — substr over a
    sequence), explode, ONE pair-keyed hash agg with map-side
    combine, then a top-{K} over the pair-vocabulary-sized count
    table. Ties break lexicographically so the rank is total."""
    toks_df = _docs(spark, sf_dir).select(
        tokens(F.col("text")).alias("toks")
    )
    tok = toks_df.select(F.explode("toks").alias("t")).filter(
        F.length("t") >= 2
    )
    pairs = tok.select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substr(t, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BPE_TOP)
        .select(
            "pair",
            F.col("n").cast("long").alias("n_occurrences"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


q_corpus_bpe_first_merges.__doc__ = q_corpus_bpe_first_merges.__doc__.format(
    K=_BPE_TOP
)


# --- leakage-safe train/val/test split (cluster-keyed hash assignment) -------

from supplier_performance_data_pipeline_spark.operators.sampling import (  # noqa: E402
    md5_mod,
    md5_mod_sql,
)

_SPLIT_SALT = "split7|"
_SPLIT_TRAIN = 8_000  # /GRAIN -> 80%
_SPLIT_VAL = 9_000  # next 10%; remainder is test


def _split_case_sql(expr: str) -> str:
    b = md5_mod_sql(expr, _SPLIT_SALT, GRAIN)
    return (
        f"CASE WHEN {b} < {_SPLIT_TRAIN} THEN 'train' "
        f"WHEN {b} < {_SPLIT_VAL} THEN 'val' ELSE 'test' END"
    )


def _split_case(key):
    b = md5_mod(key, _SPLIT_SALT, GRAIN)
    return (
        F.when(b < _SPLIT_TRAIN, "train")
        .when(b < _SPLIT_VAL, "val")
        .otherwise("test")
    )


def _doc_clusters(spark: SparkSession, sf_dir: str) -> "tuple":
    """Shared preamble of every cluster-keyed corpus query
    (leakage-safe split, its stratified view, the per-source dedup
    rate): docs -> exact-collapse-first edge graph (checkpointed ONCE
    inside ``doc_components``) -> star-contraction components ->
    (doc_id, cluster) for EVERY doc, singletons keyed by themselves.
    Returns (docs, clusters) so callers join their own extra columns.
    One definition — the sibling queries claim "the SAME lineage", and
    this is what makes that claim structural rather than copy-paste."""
    docs = _docs(spark, sf_dir)
    comp = doc_components(docs, min_match=CC_MIN_MATCH).select(
        F.col("id").alias("doc_id"), "component"
    )
    clusters = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster"),
        )
    )
    return docs, clusters



# Shared oracle fragment for the cluster-keyed corpus queries — one
# rendering of the components-join + singleton-coalesce, mirroring
# _doc_clusters. {cols} = extra document columns to carry.
def _clusters_base_sql(cols: str) -> str:
    return (
        f"SELECT d.doc_id, {cols}, "
        "COALESCE(c.component, d.doc_id) AS cluster "
        "FROM documents d "
        f"LEFT JOIN (SELECT * FROM ({REGISTRY['dedup_components'].oracle}) "
        "t_comp) c ON c.doc_id = d.doc_id"
    )


@register(
    "corpus_leakage_safe_split",
    oracle=f"""
WITH base AS ({_clusters_base_sql("d.n_chars")}),
asg AS (
    SELECT doc_id, n_chars, cluster,
           {_split_case_sql("CAST(cluster AS VARCHAR)")} AS split,
           {_split_case_sql("CAST(doc_id AS VARCHAR)")} AS naive_split
    FROM base
),
cl AS (
    SELECT cluster, split, COUNT(*) AS n_docs, SUM(n_chars) AS chars,
           COUNT(DISTINCT naive_split) AS nns
    FROM asg GROUP BY cluster, split
)
SELECT split,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN nns > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS naive_leaky_clusters
FROM cl GROUP BY split
""".strip(),
)
def q_corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment that CANNOT leak near-duplicates across
    splits: the 80/10/10 hash split is keyed by the near-dup CLUSTER id
    (``dedup_components``' min-doc-id, singletons key by themselves),
    so every member of a cluster lands in the same split by
    construction. The ``naive_leaky_clusters`` column quantifies the
    hazard being avoided: how many of this split's multi-doc clusters
    the per-DOC hash split would have scattered across >1 split — the
    train/test contamination mode that inflates eval scores (the reason
    Dodge et al. '21 / Lee et al. '22 dedup before splitting).

    Determinism: membership is the engine-wide md5_mod recipe over the
    cluster key, so the oracle reproduces the exact assignment; all
    outputs are integer counts. Plan: LSH pairs checkpoint once ->
    star-contraction components -> one doc_id equi-join back to the
    doc table (components exist only for docs in pairs; the join is a
    plain shuffle join — at high duplication rates the component map
    is corpus-sized, so no broadcast hint: AQE may still pick one when
    it IS small) -> two integer hash aggs (cluster grain, then split
    grain). The leakage audit rides the same cluster-grain agg the
    dedup report already pays for."""
    docs, clusters = _doc_clusters(spark, sf_dir)
    base = docs.select("doc_id", "n_chars").join(clusters, "doc_id")
    asg = base.select(
        "doc_id",
        "n_chars",
        "cluster",
        _split_case(F.col("cluster")).alias("split"),
        _split_case(F.col("doc_id")).alias("naive_split"),
    )
    cl = asg.groupBy("cluster", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars"),
        F.countDistinct("naive_split").alias("nns"),
    )
    return cl.groupBy("split").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("chars").cast("long").alias("total_chars"),
        F.sum(F.when(F.col("nns") > 1, 1).otherwise(0))
        .cast("long")
        .alias("naive_leaky_clusters"),
    )


# --- per-source dedup-rate report (round-8) ----------------------------------


@register(
    "dedup_rate_by_source",
    oracle=f"""
WITH base AS ({_clusters_base_sql("d.source")})
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters,
       CAST(SUM(CASE WHEN doc_id <> cluster THEN 1 ELSE 0 END) AS BIGINT)
           AS n_non_canonical,
       ROUND(CAST(SUM(CASE WHEN doc_id <> cluster THEN 1 ELSE 0 END)
                  AS DOUBLE) * 100.0 / COUNT(*), 6) AS dup_rate_pct
FROM base GROUP BY source
""".strip(),
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which ingestion sources are polluting the corpus with
    near-duplicates — the per-source rollup of ``dedup_components``
    (round-7 verdict #8): every doc keys by its near-dup cluster
    (singletons by themselves), a doc is "non-canonical" when it is
    not its cluster's min-id survivor, and the per-source rate is the
    share a retention pass would drop. The curation decision this
    feeds: down-weight or re-crawl sources whose dup rate is an
    outlier.

    Plan: one extra source-grain hash agg over the SAME LSH-pairs ->
    star-contraction -> doc-grain join lineage the leakage split
    already runs; counts stay integers and the one output division is
    double-exact (nonnegative, so the -0.0 class can't fire).
    Oracle authored per ORACLES.md."""
    docs, clusters = _doc_clusters(spark, sf_dir)
    base = docs.select("doc_id", "source").join(clusters, "doc_id")
    non_canon = F.sum(
        F.when(F.col("doc_id") != F.col("cluster"), 1).otherwise(0)
    )
    return base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("cluster").cast("long").alias("n_clusters"),
        non_canon.cast("long").alias("n_non_canonical"),
        F.round(
            non_canon.cast("double") * F.lit(100.0) / F.count("*"), 6
        ).alias("dup_rate_pct"),
    )


# --- stratified leakage-safe split with per-stratum proof (round-8) ----------


@register(
    "corpus_stratified_leakage_split",
    oracle=f"""
WITH base AS ({_clusters_base_sql("d.source")}),
asg AS (
    SELECT doc_id, source, cluster,
           {_split_case_sql("CAST(cluster AS VARCHAR)")} AS split
    FROM base
),
strat AS (
    SELECT source, split, COUNT(*) AS n_docs,
           COUNT(DISTINCT cluster) AS n_clusters
    FROM asg GROUP BY source, split
),
viol AS (
    SELECT source,
           SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS leaky
    FROM (SELECT source, cluster, COUNT(DISTINCT split) AS ns
          FROM asg GROUP BY source, cluster) t
    GROUP BY source
)
SELECT s.source, s.split,
       CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(s.n_clusters AS BIGINT) AS n_clusters,
       CAST(v.leaky AS BIGINT) AS stratum_leaky_clusters
FROM strat s JOIN viol v ON s.source = v.source
""".strip(),
)
def q_corpus_stratified_leakage_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STRATIFIED view of the leakage-safe split (round-7 verdict #8):
    the same cluster-keyed 80/10/10 hash assignment as
    ``corpus_leakage_safe_split``, reported per (source, split) cell so
    a mixture designer can see each stratum's actual split ratios, plus
    the per-stratum PROOF column: ``stratum_leaky_clusters`` counts
    this source's clusters that landed in more than one split — zero
    for every stratum BY CONSTRUCTION (membership is a pure function
    of the cluster key), and the driver hash-checks that zero against
    the oracle rather than trusting the construction.

    Plan: the same pairs->components->doc-join lineage as the parent
    split, then two hash aggs ((source, cluster) grain for the proof,
    (source, split) grain for the census) — both map-side-combined;
    nothing new shuffles at fact scale. Oracle authored per ORACLES.md."""
    docs, clusters = _doc_clusters(spark, sf_dir)
    asg = (
        docs.select("doc_id", "source")
        .join(clusters, "doc_id")
        .withColumn("split", _split_case(F.col("cluster")))
    )
    strat = asg.groupBy("source", "split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("cluster").cast("long").alias("n_clusters"),
    )
    viol = (
        asg.groupBy("source", "cluster")
        .agg(F.countDistinct("split").alias("ns"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0))
            .cast("long")
            .alias("stratum_leaky_clusters")
        )
    )
    return strat.join(viol, "source")


# --- cluster chaining audit (edge-similarity structure of CC clusters) -------

_EDGES_M_SQL = (
    f"edges_m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    f"({_CC_MATCHES}) AS m FROM bands a JOIN bands b "
    "ON a.doc_id < b.doc_id AND ("
    + " OR ".join(f"a.band{b} = b.band{b}" for b in range(LSH_BANDS))
    + f") WHERE ({_CC_MATCHES}) >= {CC_MIN_MATCH})"
)


@register(
    "dedup_cluster_chaining_audit",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
{_CC_CTES_SQL},
comp AS (SELECT verts.v AS doc_id, COALESCE(mn.m, verts.v) AS component
         FROM verts LEFT JOIN mn ON verts.v = mn.src),
{_EDGES_M_SQL},
csize AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component),
ce AS (SELECT c.component, e.m FROM edges_m e
       JOIN comp c ON c.doc_id = e.doc_a),
cagg AS (SELECT component, COUNT(*) AS n_edges, MIN(m) AS min_m,
                SUM(m) AS sum_m
         FROM ce GROUP BY component)
SELECT sz AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(n_edges) AS BIGINT) AS n_edges,
       CAST(MIN(min_m) AS INTEGER) AS min_edge_match,
       ROUND(CAST(SUM(sum_m) AS DOUBLE)
             / (CAST(SUM(n_edges) AS DOUBLE) * {MINHASH_K}), 6)
           AS avg_edge_match,
       ROUND((2.0 * CAST(SUM(n_edges) AS DOUBLE))
             / ((CAST(COUNT(*) AS DOUBLE) * sz) * (sz - 1)), 6)
           AS edge_density
FROM cagg JOIN csize USING (component)
GROUP BY sz
""".strip(),
)
def q_dedup_cluster_chaining_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-CHAINING audit of the transitive near-dup clusters:
    connected components merge A-B and B-C into one cluster even when A
    and C share nothing (the known failure mode of
    transitive-closure dedup at scale — long chains glue unrelated docs
    and the min-id survivor misrepresents the tail). Per cluster-size
    band: how many clusters, how many LSH edges, the WEAKEST edge
    retained (min matching signature components — low means borderline
    pairs are doing the gluing), the mean edge similarity, and the edge
    DENSITY 2E/(s(s-1)) — 1.0 is a clique of true duplicates, ~2/s is
    a chain, exactly the clusters a curation pass should re-verify with
    exact Jaccard before dropping members.

    Determinism: edges and components are the integer LSH/star-rewrite
    machinery; per-band stats are integer sums with ONE double division
    at the output edge (products stay below 2^53, so even the double
    arithmetic is order-free). Plan: the checkpointed pair list feeds
    both CC and the edge stats (no second LSH pass); everything after
    is component-grain then size-grain hash aggs — at 100 TB the edge
    list is the bounded LSH candidate set, never all-pairs."""
    docs = _docs(spark, sf_dir)
    pairs_df, sigs = near_dup_pairs_cached(docs)
    pairs = pairs_df.filter(
        F.col("n_matching_components") >= CC_MIN_MATCH
    ).localCheckpoint()
    sigs.unpersist()
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )
    csize = comp.groupBy("component").agg(F.count("*").alias("sz"))
    ce = pairs.join(
        comp, pairs["doc_a"] == comp["doc_id"]
    ).select("component", F.col("n_matching_components").alias("m"))
    cagg = ce.groupBy("component").agg(
        F.count("*").alias("n_edges"),
        F.min("m").alias("min_m"),
        F.sum("m").alias("sum_m"),
    )
    joined = cagg.join(csize, "component")
    return joined.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("n_edges").cast("long").alias("n_edges"),
        F.min("min_m").cast("int").alias("min_edge_match"),
        F.round(
            F.sum("sum_m").cast("double")
            / (F.sum("n_edges").cast("double") * F.lit(MINHASH_K)),
            6,
        ).alias("avg_edge_match"),
        F.round(
            (F.lit(2.0) * F.sum("n_edges").cast("double"))
            / (
                (F.count("*").cast("double") * F.first("sz"))
                * (F.first("sz") - F.lit(1))
            ),
            6,
        ).alias("edge_density"),
    )


# --- detector agreement: MinHash-LSH vs SimHash ------------------------------


@register(
    "dedup_detector_agreement",
    oracle=f"""
WITH mh AS (
    SELECT doc_a, doc_b FROM ({{mh}}) t_mh
    WHERE n_matching_components >= {CC_MIN_MATCH}
),
sh AS (
    SELECT doc_a, doc_b FROM ({{sh}}) t_sh
),
u AS (
    SELECT COALESCE(m.doc_a, s.doc_a) AS doc_a,
           m.doc_a IS NOT NULL AS in_m,
           s.doc_a IS NOT NULL AS in_s
    FROM mh m FULL JOIN sh s
      ON m.doc_a = s.doc_a AND m.doc_b = s.doc_b
)
SELECT CAST(SUM(CASE WHEN in_m AND NOT in_s THEN 1 ELSE 0 END) AS BIGINT)
           AS n_minhash_only,
       CAST(SUM(CASE WHEN in_s AND NOT in_m THEN 1 ELSE 0 END) AS BIGINT)
           AS n_simhash_only,
       CAST(SUM(CASE WHEN in_m AND in_s THEN 1 ELSE 0 END) AS BIGINT)
           AS n_both
FROM u
""".strip(),
)
def q_dedup_detector_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-detector AGREEMENT audit: the MinHash-LSH near-dup pair
    set (at the CC retention threshold, jaccard_est >= 0.5) against
    the SimHash banded-Hamming pair set, partitioned into
    minhash-only / simhash-only / both. The two detectors measure
    different similarities (set-Jaccard of shingles vs weighted
    bit-consensus of the token multiset), so their disagreement region
    is exactly where a curation pipeline should spend exact-Jaccard
    verification budget — large one-sided counts mean the thresholds
    are mis-calibrated relative to each other.

    Determinism: both pair sets are the already-verified integer
    machinery; the partition counts are a full outer equi-join on the
    (doc_a, doc_b) key plus integer sums. The oracle embeds both
    registered oracles verbatim (the composition pattern of
    ann_recall_at_10) so the three queries can never drift. Plan: two
    bounded candidate joins (never all-pairs), one pair-keyed outer
    join, one 1-row agg. At 100 TB pair volume is the LSH candidate
    bound on each side; the outer join shuffles pair-grain rows only."""
    mh = (
        q_lsh_near_dup_pairs(spark, sf_dir)
        .filter(F.col("n_matching_components") >= CC_MIN_MATCH)
        .select("doc_a", "doc_b", F.lit(1).alias("in_m"))
    )
    sh = q_simhash_hamming_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_s")
    )
    u = mh.join(sh, ["doc_a", "doc_b"], "full_outer")
    return u.agg(
        F.sum(
            F.when(
                F.col("in_m").isNotNull() & F.col("in_s").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_minhash_only"),
        F.sum(
            F.when(
                F.col("in_s").isNotNull() & F.col("in_m").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_simhash_only"),
        F.sum(
            F.when(
                F.col("in_m").isNotNull() & F.col("in_s").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_both"),
    )


REGISTRY["dedup_detector_agreement"] = QuerySpec(
    name="dedup_detector_agreement",
    build=REGISTRY["dedup_detector_agreement"].build,
    oracle=REGISTRY["dedup_detector_agreement"].oracle.format(
        mh=REGISTRY["lsh_near_dup_pairs"].oracle,
        sh=REGISTRY["simhash_hamming_pairs"].oracle,
    ),
)


# --- exact set-similarity join with prefix filtering -------------------------

from supplier_performance_data_pipeline_spark.operators.dedup import (  # noqa: E402
    jaccard_prefix_join,
)

_PPJ_NUM, _PPJ_DEN = 3, 5  # Jaccard threshold 0.6


def _prefix_index_ctes(num: int, den: int) -> str:
    """DuckDB twin of operators/dedup.py::_prefix_index, shared by the
    Jaccard and containment oracles exactly as the Spark joins share
    the scaffolding: distinct shingle table, df counts, set sizes, and
    the per-doc prefix at threshold num/den. The two oracles differ
    only in their cand CTE and threshold — this fragment must stay
    one copy or the oracles drift from each other."""
    return f"""{_TOKS_CTE},
{_SHINGLES_CTE},
dt AS (
    SELECT DISTINCT doc_id, unnest(shingles) AS tok FROM sh_cte
),
gf AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok),
dl AS (SELECT doc_id, COUNT(*) AS len FROM dt GROUP BY doc_id),
pos AS (
    SELECT d.doc_id, d.tok, ROW_NUMBER() OVER (
        PARTITION BY d.doc_id ORDER BY g.df, d.tok) AS pos
    FROM dt d JOIN gf g USING (tok)
),
pfx AS (
    SELECT p.doc_id, p.tok FROM pos p JOIN dl USING (doc_id)
    WHERE p.pos <= dl.len
        - (({num} * dl.len + {den - 1}) // {den}) + 1
)"""


# Exact intersection count per candidate pair — the shared verify step
# (twin of operators/dedup.py::_pair_overlap_stats).
_PREFIX_INTER_CTE = """inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
    FROM cand c
    JOIN dt ta ON ta.doc_id = c.doc_a
    JOIN dt tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
    GROUP BY c.doc_a, c.doc_b
)"""


@register(
    "shingle_jaccard_prefix_join",
    oracle=f"""
WITH {_prefix_index_ctes(_PPJ_NUM, _PPJ_DEN)},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM pfx a JOIN pfx b ON a.tok = b.tok AND a.doc_id < b.doc_id
),
{_PREFIX_INTER_CTE}
SELECT i.doc_a, i.doc_b,
       CAST(i.ni AS BIGINT) AS n_common,
       CAST(la.len AS BIGINT) AS len_a,
       CAST(lb.len AS BIGINT) AS len_b,
       ROUND(CAST(i.ni AS DOUBLE) / (la.len + lb.len - i.ni), 6) AS jaccard
FROM inter i
JOIN dl la ON la.doc_id = i.doc_a
JOIN dl lb ON lb.doc_id = i.doc_b
WHERE {_PPJ_DEN} * i.ni >= {_PPJ_NUM} * (la.len + lb.len - i.ni)
""".strip(),
)
def q_shingle_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.6 pairs over 3-token shingle SETS via prefix
    filtering — the provably-COMPLETE exact counterpart to the
    probabilistic ``lsh_near_dup_pairs``: LSH misses true pairs with
    probability (1-s^r)^b, the prefix filter misses none (see
    operators/dedup.py::jaccard_prefix_join for the lemma and plan;
    completeness is also brute-force-verified in tests). Integer
    cross-multiplied threshold, integer intersection counts, one
    double division at the output edge."""
    return jaccard_prefix_join(
        _docs(spark, sf_dir), _PPJ_NUM, _PPJ_DEN
    )


# --- exact set-containment join (asymmetric partial-duplicate detection) ------

from supplier_performance_data_pipeline_spark.operators.dedup import (  # noqa: E402
    containment_prefix_join,
)

_CTJ_NUM, _CTJ_DEN = 4, 5  # containment threshold 0.8


@register(
    "shingle_containment_join",
    oracle=f"""
WITH {_prefix_index_ctes(_CTJ_NUM, _CTJ_DEN)},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM pfx a JOIN dt b ON a.tok = b.tok AND a.doc_id <> b.doc_id
),
{_PREFIX_INTER_CTE}
SELECT i.doc_a AS doc_contained, i.doc_b AS doc_container,
       CAST(i.ni AS BIGINT) AS n_common,
       CAST(la.len AS BIGINT) AS len_contained,
       CAST(lb.len AS BIGINT) AS len_container,
       ROUND(CAST(i.ni AS DOUBLE) / la.len, 6) AS containment
FROM inter i
JOIN dl la ON la.doc_id = i.doc_a
JOIN dl lb ON lb.doc_id = i.doc_b
WHERE {_CTJ_DEN} * i.ni >= {_CTJ_NUM} * la.len
""".strip(),
)
def q_shingle_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-CONTAINMENT >= 0.8 ordered pairs over 3-token shingle
    sets — the asymmetric dedup class ``shingle_jaccard_prefix_join``
    cannot express (a short doc quoted inside a much longer one has
    near-zero Jaccard but containment ~1): quotation / partial-
    duplicate / version-supersede detection for corpus curation. See
    operators/dedup.py::containment_prefix_join for the containment
    form of the prefix lemma (only the contained side is prefix-
    restricted) and the scale notes. Integer cross-multiplied
    threshold; one double division at the output edge."""
    return containment_prefix_join(
        _docs(spark, sf_dir), _CTJ_NUM, _CTJ_DEN
    )


# --- edit-distance verification of LSH candidates (fuzzy dedup) ---------------

# ASCII projection before the distance: Spark's levenshtein counts
# CHARACTERS while DuckDB's counts BYTES, so any non-ASCII char makes
# the raw distances disagree ('café' vs 'cafe': 1 char edit, 2 byte
# edits). Stripping non-ASCII (identical regex in Java and RE2) makes
# byte == char and the DP integer-exact in both engines; CJK-heavy
# near-dups are the char-n-gram detector's job, not this verifier's.
_ED_ASCII = "[^\\x01-\\x7F]"


@register(
    "dedup_edit_distance_verify",
    oracle=f"""
WITH cand AS (
    SELECT doc_a, doc_b FROM ({{pairs}}) p
    WHERE p.n_matching_components >= {CC_MIN_MATCH}
),
t AS (
    SELECT doc_id,
           regexp_replace(text, '{_ED_ASCII}', '', 'g') AS atext
    FROM documents
),
d AS (
    SELECT c.doc_a, c.doc_b,
           levenshtein(ta.atext, tb.atext) AS ed,
           length(ta.atext) AS la, length(tb.atext) AS lb
    FROM cand c
    JOIN t ta ON ta.doc_id = c.doc_a
    JOIN t tb ON tb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       CAST(ed AS INTEGER) AS edit_distance,
       CAST(la AS BIGINT) AS len_a,
       CAST(lb AS BIGINT) AS len_b,
       CASE WHEN GREATEST(la, lb) = 0 THEN 1.0
            ELSE ROUND(1.0 - CAST(ed AS DOUBLE) / GREATEST(la, lb), 6)
       END AS edit_similarity
FROM d
""".strip(),
)
def q_dedup_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE verification of the MinHash-LSH candidates — the
    second-opinion verifier fuzzy dedup pipelines run after set-based
    candidate generation: token-set detectors are blind to word ORDER
    and to sub-token edits, so a pair with high estimated Jaccard can
    still be a heavy rewrite. Levenshtein on the candidate pairs (never
    all-pairs — the DP is O(len²) per pair, affordable only because LSH
    bounds the pair count) gives the character-level ground truth:
    ``edit_similarity`` = 1 − d/max(len), 1.0 for identical texts.

    Cross-engine: both texts are ASCII-projected first (see _ED_ASCII
    note — Spark counts chars, DuckDB counts bytes; after projection
    the distances are the same integers), the oracle embeds the
    registered lsh_near_dup_pairs oracle verbatim (anti-drift
    composition), and the only double is the output-edge division.

    Plan: candidate join (bounded by the LSH pair count) + two
    broadcast-size text joins at sf; at 100 TB the text join shuffles
    on doc_id and the per-pair DP runs JVM-side in whole-stage codegen
    — no Python anywhere. Skewed mega-clusters bound the verifier the
    same way they bound the exact-Jaccard verify."""
    pairs = q_lsh_near_dup_pairs(spark, sf_dir).filter(
        F.col("n_matching_components") >= CC_MIN_MATCH
    ).select("doc_a", "doc_b")
    # The pair table is tiny in BYTES (AQE coalesces it to one
    # partition) but each row costs an O(len²) DP — CPU-heavy, not
    # size-heavy, which AQE's size heuristic cannot see. Round-robin
    # with an EXPLICIT count: a hash repartition on the pair key is
    # pruned as redundant with the dedup aggregate's exchange (whose
    # ENSURE_REQUIREMENTS shuffle AQE then coalesces to one task),
    # while REPARTITION_BY_NUM survives both rules, so the DPs run on
    # every core (measured 20s -> ~2s at sf0.1 on local[32]).
    pairs = pairs.repartition(spark.sparkContext.defaultParallelism)
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace(F.col("text"), _ED_ASCII, "").alias("atext"),
    )
    ta = t.select(F.col("doc_id").alias("doc_a"), F.col("atext").alias("ta"))
    tb = t.select(F.col("doc_id").alias("doc_b"), F.col("atext").alias("tb"))
    ed = F.levenshtein(F.col("ta"), F.col("tb"))
    mx = F.greatest(F.length("ta"), F.length("tb"))
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            ed.cast("int").alias("edit_distance"),
            F.length("ta").cast("long").alias("len_a"),
            F.length("tb").cast("long").alias("len_b"),
            F.when(mx == 0, F.lit(1.0))
            .otherwise(
                F.round(F.lit(1.0) - ed.cast("double") / mx, 6)
            )
            .alias("edit_similarity"),
        )
    )


REGISTRY["dedup_edit_distance_verify"] = QuerySpec(
    name="dedup_edit_distance_verify",
    build=REGISTRY["dedup_edit_distance_verify"].build,
    oracle=REGISTRY["dedup_edit_distance_verify"].oracle.format(
        pairs=REGISTRY["lsh_near_dup_pairs"].oracle
    ),
)


# --- sorted-neighborhood blocking (the third candidate-generation family) -----

_SNM_WINDOW = 3  # pair each doc with the next w docs in sort order
_SNM_BLK = 2  # block key: first chars of the folded text


@register(
    "dedup_sorted_neighborhood",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
dt AS (
    SELECT DISTINCT doc_id, unnest(shingles) AS tok FROM sh_cte
),
dl AS (SELECT doc_id, COUNT(*) AS len FROM dt GROUP BY doc_id),
f AS (SELECT doc_id, {_CHAR_FOLD} AS s FROM documents),
r AS (
    SELECT doc_id, s, substr(s, 1, {_SNM_BLK}) AS blk,
           ROW_NUMBER() OVER (
               PARTITION BY substr(s, 1, {_SNM_BLK}) ORDER BY s, doc_id
           ) AS rn
    FROM f
),
cand AS (
    SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
           GREATEST(a.doc_id, b.doc_id) AS doc_b,
           CAST(b.rn - a.rn AS INTEGER) AS window_dist
    FROM r a JOIN r b
      ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND {_SNM_WINDOW}
),
{_PREFIX_INTER_CTE}
SELECT c.doc_a, c.doc_b, c.window_dist,
       CAST(i.ni AS BIGINT) AS n_common,
       CAST(la.len AS BIGINT) AS len_a,
       CAST(lb.len AS BIGINT) AS len_b,
       ROUND(CAST(i.ni AS DOUBLE) / (la.len + lb.len - i.ni), 6) AS jaccard
FROM cand c
JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN dl la ON la.doc_id = c.doc_a
JOIN dl lb ON lb.doc_id = c.doc_b
""".strip(),
)
def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo SIGMOD '95) —
    the third candidate-generation family next to LSH (probabilistic)
    and prefix filtering (exact): sort records by a fuzzy key (the
    folded text), pair each record with its next w={w} neighbors in
    sort order, verify with exact shingle-set Jaccard. Near-identical
    texts sort adjacent, so a TINY candidate budget (≤ w·N pairs,
    linear!) catches prefix-sharing near-dups that differ too much for
    banding thresholds — and the per-pair cost bound is what big
    record-linkage systems prize about SNM.

    Candidates only EMIT if the pair shares ≥ 1 shingle (the verify
    join is the intersection count — identical inner-join semantics in
    both engines). Determinism: folded-text sort is UTF-8 binary order
    in both engines with doc_id as total tie-break; counts are
    integers; one double division at the edge.

    Plan: the sort is a WINDOW PARTITIONED BY the {b}-char block key —
    never a global sort: blocks are the scale unit (the classic SNM
    multi-pass variant = several block keys), so at 100 TB each block
    sorts locally after one hash shuffle, and the window-distance
    self-join is a block-bounded equi-join. Verify reuses the shared
    shingle table + intersection machinery of the prefix-join family."""
    from pyspark.sql.window import Window

    from supplier_performance_data_pipeline_spark.operators.dedup import (
        _pair_overlap_stats,
        fold_text,
        shingle_sets,
    )

    docs = _docs(spark, sf_dir)
    dt = (
        shingle_sets(docs)
        .select(
            "doc_id", F.explode(F.array_distinct("shingles")).alias("tok")
        )
        .localCheckpoint()
    )
    dl = dt.groupBy("doc_id").agg(F.count("*").alias("len"))
    f = docs.select("doc_id", fold_text(F.col("text")).alias("s"))
    blk = F.substring("s", 1, _SNM_BLK)
    w = Window.partitionBy("blk").orderBy("s", "doc_id")
    r = f.select("doc_id", "s", blk.alias("blk")).withColumn(
        "rn", F.row_number().over(w)
    )
    a = r.select(
        F.col("doc_id").alias("id_a"), "blk", F.col("rn").alias("rn_a")
    )
    b = r.select(
        F.col("doc_id").alias("id_b"),
        F.col("blk").alias("blk_b"),
        F.col("rn").alias("rn_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("rn_b") - F.col("rn_a")).between(1, _SNM_WINDOW),
        )
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            (F.col("rn_b") - F.col("rn_a")).cast("int").alias("window_dist"),
        )
    )
    stats = _pair_overlap_stats(
        cand.select("doc_a", "doc_b").distinct(), dt, dl
    )
    return (
        cand.join(stats, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "window_dist",
            F.col("ni").cast("long").alias("n_common"),
            F.col("la").cast("long").alias("len_a"),
            F.col("lb").cast("long").alias("len_b"),
            F.round(
                F.col("ni").cast("double")
                / (F.col("la") + F.col("lb") - F.col("ni")),
                6,
            ).alias("jaccard"),
        )
    )


q_dedup_sorted_neighborhood.__doc__ = q_dedup_sorted_neighborhood.__doc__.format(
    w=_SNM_WINDOW, b=_SNM_BLK
)


# --- hybrid retrieval: BM25 + embedding cosine fused by RRF -------------------

_RRF_TERMS = ["hash", "vector", "stream"]  # the fixed lexical query
_RRF_QVEC = 0  # query embedding = vec_id 0 (ids align with doc_ids)
_RRF_K = 60  # the canonical RRF dampening constant
_RRF_POOL = 50  # per-arm candidate list depth fused (top-k per arm)
_RRF_TOP = 10

_RRF_DOT = (
    "list_sum(list_transform(range(0, len(e.embedding)), "
    "i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(q.embedding[i+1] AS DOUBLE)))"
)
_RRF_NRM = (
    "sqrt(list_sum(list_transform(range(0, len({t}.embedding)), "
    "i -> CAST({t}.embedding[i+1] AS DOUBLE) * CAST({t}.embedding[i+1] AS DOUBLE))))"
)


@register(
    "hybrid_rrf_retrieval",
    oracle=f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, unnest(toks) AS term FROM toks_cte),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tf GROUP BY doc_id),
n AS (SELECT COUNT(*) AS n_docs,
             CAST(CAST(SUM(len(toks)) AS BIGINT) AS DOUBLE)
                 / COUNT(*) AS avgdl
      FROM toks_cte),
qtf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tf
    WHERE term IN ({_in_list(_RRF_TERMS)}) GROUP BY doc_id, term
),
dfc AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY term),
lex AS (
    SELECT qtf.doc_id,
           CAST(SUM(CAST(floor(ROUND(
               ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
               * (tf * ({_BM25_K1} + 1.0))
               / (tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * (dl / avgdl))),
               6) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s
    FROM qtf JOIN dfc USING (term) JOIN dl ON dl.doc_id = qtf.doc_id
    CROSS JOIN n
    GROUP BY qtf.doc_id
),
lexr AS (
    SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id)
        AS INTEGER) AS lex_rank
    FROM lex QUALIFY lex_rank <= {_RRF_POOL}
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = {_RRF_QVEC}),
sem AS (
    SELECT e.vec_id AS doc_id,
           ROUND({_RRF_DOT} / ({_RRF_NRM.format(t='e')} * {_RRF_NRM.format(t='q')}), 6)
               AS cos
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {_RRF_QVEC} AND {_RRF_NRM.format(t='e')} > 0
      AND {_RRF_NRM.format(t='q')} > 0
),
semr AS (
    SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
        AS INTEGER) AS sem_rank
    FROM sem QUALIFY sem_rank <= {_RRF_POOL}
),
fused AS (
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           COALESCE(l.lex_rank, 0) AS lex_rank,
           COALESCE(s.sem_rank, 0) AS sem_rank,
           ROUND(
               (CASE WHEN l.lex_rank IS NOT NULL
                     THEN 1.0 / ({_RRF_K} + l.lex_rank) ELSE 0.0 END)
               + (CASE WHEN s.sem_rank IS NOT NULL
                       THEN 1.0 / ({_RRF_K} + s.sem_rank) ELSE 0.0 END),
               6) AS rrf_score
    FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
)
SELECT doc_id, lex_rank, sem_rank, rrf_score FROM fused
ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_TOP}
""".strip(),
)
def q_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL with Reciprocal-Rank Fusion (Cormack, Clarke &
    Büttcher SIGIR '09) — the standard modern search stack in one
    query: a lexical arm (summed BM25 of the fixed query terms over the
    inverted tf index) and a semantic arm (cosine against a fixed query
    embedding) each produce a top-{pool} ranked list, and RRF fuses
    them by Σ 1/({k}+rank) — rank-space fusion needs no score
    calibration between arms, which is exactly why RRF won.

    Determinism: per-term BM25 values are rounded then scaled to exact
    MICRO-SCORE integers before the per-doc SUM (double addition is
    not associative; integer addition is — the money-recipe move), so
    both engines rank identical BIGINTs; the semantic arm ranks the
    ROUNDED cosine (kNN-join precedent); ranks are integers; the RRF
    sum is two fixed-order divisions at the output edge. Docs outside
    an arm's pool carry rank 0 (sentinel, no NULLs cross the driver
    boundary).

    Plan: the tf explode collapses to doc-grain for dl and filters to
    THREE terms for the lexical scores (predicate inside the explode —
    the inverted-index probe); each arm's pool is a top-k
    (TakeOrderedAndProject, never a full sort), the pools are
    {pool}-row driver-independent sets, and fusion is a {pool}x{pool}
    outer join of two tiny lists. At 100 TB the only fact-scale work
    is the tf agg and one embedding scan; per-query cost after
    indexing is bucket-probe sized, and a real system would swap the
    fixed query for a parameter without changing the plan shape."""
    from supplier_performance_data_pipeline_spark.operators.similarity import (
        _as_double,
        dot,
    )
    from supplier_performance_data_pipeline_spark.operators.textops import (
        tokens,
    )
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).localCheckpoint()
    tf = toks.select("doc_id", F.explode("toks").alias("term"))
    dl = tf.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n = toks.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.size("toks")).cast("long").cast("double")
            / F.count("*")
        ).alias("avgdl"),
    )
    qtf = (
        tf.filter(F.col("term").isin(_RRF_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfc = qtf.groupBy("term").agg(F.count("*").alias("df"))
    k1, b = _BM25_K1, _BM25_B
    per_term = F.round(
        F.log(
            (F.col("n_docs").cast("double") - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
        )
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))),
        6,
    )
    micro = F.floor(per_term * 1000000 + 0.5).cast("long")
    lex = (
        qtf.join(F.broadcast(dfc), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .select("doc_id", micro.alias("ms"))
        .groupBy("doc_id")
        .agg(F.sum("ms").cast("long").alias("s"))
    )
    wl = Window.orderBy(F.desc("s"), F.asc("doc_id"))
    lexr = (
        lex.orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(_RRF_POOL)
        .withColumn("lex_rank", F.row_number().over(wl).cast("int"))
        .select("doc_id", "lex_rank")
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ev = emb.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    qv = F.broadcast(
        ev.filter(
            (F.col("vec_id") == _RRF_QVEC) & (F.col("nrm") > 0)
        ).select(F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    )
    sem = (
        ev.filter((F.col("vec_id") != _RRF_QVEC) & (F.col("nrm") > 0))
        .crossJoin(qv)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6
            ).alias("cos"),
        )
    )
    ws = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    semr = (
        sem.orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(_RRF_POOL)
        .withColumn("sem_rank", F.row_number().over(ws).cast("int"))
        .select(F.col("doc_id").alias("sdoc"), "sem_rank")
    )
    fused = lexr.join(
        semr, lexr.doc_id == semr.sdoc, "full_outer"
    ).select(
        F.coalesce("doc_id", "sdoc").alias("doc_id"),
        F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
        F.coalesce("sem_rank", F.lit(0)).cast("int").alias("sem_rank"),
        F.round(
            F.when(
                F.col("lex_rank").isNotNull(),
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("sem_rank").isNotNull(),
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("sem_rank")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(_RRF_TOP)


q_hybrid_rrf_retrieval.__doc__ = q_hybrid_rrf_retrieval.__doc__.format(
    pool=_RRF_POOL, k=_RRF_K
)


# --- two-stage retrieval: RRF recall stage + expensive re-rank ---------------

_RERANK_NT = len(_RRF_TERMS)


@register(
    "hybrid_rerank_stage2",
    oracle=f"""
WITH stage1 AS ({{rrf}}),
r1 AS (
    SELECT doc_id, CAST(ROW_NUMBER() OVER (
        ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rrf_rank
    FROM stage1
),
{_TOKS_CTE},
tf AS (SELECT doc_id, unnest(toks) AS term FROM toks_cte),
cov AS (
    SELECT doc_id, COUNT(DISTINCT term) AS c FROM tf
    WHERE term IN ({_in_list(_RRF_TERMS)})
      AND doc_id IN (SELECT doc_id FROM r1)
    GROUP BY doc_id
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = {_RRF_QVEC}),
cosc AS (
    SELECT e.vec_id AS doc_id,
           ROUND({_RRF_DOT} / ({_RRF_NRM.format(t='e')} * {_RRF_NRM.format(t='q')}), 6)
               AS cos
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id IN (SELECT doc_id FROM r1)
      AND {_RRF_NRM.format(t='e')} > 0 AND {_RRF_NRM.format(t='q')} > 0
),
scored AS (
    SELECT r1.doc_id, r1.rrf_rank,
           ROUND(COALESCE(cosc.cos, 0.0)
                 + COALESCE(cov.c, 0) / CAST({_RERANK_NT} AS DOUBLE),
                 6) AS rerank_score
    FROM r1 LEFT JOIN cosc ON r1.doc_id = cosc.doc_id
    LEFT JOIN cov ON r1.doc_id = cov.doc_id
)
SELECT doc_id, rrf_rank,
       CAST(ROW_NUMBER() OVER (ORDER BY rerank_score DESC, doc_id)
           AS INTEGER) AS final_rank,
       rerank_score
FROM scored
""".strip(),
)
def q_hybrid_rerank_stage2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-STAGE RETRIEVAL — the production search/RAG serving shape:
    stage 1 (``hybrid_rrf_retrieval``, embedded verbatim so the stages
    can never drift) recalls a cheap top-{top} candidate pool; stage 2
    re-scores ONLY those candidates with a scorer too expensive to run
    corpus-wide, and re-ranks. The stand-in stage-2 scorer is
    deterministic and oracle-expressible — exact full-dimension cosine
    plus query-term coverage (fraction of the {nt} query terms the doc
    contains) — and sits at the seam where a real system plugs a
    cross-encoder model: that swap is an Arrow ``mapInPandas`` over
    (query_text, doc_text) batches, exactly the multimodal codec
    plug-point pattern (operators/multimodal.py), and changes nothing
    about the plan shape below.

    Plan: stage 1's pools are top-k cuts; the candidate set (≤{top}
    rows) BROADCASTS into both stage-2 probes, so the embedding scan
    and the token explode are filtered by broadcast-hash semi-joins —
    per-query stage-2 cost is candidate-bounded, never corpus-bounded.
    Lexical-only candidates take cosine 0, semantic-only take coverage
    0 (left joins + COALESCE in BOTH engines — no NULLs cross the
    driver boundary)."""
    from pyspark.sql.window import Window

    from supplier_performance_data_pipeline_spark.operators.similarity import (
        _as_double,
        dot,
    )
    from supplier_performance_data_pipeline_spark.operators.textops import (
        tokens,
    )
    from supplier_performance_data_pipeline_spark.plans.registry import (
        REGISTRY as _REG,
    )

    stage1 = _REG["hybrid_rrf_retrieval"].build(spark, sf_dir)
    wr = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    r1 = stage1.select(
        "doc_id", F.row_number().over(wr).cast("int").alias("rrf_rank")
    )
    docs = _docs(spark, sf_dir)
    cov = (
        docs.join(F.broadcast(r1.select("doc_id")), "doc_id")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term").isin(_RRF_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("c"))
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ev = emb.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    qv = F.broadcast(
        ev.filter(
            (F.col("vec_id") == _RRF_QVEC) & (F.col("nrm") > 0)
        ).select(F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    )
    cosc = (
        ev.join(
            F.broadcast(r1.select(F.col("doc_id").alias("vec_id"))),
            "vec_id",
        )
        .filter(F.col("nrm") > 0)
        .crossJoin(qv)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")),
                6,
            ).alias("cos"),
        )
    )
    scored = (
        r1.join(cosc, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "rrf_rank",
            F.round(
                F.coalesce("cos", F.lit(0.0))
                + F.coalesce("c", F.lit(0)) / F.lit(float(_RERANK_NT)),
                6,
            ).alias("rerank_score"),
        )
    )
    wf = Window.orderBy(F.desc("rerank_score"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "rrf_rank",
        F.row_number().over(wf).cast("int").alias("final_rank"),
        "rerank_score",
    )


q_hybrid_rerank_stage2.__doc__ = q_hybrid_rerank_stage2.__doc__.format(
    top=_RRF_TOP, nt=_RERANK_NT
)

# Stage 1 is the registered RRF oracle verbatim — the anti-drift
# composition pattern (knn_join_recall, ann_ivfpq_recall_audit).
from supplier_performance_data_pipeline_spark.plans.registry import (  # noqa: E402
    REGISTRY as _RERANK_REG,
)

_RERANK_REG["hybrid_rerank_stage2"] = _RERANK_REG[
    "hybrid_rerank_stage2"
].__class__(
    name="hybrid_rerank_stage2",
    build=_RERANK_REG["hybrid_rerank_stage2"].build,
    oracle=_RERANK_REG["hybrid_rerank_stage2"].oracle.format(
        rrf=_RERANK_REG["hybrid_rrf_retrieval"].oracle
    ),
)


# --- cross-encoder seam: the Arrow swap point, actually exercised (round-8) ---

_CE_SCALE = 1_000_000


@register(
    "hybrid_rerank_cross_encoder_seam",
    oracle=f"""
WITH stage1 AS ({{rrf}}),
r1 AS (
    SELECT doc_id, CAST(ROW_NUMBER() OVER (
        ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rrf_rank
    FROM stage1
),
{_TOKS_CTE},
d AS (
    SELECT doc_id,
           len(list_distinct(toks)) AS ndt,
           len(list_filter(list_distinct(toks),
               x -> x IN ({_in_list(_RRF_TERMS)}))) AS shared
    FROM toks_cte WHERE doc_id IN (SELECT doc_id FROM r1)
),
scored AS (
    SELECT r1.doc_id, r1.rrf_rank,
           (COALESCE(d.shared, 0) * {_CE_SCALE})
               // (1 + COALESCE(d.ndt, 0)) AS ce_score_e6
    FROM r1 LEFT JOIN d ON r1.doc_id = d.doc_id
)
SELECT doc_id, rrf_rank,
       CAST(ROW_NUMBER() OVER (ORDER BY ce_score_e6 DESC, doc_id)
           AS INTEGER) AS ce_rank,
       CAST(ce_score_e6 AS DOUBLE) / {_CE_SCALE}.0 AS ce_score
FROM scored
""".strip(),
)
def q_hybrid_rerank_cross_encoder_seam(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The cross-encoder SWAP POINT of ``hybrid_rerank_stage2``,
    exercised for real (round-7 verdict #8): stage-2 scoring here goes
    THROUGH an Arrow ``mapInPandas`` over (doc_id, text) batches — the
    exact seam where a production system loads a cross-encoder model
    per executor and scores (query, doc) pairs — with a DETERMINISTIC
    toy scorer standing in for the model so the path stays
    oracle-checkable: score = shared-distinct-query-terms scaled by
    {CE_SCALE} and floor-divided by (1 + distinct doc tokens), all
    integer until one double division at the edge. The Python arm
    tokenizes with the SAME regex/lower/distinct pipeline as the SQL
    arm's toks_cte, so both engines score identically — the
    differential check certifies the Arrow plumbing (batch schema,
    candidate-bounded input, integer contract), which is what a model
    swap must preserve.

    Plan: stage 1 (embedded verbatim, anti-drift) recalls the
    candidate pool; candidates broadcast into the doc scan, so the
    Python stage sees ONLY candidate rows — per-query cost is
    candidate-bounded, and the final rank window runs over that same
    bounded list. Oracle authored per ORACLES.md (integer score grid,
    one double division at the edge, total-ordered ranks)."""
    import re as _re

    import pandas as pd  # noqa: F401 (mapInPandas arm)

    from pyspark.sql.window import Window
    from supplier_performance_data_pipeline_spark.plans.registry import (
        REGISTRY as _REG,
    )

    stage1 = _REG["hybrid_rrf_retrieval"].build(spark, sf_dir)
    wr = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    r1 = stage1.select(
        "doc_id", F.row_number().over(wr).cast("int").alias("rrf_rank")
    )
    docs = _docs(spark, sf_dir)
    cand_docs = r1.select("doc_id").join(
        docs.select("doc_id", "text"), "doc_id", "left"
    )
    qset = frozenset(_RRF_TERMS)
    rx_src = TOKEN_SPLIT_RX

    def score_batches(batches):
        import pandas as _pd

        rx = _re.compile(rx_src)
        for pdf in batches:
            tok_sets = pdf["text"].map(
                lambda t: {w for w in rx.split((t or "").lower()) if w}
            )
            shared = tok_sets.map(lambda s: len(s & qset))
            ndt = tok_sets.map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ce_score_e6": (
                        shared * _CE_SCALE // (1 + ndt)
                    ).astype("int64"),
                }
            )

    scored = cand_docs.mapInPandas(
        score_batches, schema="doc_id long, ce_score_e6 long"
    )
    wf = Window.orderBy(F.desc("ce_score_e6"), F.asc("doc_id"))
    return (
        r1.join(scored, "doc_id")
        .select(
            "doc_id",
            "rrf_rank",
            F.row_number().over(wf).cast("int").alias("ce_rank"),
            (F.col("ce_score_e6").cast("double") / F.lit(float(_CE_SCALE)))
            .alias("ce_score"),
        )
    )


q_hybrid_rerank_cross_encoder_seam.__doc__ = (
    q_hybrid_rerank_cross_encoder_seam.__doc__.format(CE_SCALE=_CE_SCALE)
)

_RERANK_REG["hybrid_rerank_cross_encoder_seam"] = _RERANK_REG[
    "hybrid_rerank_cross_encoder_seam"
].__class__(
    name="hybrid_rerank_cross_encoder_seam",
    build=_RERANK_REG["hybrid_rerank_cross_encoder_seam"].build,
    oracle=_RERANK_REG["hybrid_rerank_cross_encoder_seam"].oracle.format(
        rrf=_RERANK_REG["hybrid_rrf_retrieval"].oracle
    ),
)


# --- incremental dedup: new batch vs existing index ---------------------------

from supplier_performance_data_pipeline_spark.operators.sampling import (  # noqa: E402
    md5_mod as _incr_md5_mod,
    md5_mod_sql as _incr_md5_mod_sql,
)

_INCR_SALT = "incr|"
_INCR_MOD = 10  # bucket 0 (~10%) plays the newly-arrived batch

_INCR_IS_BATCH = (
    f"CASE WHEN {_incr_md5_mod_sql('CAST(doc_id AS VARCHAR)', _INCR_SALT, _INCR_MOD)} = 0 "
    "THEN 1 ELSE 0 END"
)


@register(
    "dedup_incremental_candidates",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
m AS (SELECT bands.*, {_INCR_IS_BATCH} AS is_batch FROM bands)
SELECT a.doc_id AS batch_doc, b.doc_id AS index_doc,
       CAST(({" + ".join(f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(MINHASH_K))})
            AS INTEGER) AS n_matching_components
FROM m a JOIN m b
  ON a.is_batch = 1 AND b.is_batch = 0
 AND ({" OR ".join(f"a.band{b} = b.band{b}" for b in range(LSH_BANDS))})
""".strip(),
)
def q_dedup_incremental_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the production ingest shape: a newly-arrived
    batch (hash bucket 0, ~{pct}% of docs, the engine-wide md5_mod
    membership so the split reproduces everywhere) is checked against
    the EXISTING index only. Index-vs-index pairs are never generated —
    at 100 TB that is almost all of the quadratic candidate work and it
    was already paid when those docs arrived; per-ingest cost is
    O(batch x bucket-overlap), which is what makes continuous corpus
    ingestion affordable.

    Output: ordered (batch_doc, index_doc) candidates with the exact
    integer matching-component count (same verified surface as
    ``lsh_near_dup_pairs`` — the double ratio stays in-engine).

    Plan: ONE signature pass for all docs (localCheckpoint, consumed by
    both sides' band explodes), banded bucket equi-join probe-vs-index
    with the verify INLINE (operators/dedup.py::verified_pairs_between
    — the band explodes carry the signature components, so no join-back
    onto either side's signature table). At 100 TB the index's banded
    table — (band, band_hash, mh0..mh7) bucketed by band hash — is the
    COMPLETE persistent artifact (written once); each batch shuffles
    only itself."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        minhash_signatures,
        verified_pairs_between,
    )

    sigs = minhash_signatures(_docs(spark, sf_dir)).localCheckpoint()
    is_batch = _incr_md5_mod(F.col("doc_id"), _INCR_SALT, _INCR_MOD) == 0
    return verified_pairs_between(
        sigs.filter(is_batch), sigs.filter(~is_batch)
    ).select(
        F.col("doc_a").alias("batch_doc"),
        F.col("doc_b").alias("index_doc"),
        "n_matching_components",
    )


q_dedup_incremental_candidates.__doc__ = (
    q_dedup_incremental_candidates.__doc__.format(pct=100 // _INCR_MOD)
)


@register(
    "dedup_components_incremental",
    oracle=None,  # assigned right below: the FULL-RECOMPUTE oracle, verbatim
)
def q_dedup_components_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental COMPONENT-table maintenance on a two-batch replay
    (r9 VERDICT #5) — the missing scale piece over the persistent LSH
    index: when a batch lands, the stored components are UPDATED, not
    recomputed. The oracle is ``dedup_components``'s full-corpus CC
    unroll VERBATIM, so the driver hash proves the incremental path
    equals the from-scratch recompute exactly.

    Replay: the engine-wide md5_mod bucket 0 (~10% of docs, same split
    as ``dedup_incremental_candidates``) plays the newly-arrived
    batch; the rest is the existing corpus whose COMPONENT table
    (``doc_components``) is the stored state. The batch contributes
    exactly the pairs a full recompute would add — LSH pairs decompose
    by membership since signatures are per-doc: batch-vs-index probe
    hits (``verified_pairs_between`` over the persistent banded index,
    verify inline) plus batch-internal edges
    (``near_dup_component_edges``, exact-collapse-first). Then
    ``incremental_components`` star-contracts each endpoint to its
    stored root and re-converges ONLY the contracted graph — new
    vertices + touched roots, batch-scale edge mass; settled
    components pass through a single relabel join. At 100 TB the crawl
    is always incremental, so per-ingest graph cost must track the
    batch's blast radius, not corpus age — the scale probe
    (bench_dedup_sf1.py, INCR term) records contracted-vs-full
    edge/vertex counts to pin that."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        minhash_signatures,
        near_dup_component_edges,
        verified_pairs_between,
    )
    from supplier_performance_data_pipeline_spark.operators.graph import (
        incremental_components,
    )

    docs = _docs(spark, sf_dir)
    is_batch = _incr_md5_mod(F.col("doc_id"), _INCR_SALT, _INCR_MOD) == 0
    index_docs = docs.filter(~is_batch)
    batch_docs = docs.filter(is_batch)
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        _run_concurrent,
    )

    # r13: the stored-state CC loop (eager star rounds inside
    # doc_components) and the signature-table materialization are
    # independent — run them as concurrent driver threads (guide
    # §2.6); each result is a deterministic function of its own input.
    # old_labels: the stored component table of the pre-batch corpus.
    # The batch's new edges: cross probe hits against the persistent
    # index + batch-internal collapse-first edges. min_match filters
    # cross pairs to the same verify bar the full graph uses.
    old_labels, sigs = _run_concurrent(
        lambda: doc_components(index_docs, min_match=CC_MIN_MATCH),
        lambda: minhash_signatures(docs).localCheckpoint(),
    )
    cross = (
        verified_pairs_between(
            sigs.filter(is_batch), sigs.filter(~is_batch)
        )
        .filter(F.col("n_matching_components") >= CC_MIN_MATCH)
        .select("doc_a", "doc_b")
    )
    within = near_dup_component_edges(batch_docs, min_match=CC_MIN_MATCH)
    out = incremental_components(
        old_labels, cross.unionByName(within)
    )
    return out.select(F.col("id").alias("doc_id"), "component")


REGISTRY["dedup_components_incremental"] = QuerySpec(
    name="dedup_components_incremental",
    build=REGISTRY["dedup_components_incremental"].build,
    oracle=REGISTRY["dedup_components"].oracle,
)


@register(
    "corpus_curation_incremental",
    oracle=None,  # assigned right below: the FULL-CURATION oracle, verbatim
)
def q_corpus_curation_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL maintenance of the full curation composite (r10
    VERDICT #5) — the last recompute-per-run derived artifact becomes
    update-on-ingest. Two-batch replay, oracle =
    ``corpus_full_curation``'s full-corpus SQL VERBATIM, so the driver
    hash proves the incremental path equals the from-scratch pipeline
    exactly — the same equality pattern as
    ``dedup_components_incremental`` / ``ann_index_incremental_add``.

    The stored state after batch 1 (the non-bucket-0 corpus) is every
    per-stage artifact the pipeline already persists: the scored
    PROFILE table, the exact-dedup SURVIVOR map (fingerprint ->
    min doc_id), the COMPONENT table, the banded LSH index, the eval
    N-GRAM set, and the CONTAMINATED-doc list. When the batch lands,
    per-doc text work (tokenize/score/shingle/minhash) runs over the
    BATCH ONLY; every stage then merges relationally:

      profile   := stored ∪ profile(batch)           (per-row pure)
      survivors := min-merge of stored map + batch fingerprints —
                   min(min(old), min(batch)) = min(all), so the merge
                   is exact at artifact grain
      components:= ``incremental_components`` over stored labels +
                   batch edges (cross probe hits vs the persistent
                   banded index + batch-internal collapse-first edges)
      decon     := set decomposition of the contamination join:
                   (T_old x E_old stored) ∪ (T_old x ΔE) ∪
                   (T_batch x E_full) — each new term batch-bounded
                   on one side, and eval/ΔE stay broadcast-sized
      gates     := recomputed on merged artifact-grain tables (cheap
                   joins/filters, no text reprocessing)

    At 100 TB the crawl is always incremental: per-ingest curation
    cost must track the batch, not corpus age — the expensive per-doc
    HOF scoring and the quadratic-avoiding LSH work here run over
    ~10% of docs, while the merges move artifact-grain rows only."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        minhash_signatures,
        near_dup_component_edges,
        verified_pairs_between,
    )
    from supplier_performance_data_pipeline_spark.operators.graph import (
        incremental_components,
    )

    docs = _docs(spark, sf_dir)
    is_batch = _incr_md5_mod(F.col("doc_id"), _INCR_SALT, _INCR_MOD) == 0
    index_docs = docs.filter(~is_batch)
    batch_docs = docs.filter(is_batch)

    def profile_of(d: DataFrame) -> DataFrame:
        t = F.col("toks")
        return (
            d.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
            .select(
                "doc_id",
                F.size(t).cast("long").alias("n_tokens"),
                F.round(
                    quality_score_t(F.col("text"), t), 6
                ).alias("quality_score"),
                lang_id_t(t).alias("lang_pred"),
                fingerprint_t(t).alias("fingerprint"),
            )
            .localCheckpoint()
        )

    from supplier_performance_data_pipeline_spark.operators.clustering import (
        _run_concurrent,
    )

    # r13: the four eager sub-chains below are mutually independent —
    # the two profile materializations, the signature table, and the
    # stored-label CC loop (doc_components runs its star rounds
    # eagerly inside the call) — so they run as concurrent driver
    # threads (guide §2.6). Each output is a deterministic function of
    # its own input; concurrency changes wall-clock only.
    profile_1, profile_2, sigs, old_labels = _run_concurrent(
        lambda: profile_of(index_docs),  # stored artifact
        lambda: profile_of(batch_docs),  # the ingest's per-doc work
        lambda: minhash_signatures(docs).localCheckpoint(),
        lambda: doc_components(index_docs, min_match=CC_MIN_MATCH),
    )
    profile_full = profile_1.unionByName(profile_2)
    # Survivor-map merge: stored (fingerprint, min id) rows + the
    # batch's profile rows through ONE min-agg — exact because min
    # composes; cost is batch + touched-fingerprint grain.
    kept_1 = profile_1.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id")
    )
    kept_full = (
        kept_1.unionByName(profile_2.select("fingerprint", "doc_id"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    # Component maintenance: stored labels + batch-scale edge mass
    # (identical machinery to dedup_components_incremental); the
    # stored-label CC and the signature table materialized above.
    cross = (
        verified_pairs_between(
            sigs.filter(is_batch), sigs.filter(~is_batch)
        )
        .filter(F.col("n_matching_components") >= CC_MIN_MATCH)
        .select("doc_a", "doc_b")
    )
    within = near_dup_component_edges(batch_docs, min_match=CC_MIN_MATCH)
    nd_drop = (
        incremental_components(old_labels, cross.unionByName(within))
        .filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias("doc_id"))
    )
    # Decontamination by set decomposition: contaminated(T, E) with
    # T = T_old ∪ T_batch, E = E_old ∪ ΔE splits into three joins —
    # the stored report, old-train vs the NEW eval n-grams, and the
    # batch's train docs vs the full eval set.
    bkt = hash_bucket(F.col("doc_id"), _DECON_SEED)
    e_old = eval_ngram_set(
        index_docs.filter(bkt < _FULL_THR), n=_DECON_N
    )  # stored artifact
    e_new = eval_ngram_set(batch_docs.filter(bkt < _FULL_THR), n=_DECON_N)
    e_full = e_old.unionByName(e_new).distinct()
    t_old = index_docs.filter(bkt >= _FULL_THR)
    cont_stored = contamination_report(t_old, e_old, n=_DECON_N).select(
        "doc_id"
    )  # stored artifact
    cont_old_delta = contamination_report(t_old, e_new, n=_DECON_N).select(
        "doc_id"
    )
    cont_batch = contamination_report(
        batch_docs.filter(bkt >= _FULL_THR), e_full, n=_DECON_N
    ).select("doc_id")
    contaminated = cont_stored.unionByName(cont_old_delta).unionByName(
        cont_batch
    )
    final = (
        profile_full.join(kept_full.select("doc_id"), "doc_id")
        .join(nd_drop, "doc_id", "left_anti")
        .filter(bkt >= _FULL_THR)
        .join(contaminated, "doc_id", "left_anti")
        .filter(F.col("quality_score") >= 0.4)
    )
    return final.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
    )


REGISTRY["corpus_curation_incremental"] = QuerySpec(
    name="corpus_curation_incremental",
    build=REGISTRY["corpus_curation_incremental"].build,
    oracle=REGISTRY["corpus_full_curation"].oracle,
)


_BUCKET_UNPIVOT_SQL = " UNION ALL ".join(
    f"SELECT {b} AS band, band{b} AS band_hash FROM bands"
    for b in range(LSH_BANDS)
)


@register(
    "lsh_bucket_size_histogram",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
ub AS ({_BUCKET_UNPIVOT_SQL}),
sz AS (SELECT band, band_hash, COUNT(*) AS bucket_size
       FROM ub GROUP BY band, band_hash)
SELECT CAST(band AS INTEGER) AS band,
       CAST(bucket_size AS BIGINT) AS bucket_size,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(COUNT(*) * (bucket_size * (bucket_size - 1) // 2) AS BIGINT)
           AS pair_work
FROM sz GROUP BY band, bucket_size
""".strip(),
)
def q_lsh_bucket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band bucket-size histogram over the persistent LSH index —
    the OPS DIAL for the module-top sizing rule (operators/dedup.py:
    pick the band width r ~ log N so buckets stay bounded), made a
    measurable (r9 VERDICT #8). The bucket self-join's cost is
    Σ s·(s−1)/2 over bucket sizes s; ``pair_work`` is exactly that
    term per (band, size) cell, so the signal that says "grow r
    BEFORE the pair join degrades" is a regression on this query's
    max bucket_size / total pair_work between ingests — visible in a
    dashboard without ever running the join. (The degenerate
    all-NULL-signature bucket — NULL-text docs share md5('') per band
    — shows up honestly as one bucket per band; its members verify to
    0 matching components downstream, but they still COST bucket-join
    work, which is precisely what this dial is for.)

    Plan: signature projection (no shuffle) → band explode → ONE
    bucket-keyed count with map-side partials (the same shuffle the
    pair join itself would do — minus the join) → a second tiny
    aggregation over the (band, size) table, bounded by the distinct
    size count, not the corpus."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        _band_exprs,
        minhash_signatures,
    )

    sigs = minhash_signatures(_docs(spark, sf_dir))
    banded = sigs.selectExpr(
        "doc_id",
        f"posexplode(array({', '.join(_band_exprs())}))"
        " AS (band, band_hash)",
    )
    sz = banded.groupBy("band", "band_hash").agg(
        F.count("*").alias("bucket_size")
    )
    return (
        sz.groupBy("band", "bucket_size")
        .agg(F.count("*").alias("n_buckets"))
        .select(
            F.col("band").cast("int").alias("band"),
            F.col("bucket_size").cast("long").alias("bucket_size"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.expr(
                "CAST(n_buckets * (bucket_size * (bucket_size - 1) DIV 2) "
                "AS BIGINT)"
            ).alias("pair_work"),
        )
    )


# --- span-level exact substring dedup (Lee et al. '22, relationalized) -------

_SPAN_K = 5  # token k-gram length that marks a duplicated span

_SPAN_GRAM_SQL = "concat_ws(' ', " + ", ".join(
    f"toks[i + {j + 1}]" for j in range(_SPAN_K)
) + ")"


@register(
    "dedup_duplicate_spans",
    oracle=f"""
WITH {_TOKS_CTE},
g AS (
    SELECT doc_id, len(toks) AS n_tok, i AS pos, {_SPAN_GRAM_SQL} AS gram
    FROM toks_cte,
         UNNEST(range(0, CASE WHEN len(toks) >= {_SPAN_K}
                              THEN len(toks) - {_SPAN_K - 1} ELSE 0 END)) AS u(i)
),
d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
p AS (SELECT g.doc_id, g.n_tok, g.pos FROM g JOIN d USING (gram)),
b AS (
    SELECT doc_id, n_tok, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     > {_SPAN_K}
                THEN 1 ELSE 0 END AS brk
    FROM p
),
s AS (
    SELECT doc_id, n_tok, pos,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS span_id
    FROM b
),
spans AS (
    SELECT doc_id, MAX(n_tok) AS n_tok, span_id,
           MIN(pos) AS sp, MAX(pos) + {_SPAN_K - 1} AS ep
    FROM s GROUP BY doc_id, span_id
)
SELECT doc_id,
       CAST(MAX(n_tok) AS BIGINT) AS n_tok,
       CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       CAST(SUM(ep - sp + 1) AS BIGINT) AS dup_tokens,
       ROUND(CAST(SUM(ep - sp + 1) AS DOUBLE) / MAX(n_tok), 6) AS dup_token_frac
FROM spans GROUP BY doc_id
""".strip(),
)
def q_dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-level exact substring dedup (Lee et al. '22, "Deduplicating
    Training Data Makes Language Models Better", relationalized): mark
    every token {k}-gram that occurs in >= 2 distinct documents, then
    merge each document's marked gram starts into MAXIMAL covered spans
    (classic gaps-and-islands: a new span starts when the next start
    exceeds the previous start by more than {k}) and report per-doc
    duplicated-token coverage. This is the missing grain between
    doc-level dedup (exact/MinHash/SimHash families above) and nothing:
    boilerplate headers and quoted passages duplicate SPANS inside
    otherwise-unique documents, and span coverage is the signal used to
    cut them.

    Determinism: gram equality is exact string equality over the shared
    tokenizer; positions/counts are integers; one double division at
    the output edge, rounded to 6 in both arms AFTER the integer sums.

    Plan at scale: grams explode one row per token (same volume as the
    shingle table every MinHash query already builds); the duplicated-
    gram cut is ONE hash shuffle (groupBy gram, count distinct docs >=
    2 with map-side partial aggregation), and the island merge is a
    window PARTITIONED BY doc_id — bounded by document length, never
    global. The paper's suffix array finds spans across arbitrary
    boundaries; the k-gram relaxation is the standard relational
    approximation (spans shorter than {k} tokens are not marked). At
    100 TB, substitute a 128-bit gram fingerprint for the gram string
    before the shuffle (md5 halves, as the MinHash family does) so the
    shuffle carries 16 bytes instead of the text."""
    from pyspark.sql.window import Window

    toks = spread_scan(_docs(spark, sf_dir), "doc_id").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    t = F.col("toks")
    grams = F.when(
        F.size(t) >= _SPAN_K,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (_SPAN_K - 1)),
            lambda i: F.array_join(F.slice(t, i, _SPAN_K), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = toks.select(
        "doc_id",
        F.size(t).alias("n_tok"),
        F.posexplode(grams).alias("pos", "gram"),
    )
    dup = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    p = g.join(dup, "gram").select("doc_id", "n_tok", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) > _SPAN_K, F.lit(1)
    ).otherwise(F.lit(0))
    sp = p.withColumn("brk", brk).withColumn(
        "span_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = sp.groupBy("doc_id", "span_id").agg(
        F.max("n_tok").alias("n_tok"),
        F.min("pos").alias("sp"),
        (F.max("pos") + (_SPAN_K - 1)).alias("ep"),
    )
    covered = F.sum(F.col("ep") - F.col("sp") + 1)
    return spans.groupBy("doc_id").agg(
        F.max("n_tok").cast("long").alias("n_tok"),
        F.count("*").cast("long").alias("n_dup_spans"),
        covered.cast("long").alias("dup_tokens"),
        F.round(covered.cast("double") / F.max("n_tok"), 6).alias(
            "dup_token_frac"
        ),
    )


q_dedup_duplicate_spans.__doc__ = q_dedup_duplicate_spans.__doc__.format(
    k=_SPAN_K
)


# --- maximal duplicated-span EXTRACTION (r12 VERDICT #6) ---------------------

_CSPAN_K = 8  # minimum duplicated-span length in tokens (= gram size)

_CSPAN_GRAM_SQL = "concat_ws(' ', " + ", ".join(
    f"toks[i + {j + 1}]" for j in range(_CSPAN_K)
) + ")"


@register(
    "corpus_duplicate_spans",
    oracle=f"""
WITH {_TOKS_CTE},
g AS (
    SELECT doc_id, i AS pos, md5({_CSPAN_GRAM_SQL}) AS fp
    FROM toks_cte,
         UNNEST(range(0, CASE WHEN len(toks) >= {_CSPAN_K}
                              THEN len(toks) - {_CSPAN_K - 1}
                              ELSE 0 END)) AS u(i)
),
d AS (SELECT fp FROM g GROUP BY fp HAVING COUNT(*) >= 2),
p AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (fp)),
b AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     > 1
                THEN 1 ELSE 0 END AS brk
    FROM p
),
s AS (
    SELECT doc_id, pos,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS span_id
    FROM b
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_CSPAN_K - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {_CSPAN_K} AS BIGINT) AS span_len,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM s GROUP BY doc_id, span_id
""".strip(),
)
def q_corpus_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal exact duplicated-span EXTRACTION (r12 VERDICT #6 — the
    substring grain the dedup family lacked): emit every maximal token
    span of length ≥ {k} whose {k}-gram windows ALL occur at least
    twice in the corpus — across documents or WITHIN one (self-repeats
    count; ``dedup_duplicate_spans`` above is the complementary
    cross-doc coverage report). This is the relational form of Lee et
    al. '22's ExactSubstr suffix-array dedup: equal grams meet in a
    hash bucket instead of adjacent sorted suffix ranks, and a maximal
    duplicated span is exactly a maximal run of consecutive duplicated
    gram starts, merged with the gaps-and-islands window — the spans a
    curation pass would actually cut, with their positions.

    Determinism: gram fingerprints are md5 over the shared tokenizer's
    space-joined grams (bit-identical in DuckDB); positions, lengths,
    and counts are integers — no floats anywhere.

    Plan at scale (operators/dedup.py::duplicate_spans): one hash
    aggregation for the duplicate cut (map-side partials), one
    fingerprint equi-join to mark positions (cost linear in occurrence
    counts, never all-pairs), one doc-partitioned window for the
    merge. The brute-force property test
    (tests/test_duplicate_spans.py) pins the semantics on adversarial
    overlaps — periodic strings, self-overlapping repeats, boundary
    runs."""
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
    )

    return duplicate_spans(_docs(spark, sf_dir), gram_len=_CSPAN_K)


q_corpus_duplicate_spans.__doc__ = q_corpus_duplicate_spans.__doc__.format(
    k=_CSPAN_K
)


# --- quality-curriculum staging (distributed NTILE over the quality score) ---

_CURR_STAGES = 4  # curriculum stages (quality-ascending quartiles)
_CURR_BUCKETS = 20  # coarse score-range blocks for the two-level rank


@register(
    "corpus_quality_curriculum",
    oracle="""
WITH prof AS (
    SELECT doc_id, n_tokens, quality_score FROM ({profile}) p
),
staged AS (
    SELECT *, NTILE({k}) OVER (ORDER BY quality_score, doc_id) AS stage
    FROM prof
)
SELECT CAST(stage AS INTEGER) AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(quality_score) AS min_quality,
       MAX(quality_score) AS max_quality,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_n_tokens
FROM staged GROUP BY stage
""".strip(),
)
def q_corpus_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ascending CURRICULUM staging: split the corpus into
    {k} equal-depth stages by quality score (low-quality bulk first,
    highest-quality last — the curriculum/annealing data-ordering
    used for LM training runs) and profile each stage. Equal-DEPTH is
    the point: fixed thresholds would put 90% of a crawl in stage 1.

    The oracle says NTILE; the Spark arm must NOT (a global NTILE
    window is a SinglePartition collapse of the whole corpus). Instead
    the global rank is the two-level parallel construction the packing
    / ECDF / lateness queries already use — score-range blocks (b =
    floor(score*{B}), clamped) give per-block counts, running block
    offsets over the {B}-row block table are the only single-partition
    window, and the intra-block rank windows on the block key. The
    NTILE bucket is then pure arithmetic on (rank, N): with q = N div
    {k}, r = N mod {k}, the first r stages take q+1 rows — exactly the
    SQL-standard NTILE split, reproduced from the distributed rank.
    Determinism: scores are rounded to 6dp BEFORE ranking (both arms),
    doc_id breaks ties totally; stage profiles are min/max (order-free)
    and one integer-sum division at the edge.

    Scale note: {B} score-range blocks bound the running-offset window
    at {B} rows regardless of corpus size; score skew (many identical
    scores) lands in one block's rank window — raise {B} or sub-block
    by a doc_id range for a pathological single-score corpus."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    toks_df = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    )
    t = F.col("toks")
    prof = toks_df.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.round(quality_score_t(F.col("text"), t), 6).alias("q"),
    )
    blk = F.least(
        F.floor(F.col("q") * _CURR_BUCKETS), F.lit(_CURR_BUCKETS - 1)
    ).cast("long")
    e = prof.withColumn("blk", blk)
    blocks = e.groupBy("blk").agg(F.count(F.lit(1)).alias("bn"))
    wprev = Window.orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = blocks.select(
        "blk", F.coalesce(F.sum("bn").over(wprev), F.lit(0)).alias("off")
    )
    wint = Window.partitionBy("blk").orderBy("q", "doc_id")
    ranked = e.join(F.broadcast(prev), "blk").withColumn(
        "rnk", F.col("off") + F.row_number().over(wint)
    )
    n_total = prof.agg(F.count(F.lit(1)).alias("n"))
    k = F.lit(_CURR_STAGES)
    qq = F.expr(f"n div {_CURR_STAGES}")
    rr = F.col("n") % k
    big = rr * (qq + 1)  # rows living in the (q+1)-sized leading stages
    stage = (
        F.when(
            F.col("rnk") <= big,
            F.expr(f"(rnk - 1) div ((n div {_CURR_STAGES}) + 1)"),
        ).otherwise(
            rr
            + F.expr(
                f"(rnk - (n % {_CURR_STAGES}) * ((n div {_CURR_STAGES}) + 1)"
                f" - 1) div (n div {_CURR_STAGES})"
            )
        )
        + 1
    )
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .withColumn("stage", stage.cast("int"))
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("q").alias("min_quality"),
            F.max("q").alias("max_quality"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_n_tokens"),
        )
    )


q_corpus_quality_curriculum.__doc__ = q_corpus_quality_curriculum.__doc__.format(
    k=_CURR_STAGES, B=_CURR_BUCKETS
)
REGISTRY["corpus_quality_curriculum"] = REGISTRY[
    "corpus_quality_curriculum"
].__class__(
    name="corpus_quality_curriculum",
    build=REGISTRY["corpus_quality_curriculum"].build,
    oracle=REGISTRY["corpus_quality_curriculum"].oracle.format(
        profile=REGISTRY["text_profile"].oracle, k=_CURR_STAGES
    ),
)


# --- out-of-vocabulary rate against a corpus-derived top-V vocabulary --------

_OOV_VOCAB_SIZE = 16  # the synthetic corpus has ~31 distinct tokens;
# 16 keeps roughly half the stream out-of-vocab so the audit is non-vacuous
# at every test SF (at corpus scale this is the 32k-ish BPE budget knob)


@register(
    "tokenizer_oov_rate",
    oracle=f"""
WITH {_TOKS_CTE},
tok AS (
    SELECT d.lang, u.tok
    FROM toks_cte t
    JOIN documents d ON d.doc_id = t.doc_id,
    UNNEST(t.toks) AS u(tok)
),
vocab AS (
    SELECT tok FROM (
        SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
        ORDER BY c DESC, tok LIMIT {_OOV_VOCAB_SIZE}
    )
)
SELECT t.lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
GROUP BY t.lang
""".strip(),
)
def q_tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a top-{V}
    corpus-frequency vocabulary — the coverage audit run before
    committing a tokenizer vocab: a language whose OOV rate is high
    under the shared vocab will fragment into UNK/byte-fallback tokens
    and train badly (the multilingual "vocabulary tax";
    `tokenizer_fertility_by_lang` measures the fragmentation itself,
    this measures the coverage gap that causes it). Vocabulary ties at
    the size-{V} boundary break by token string — a total order, so
    both engines pick the identical vocab.

    Plan at scale: token counts are one map-side-combined hash agg;
    the top-{V} cut is TakeOrderedAndProject over the AGGREGATED count
    table (never a global sort of the token stream); membership
    attaches as a BROADCAST left join ({V} rows); the per-language
    rollup partial-aggregates. The token explode is the same volume
    the tf-idf/vocab queries already scan."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(_OOV_VOCAB_SIZE)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(oov).cast("long").alias("n_oov"),
            F.round(
                F.sum(oov).cast("double") / F.count(F.lit(1)), 6
            ).alias("oov_rate"),
        )
    )


q_tokenizer_oov_rate.__doc__ = q_tokenizer_oov_rate.__doc__.format(
    V=_OOV_VOCAB_SIZE
)


# --- b-bit MinHash estimator audit (Li & Koenig, WWW'10) --------------------

_BBIT_CUT = 0.5  # the near-dup decision threshold under audit


@register(
    "minhash_bbit_estimator_audit",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
{_MS_CTE},
{_SIGS_CTE},
bands AS (SELECT sigs.*, {_BAND_COLS_SQL} FROM sigs),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ({" + ".join(f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(MINHASH_K))})
               AS n_match,
           ({" + ".join(f"CASE WHEN a.mh{j} % 2 = b.mh{j} % 2 THEN 1 ELSE 0 END" for j in range(MINHASH_K))})
               AS n_bit
    FROM bands a JOIN bands b
      ON a.doc_id < b.doc_id
     AND ({" OR ".join(f"a.band{b} = b.band{b}" for b in range(LSH_BANDS))})
),
sh AS (SELECT doc_id, list_distinct(shingles) AS sh FROM sh_cte),
per_pair AS (
    SELECT CAST(n_match AS DOUBLE) / {MINHASH_K} AS est_full,
           2.0 * (CAST(n_bit AS DOUBLE) / {MINHASH_K}) - 1.0 AS est_bbit,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / NULLIF(CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE),
                        0.0) AS exact
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_a
    JOIN sh sb ON sb.doc_id = cand.doc_b
)
SELECT COUNT(*) AS n_pairs,
       ROUND(CAST(SUM(CAST(ROUND(ABS(est_full - exact), 6)
                           AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS full_mean_abs_err,
       ROUND(CAST(SUM(CAST(ROUND(ABS(est_bbit - exact), 6)
                           AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS bbit_mean_abs_err,
       MAX(ROUND(ABS(est_bbit - exact), 6)) AS bbit_max_abs_err,
       CAST(SUM(CASE WHEN est_bbit >= {_BBIT_CUT} AND exact >= {_BBIT_CUT}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_both_pos,
       CAST(SUM(CASE WHEN est_bbit >= {_BBIT_CUT} AND exact < {_BBIT_CUT}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN est_bbit < {_BBIT_CUT} AND exact >= {_BBIT_CUT}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
FROM per_pair
""".strip(),
)
def q_minhash_bbit_estimator_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """b-bit MinHash (Li & Koenig, WWW'10) estimator audit: keep only
    the LOWEST BIT of each signature component — a 64x storage cut at
    the same k — and measure what that costs. For b=1 the bit-agreement
    rate A relates to Jaccard J as E[A] = (1+J)/2, so the unbiased
    estimator is 2A-1; the audit compares it against BOTH the
    full-component estimate and the exact shingle Jaccard on every LSH
    candidate pair, plus the 0.5-cut confusion counts the full
    estimator's audit (``lsh_estimator_error``) tracks. At 100 TB the
    b-bit table is what you actually ship to the pair-verification
    stage: 8 bits/doc instead of 64 bytes/doc, and this query measures
    the accuracy price of that compression instead of trusting the
    paper's asymptotics.

    Plan: signatures materialize once (scoped persist, unpersisted
    before return) and feed the band-bucket equi-join; bit agreement is
    integer arithmetic on the SAME join — no second shuffle; exact
    Jaccard joins distinct-shingle sets onto only the candidate pairs.
    Determinism: estimates are doubles derived from exact integers,
    per-pair errors ROUNDED to 6 before a DECIMAL sum; confusion
    counts are integers; the raw (unclamped) 2A-1 estimator is kept —
    negative estimates are informative in an audit."""
    docs = _docs(spark, sf_dir)
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    sigs = minhash_signatures(docs, "text", MINHASH_K).persist()
    pairs = lsh_candidate_pairs(sigs, MINHASH_K, LSH_BANDS)
    a = sigs.selectExpr(
        "doc_id AS doc_a", *[f"mh{j} AS a_mh{j}" for j in range(MINHASH_K)]
    )
    b = sigs.selectExpr(
        "doc_id AS doc_b", *[f"mh{j} AS b_mh{j}" for j in range(MINHASH_K)]
    )
    n_match = " + ".join(
        f"if(a_mh{j} = b_mh{j}, 1, 0)" for j in range(MINHASH_K)
    )
    n_bit = " + ".join(
        f"if(a_mh{j} % 2 = b_mh{j} % 2, 1, 0)" for j in range(MINHASH_K)
    )
    cand = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            f"({n_match}) / cast({MINHASH_K} as double) AS est_full",
            f"2.0d * (({n_bit}) / cast({MINHASH_K} as double)) - 1.0d"
            " AS est_bbit",
        )
        .localCheckpoint()
    )
    sigs.unpersist()
    exact = ngram_jaccard(
        cand.select("doc_a", "doc_b"), docs
    ).withColumnRenamed("jaccard", "exact")
    cut = _BBIT_CUT
    per_pair = cand.join(exact, ["doc_a", "doc_b"]).select(
        "est_full",
        "est_bbit",
        "exact",
        F.round(F.abs(F.col("est_full") - F.col("exact")), 6).alias(
            "err_full"
        ),
        F.round(F.abs(F.col("est_bbit") - F.col("exact")), 6).alias(
            "err_bbit"
        ),
    )
    return per_pair.agg(
        F.count("*").alias("n_pairs"),
        F.round(
            F.sum(F.col("err_full").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("full_mean_abs_err"),
        F.round(
            F.sum(F.col("err_bbit").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("bbit_mean_abs_err"),
        F.max("err_bbit").alias("bbit_max_abs_err"),
        F.sum(
            F.when((F.col("est_bbit") >= cut) & (F.col("exact") >= cut), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_both_pos"),
        F.sum(
            F.when((F.col("est_bbit") >= cut) & (F.col("exact") < cut), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
        F.sum(
            F.when((F.col("est_bbit") < cut) & (F.col("exact") >= cut), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_neg"),
    )


# --- RAKE keyword extraction (Rose et al. '10) --------------------------------

_RAKE_MIN_LEN = 2  # single words flood the ranking; phrases only
_RAKE_MAX_LEN = 4
_RAKE_TOP = 25


@register(
    "documents_rake_keywords",
    oracle=f"""
WITH {_TOKS_CTE},
pos_toks AS (
    SELECT doc_id, i AS pos, toks[i + 1] AS tok,
           CASE WHEN toks[i + 1] IN ({_in_list(QUALITY_STOPWORDS)})
                THEN 1 ELSE 0 END AS is_stop
    FROM toks_cte, UNNEST(range(0, len(toks))) AS u(i)
),
seg AS (
    SELECT doc_id, pos, tok, is_stop,
           SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS phrase_id
    FROM pos_toks
),
words AS (
    SELECT doc_id, phrase_id, pos, tok FROM seg WHERE is_stop = 0
),
plen AS (
    SELECT doc_id, phrase_id, COUNT(*) AS n_words
    FROM words GROUP BY doc_id, phrase_id
),
wstat AS (
    SELECT tok, COUNT(*) AS freq,
           SUM(n_words) AS degree
    FROM words JOIN plen USING (doc_id, phrase_id)
    GROUP BY tok
),
wscore AS (
    SELECT tok, CAST(ROUND(CAST(degree AS DOUBLE) / freq, 6)
                AS DECIMAL(18,6)) AS ws
    FROM wstat
),
phrases AS (
    SELECT w.doc_id, w.phrase_id,
           string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           SUM(ws) AS score
    FROM words w JOIN wscore s ON w.tok = s.tok
    GROUP BY w.doc_id, w.phrase_id
    HAVING COUNT(*) BETWEEN {_RAKE_MIN_LEN} AND {_RAKE_MAX_LEN}
),
dedup AS (
    SELECT phrase, ANY_VALUE(n_words) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MAX(score) AS score
    FROM phrases GROUP BY phrase
)
SELECT phrase, n_words, n_occurrences,
       CAST(score AS DOUBLE) AS rake_score
FROM dedup
ORDER BY score DESC, phrase
LIMIT {_RAKE_TOP}
""".strip(),
)
def q_documents_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. '10): candidate phrases are
    the maximal stopword-free token runs; each word scores
    degree/frequency (degree = summed length of every phrase it appears
    in — co-occurrence + self); a phrase scores the sum of its member
    word scores. Top-{K} multi-word phrases corpus-wide — the unsupervised
    keyword surface a corpus card / topic drill-down starts from, and a
    different extraction family from the engine's TF-IDF / BM25 /
    collocation-PMI rankings (RAKE rewards words that live in LONG
    specific phrases, not rare words).

    Determinism: phrase segmentation is an integer cumulative sum of
    stopword flags per document (window bounded by doc length); word
    scores are ONE double division of exact integers ROUNDED to 6 and
    summed as exact DECIMAL per phrase — identical phrase text implies
    identical score, so the text-grain dedup can take MAX(score)
    without drift. Ordering ties break on the phrase string.

    Plan at scale: token explode (the volume every shingle query
    already handles) -> doc-partitioned segmentation window -> two
    hash aggs (phrase grain, then word grain) -> word-score equi-join
    back -> phrase-text agg -> TakeOrdered top-{K}. No window is ever
    unpartitioned; the word-stat table is vocabulary-sized."""
    from pyspark.sql.window import Window

    toks = spread_scan(_docs(spark, sf_dir), "doc_id").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    pt = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).select(
        "doc_id",
        "pos",
        "tok",
        F.when(F.col("tok").isin(*QUALITY_STOPWORDS), 1)
        .otherwise(0)
        .alias("is_stop"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    words = (
        pt.withColumn("phrase_id", F.sum("is_stop").over(w))
        .filter(F.col("is_stop") == 0)
        .select("doc_id", "phrase_id", "pos", "tok")
    )
    plen = words.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("n_words")
    )
    wstat = (
        words.join(plen, ["doc_id", "phrase_id"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("n_words").alias("degree"),
        )
    )
    wscore = wstat.select(
        "tok",
        F.round(F.col("degree").cast("double") / F.col("freq"), 6)
        .cast("decimal(18,6)")
        .alias("ws"),
    )
    phrases = (
        words.join(wscore, "tok")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x.tok,
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum("ws").alias("score"),
        )
        .filter(
            F.col("n_words").between(_RAKE_MIN_LEN, _RAKE_MAX_LEN)
        )
    )
    dedup = phrases.groupBy("phrase").agg(
        F.any_value("n_words").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("score").alias("score"),
    )
    return (
        dedup.orderBy(F.desc("score"), F.asc("phrase"))
        .limit(_RAKE_TOP)
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            F.col("score").cast("double").alias("rake_score"),
        )
    )


q_documents_rake_keywords.__doc__ = q_documents_rake_keywords.__doc__.format(
    K=_RAKE_TOP
)


# --- Zipf-law fit of the term-frequency distribution --------------------------

_ZIPF_TOP = 200  # fit over the head of the rank-frequency curve
_ZIPF_SCALE = 12


@register(
    "corpus_zipf_fit",
    oracle=f"""
WITH {_TOKS_CTE},
tf AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(toks) AS tok FROM toks_cte) t
    GROUP BY tok
),
ranked AS (
    SELECT freq,
           ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk
    FROM tf QUALIFY rnk <= {_ZIPF_TOP}
),
pts AS (
    SELECT CAST(ROUND(LN(CAST(rnk AS DOUBLE)), {_ZIPF_SCALE})
                AS DECIMAL(28,12)) AS x,
           CAST(ROUND(LN(CAST(freq AS DOUBLE)), {_ZIPF_SCALE})
                AS DECIMAL(28,12)) AS y
    FROM ranked
),
moms AS (
    SELECT COUNT(*) AS n,
           SUM(x) AS sx, SUM(y) AS sy,
           SUM(CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE),
                          {_ZIPF_SCALE}) AS DECIMAL(28,12))) AS sxy,
           SUM(CAST(ROUND(CAST(x AS DOUBLE) * CAST(x AS DOUBLE),
                          {_ZIPF_SCALE}) AS DECIMAL(28,12))) AS sxx,
           SUM(CAST(ROUND(CAST(y AS DOUBLE) * CAST(y AS DOUBLE),
                          {_ZIPF_SCALE}) AS DECIMAL(28,12))) AS syy
    FROM pts
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             6) AS zipf_slope,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS r2
FROM moms
""".strip(),
)
def q_corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus rank-frequency curve: OLS slope of
    log(freq) on log(rank) over the top-{K} terms — natural language
    sits near slope -1 with high R², and machine-generated / template /
    spam corpora visibly don't, which makes this the cheapest
    whole-corpus authenticity screen a training-data pipeline can run
    (the corpus-statistics sibling of the per-document quality gates).

    Determinism: ranks are a ROW_NUMBER over the exact (freq DESC,
    term) total order; each log and each pairwise product is ROUNDED to
    {S}dp before exact DECIMAL sums (the PSI/BM25 libm recipe), and the
    slope/R² combinations are edge doubles on those exact moments.

    Plan: one tokenization + term agg (the vocabulary shuffle every
    text query shares), a top-{K} cut, then a {K}-row projection and a
    1-row moment agg — the head-of-distribution fit never touches the
    vocabulary tail, and nothing after the cut scales with data."""
    toks = spread_scan(_docs(spark, sf_dir), "doc_id").select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    from pyspark.sql.window import Window

    ranked = (
        tf.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("tok"))),
        )
        .filter(F.col("rnk") <= _ZIPF_TOP)
    )
    pts = ranked.select(
        F.round(F.log(F.col("rnk").cast("double")), _ZIPF_SCALE)
        .cast("decimal(28,12)")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")), _ZIPF_SCALE)
        .cast("decimal(28,12)")
        .alias("y"),
    )
    pr = lambda a, b: F.round(  # noqa: E731
        a.cast("double") * b.cast("double"), _ZIPF_SCALE
    ).cast("decimal(28,12)")
    moms = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(pr(F.col("x"), F.col("y"))).alias("sxy"),
        F.sum(pr(F.col("x"), F.col("x"))).alias("sxx"),
        F.sum(pr(F.col("y"), F.col("y"))).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    num = n * sxy - sx * sy
    return moms.select(
        n.cast("long").alias("n_terms"),
        F.round(num / (n * sxx - sx * sx), 6).alias("zipf_slope"),
        F.round(
            num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("r2"),
    )


q_corpus_zipf_fit.__doc__ = q_corpus_zipf_fit.__doc__.format(
    K=_ZIPF_TOP, S=_ZIPF_SCALE
)
