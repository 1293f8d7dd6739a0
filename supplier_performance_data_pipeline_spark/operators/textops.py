"""Text analysis operators for large-scale document pipelines.

Extension surface (BASELINE.json north star): language ID, quality
scoring, token counting, fingerprinting — all as native Column
expressions (JVM-side, codegen'd; no Python in the hot path). Each has
an exact DuckDB-oracle counterpart in plans/queries_text.py.

Scale: every operator is a pure per-row projection — embarrassingly
parallel, no shuffle, survives any scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RX = "[^a-z0-9]+"
PUNCT_CHARS = ".,!?;:"

# Per-language stopword lists for the n-gram/stopword language heuristic.
# Deterministic tie-break: first language in this order wins.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "los", "de", "que", "y", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "les", "et", "est", "une", "dans"],
}

QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Lowercased alnum tokens, empty fragments dropped.

    Callers computing several token-derived features per row should
    materialize this ONCE as a column and use the ``*_t`` variants
    below — each text-based wrapper builds its own regexp-split tree,
    and Catalyst does not share subexpressions across projections."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RX), lambda x: x != F.lit("")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count_t(toks: Column, words: list[str]) -> Column:
    """Stopword hits over a materialized token-array column."""
    wl = [F.lit(w) for w in words]
    return F.size(F.filter(toks, lambda x: x.isin(*wl)))


def quality_score_t(text: Column, toks: Column) -> Column:
    """quality_score over a materialized token-array column."""
    n_tok = F.size(toks).cast("double")
    stop_ratio = stopword_count_t(toks, QUALITY_STOPWORDS).cast(
        "double"
    ) / F.nullif(n_tok, F.lit(0.0))
    punct_ratio = punct_count(text).cast("double") / F.nullif(
        F.length(text).cast("double"), F.lit(0.0)
    )
    return (
        0.4 * F.least(n_tok / 200.0, F.lit(1.0))
        + 0.4 * F.least(F.coalesce(stop_ratio, F.lit(0.0)) * 5.0, F.lit(1.0))
        + 0.2
        * (1.0 - F.least(F.coalesce(punct_ratio, F.lit(0.0)) * 10.0, F.lit(1.0)))
    )


def lang_id_t(toks: Column) -> Column:
    """lang_id over a materialized token-array column."""
    n_tok = F.size(toks).cast("double")
    scores = {
        lang: F.coalesce(
            stopword_count_t(toks, words).cast("double")
            / F.nullif(n_tok, F.lit(0.0)),
            F.lit(0.0),
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(LANG_STOPWORDS)
    expr = F.lit("und")
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = scores[lang] > 0.0
        for later in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_t(toks: Column) -> Column:
    """fingerprint over a materialized token-array column."""
    return F.md5(F.concat_ws(" ", toks))


def punct_count(text: Column) -> Column:
    """Occurrences of common punctuation via the translate trick
    (portable: identical semantics in every SQL engine)."""
    return F.length(text) - F.length(F.translate(text, PUNCT_CHARS, ""))


def stopword_count(text: Column, words: list[str]) -> Column:
    toks = tokens(text)
    wl = [F.lit(w) for w in words]
    return F.size(F.filter(toks, lambda x: x.isin(*wl)))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1]: length, stopword density,
    punctuation density. The exact formula is mirrored in the oracle —
    the semantics are the engine's own (reference has no text ops)."""
    n_tok = token_count(text).cast("double")
    stop_ratio = stopword_count(text, QUALITY_STOPWORDS).cast("double") / F.nullif(
        n_tok, F.lit(0.0)
    )
    punct_ratio = punct_count(text).cast("double") / F.nullif(
        F.length(text).cast("double"), F.lit(0.0)
    )
    score = (
        0.4 * F.least(n_tok / 200.0, F.lit(1.0))
        + 0.4 * F.least(F.coalesce(stop_ratio, F.lit(0.0)) * 5.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(F.coalesce(punct_ratio, F.lit(0.0)) * 10.0, F.lit(1.0)))
    )
    return score


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio."""
    n_tok = token_count(text).cast("double")
    return {
        lang: stopword_count(text, words).cast("double")
        / F.nullif(n_tok, F.lit(0.0))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language as a cascaded CASE with deterministic tie-break
    (declaration order wins ties); 'und' when no stopwords hit."""
    scores = {
        lang: F.coalesce(s, F.lit(0.0)) for lang, s in lang_scores(text).items()
    }
    langs = list(LANG_STOPWORDS)
    expr = F.lit("und")
    # Build the CASE bottom-up: last language first.
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = scores[lang] > 0.0
        for later in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Whitespace/case-insensitive document fingerprint: md5 of the
    normalized token stream."""
    return F.md5(F.concat_ws(" ", tokens(text)))


# Rabin-Karp rolling fingerprint parameters. P = 2^31-1 keeps the fold
# overflow-free in 64-bit: acc*B + h < 2^31 * 257 + 2^31 < 2^40.
ROLL_B = 257
ROLL_P = (1 << 31) - 1


def rolling_fingerprint_expr(toks_sql: str) -> str:
    """Polynomial rolling hash over the token stream as a SQL string:
    acc = (acc * B + h(tok)) mod P, h = 56-bit md5 half mod P. A
    sequential fold per row — still a pure projection across rows, so
    it parallelizes like every other text op. Empty docs hash to 0."""
    h = (
        "pmod(cast(conv(substring(md5(x), 1, 14), 16, 10) as bigint), "
        f"{ROLL_P})"
    )
    return (
        f"if(size({toks_sql}) = 0, 0L, "
        f"aggregate({toks_sql}, 0L, "
        f"(acc, x) -> pmod(acc * {ROLL_B} + {h}, {ROLL_P})))"
    )


# GPT-2-style pre-tokenizer shape, ASCII-simplified so the Java and RE2
# regex engines agree: contraction suffixes, optionally-space-prefixed
# letter runs, digit runs, and punctuation runs.
BPE_TOKEN_RX = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count(text: Column) -> Column:
    """Token count under a BPE-ish pre-tokenization — the
    training-cost estimator (whitespace counts undercount code/punct
    heavy text). No alternative can match pure whitespace, so the match
    count IS the token count."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RX), F.lit(0)))
