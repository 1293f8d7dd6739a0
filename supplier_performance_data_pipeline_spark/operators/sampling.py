"""Deterministic sampling for reproducible corpus construction.

Training-data pipelines need samples that are STABLE across reruns,
engines, and partitionings — "give me the same 20% tomorrow". RNG-based
``sample``/``sampleBy`` depends on partition layout and the engine's
generator; content-hash sampling decides per row from a hash of the
key, so membership is a pure function of (seed, key):

  keep  iff  md5(seed | key)[:56 bits] mod 10_000 < pct * 10_000

Portable md5 arithmetic means the DuckDB oracle reproduces the exact
sampled set — the sample is hash-VERIFIED, not statistically eyeballed.
Used with a per-stratum rate map this is stratified sampling with the
same guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAIN = 10_000  # rate resolution: 0.01%


def md5_mod(key: Column, salt: str, m: int) -> Column:
    """THE portable-hash recipe, in one place: md5(salt || key) → first
    14 hex chars (56 bits) → integer mod m. Every deterministic-
    membership contract in the engine (sampling buckets, Bloom bit
    positions) derives from this so the DuckDB oracles can reproduce
    membership bit-for-bit; ``md5_mod_sql`` is its SQL twin — change
    one, change both."""
    digest = F.md5(F.concat(F.lit(salt), key.cast("string")))
    h56 = F.conv(F.substring(digest, 1, 14), 16, 10).cast("long")
    return F.pmod(h56, F.lit(m))


def md5_mod_sql(expr: str, salt: str, m: int) -> str:
    """DuckDB rendering of ``md5_mod`` for oracle generation."""
    return (
        f"(CAST(concat('0x', substr(md5(concat('{salt}', {expr})), 1, 14)) "
        f"AS BIGINT) % {m})"
    )


def hash_bucket(key: Column, seed: int) -> Column:
    """Deterministic bucket in [0, GRAIN) from md5(seed | key)."""
    return md5_mod(key, f"{seed}|", GRAIN)


def sample_threshold(pct: float) -> int:
    """Bucket threshold for a requested rate: round, don't truncate —
    int(0.07 * GRAIN) is 699 (float error), silently one grain under
    the requested rate. Shared with the oracle-side constant so both
    engines use the identical integer."""
    return round(pct * GRAIN)


def hash_sample(
    df: DataFrame, key: str, pct: float, seed: int = 42
) -> DataFrame:
    """Keep ~pct of rows, membership a pure function of (seed, key)."""
    return df.filter(hash_bucket(F.col(key), seed) < sample_threshold(pct))


def stratified_hash_sample(
    df: DataFrame, key: str, strata_col: str, rates: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample 'und' docs to 5%
    but keep 50% of 'en'). Strata absent from ``rates`` are dropped."""
    threshold = F.lit(-1)
    for stratum, pct in rates.items():
        threshold = (
            F.when(
                F.col(strata_col) == stratum, sample_threshold(pct)
            ).otherwise(threshold)
        )
    return df.filter(hash_bucket(F.col(key), seed) < threshold)


def weighted_sample_key(key: Column, weight: Column, seed: int) -> Column:
    """Priority-sampling key (Duffield–Lund–Thorup, "Priority sampling
    for estimation of arbitrary subset sums", JACM 2007): priority
    q = w/u with u uniform; the k rows with LARGEST q form a weighted
    sample without replacement with inclusion ≈ min(w/τ, 1) ∝ weight
    (and unbiased subset-sum estimators, which plain A-ES lacks).

    u is deterministic per (seed, key): the hash bucket shifted off
    zero, u = (bucket + 0.5) / GRAIN — same hash, same u, same sample
    tomorrow, on any engine, under any partitioning. q reduces to
    w·2·GRAIN / (2·bucket + 1): one integer-exact multiply and one
    IEEE-correctly-rounded divide, so the key is BIT-IDENTICAL across
    engines BY IEEE-754 MANDATE — no libm transcendental anywhere (the
    round-4 red proved that a single ln() in a hashed/ranked output is
    environment-borne: last-ulp libm drift flips a 6dp rounding
    boundary). No rounding needed; callers tie-break on the row key so
    the top-k cut is a total order."""
    q_num = weight.cast("double") * F.lit(float(2 * GRAIN))
    return q_num / (hash_bucket(key, seed) * F.lit(2) + F.lit(1)).cast("double")


def mixture_resample(
    docs: DataFrame,
    source_col: str,
    size_col: str,
    budget_frac: float,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic MIXTURE resampling: downsample each source so every
    source contributes an (approximately) EQUAL share of a global size
    budget — the training-data curriculum operator ("rebalance the
    corpus to uniform source mix at half its size"). Per source s:

        target_s = budget_frac · Σ_all size / n_sources
        rate_s   = min(1, target_s / Σ_s size)
        keep doc ⟺ hash_bucket(doc_id) < FLOOR(rate_s·GRAIN + 0.5)

    Membership is the engine's md5_mod contract — a pure function of
    (seed, ``id_col``), reproducible across engines/partitionings/reruns —
    and the rate derivation is integer sums + a fixed chain of
    IEEE-correctly-rounded double ops, so the DuckDB oracle reproduces
    the exact sampled set (hash-VERIFIED mixture, not statistically
    eyeballed). Oversized sources shrink toward the uniform share;
    undersized ones keep everything (rate clamps at 1 — resampling
    never upsamples).

    Plan: one source-keyed agg (map-side combined), a 1-row global agg,
    the per-source thresholds broadcast back onto the doc scan, one
    hash filter — the doc table crosses no shuffle at all. At 100 TB
    the threshold table is |sources| rows; everything else is a
    projection."""
    # localCheckpoint: the |sources|-row totals feed BOTH the global
    # budget and the per-source thresholds — without materializing,
    # each branch re-scans and re-aggregates the full doc table.
    totals = docs.groupBy(source_col).agg(
        F.sum(size_col).alias("_src_size")
    ).localCheckpoint()
    glob = totals.agg(
        F.sum("_src_size").alias("_tot"), F.count("*").alias("_ns")
    )
    thr = F.expr(
        f"CAST(FLOOR(LEAST(1.0D, CAST(_tot AS DOUBLE) * {budget_frac!r}"
        " / _ns / CAST(_src_size AS DOUBLE))"
        f" * {GRAIN} + 0.5) AS BIGINT)"
    )
    rates = totals.crossJoin(F.broadcast(glob)).select(
        source_col, thr.alias("_thr")
    )
    return docs.join(F.broadcast(rates), source_col).filter(
        hash_bucket(F.col(id_col), seed) < F.col("_thr")
    )


def mixture_resample_rate_sql(
    size_sum: str, budget_frac: float
) -> str:
    """DuckDB rendering of the mixture threshold (same op chain)."""
    return (
        f"CAST(FLOOR(LEAST(1.0, CAST(_tot AS DOUBLE) * {budget_frac!r}"
        f" / _ns / CAST({size_sum} AS DOUBLE)) * {GRAIN} + 0.5) AS BIGINT)"
    )
