"""One-shot PPJoin+ suffix-filter A/B at the fat-doc regime (round-9,
verdict #6): give the "enable suffix_probes where verify dominates"
claim a measured data point — positive or negative.

The sf0.1 documents fixture (|token set| ~ 100) measured the probe at
~0.5 ms/pair through Catalyst's lambda interpreter vs a ~2 s verify —
suffix OFF is right there. The claimed ON regime is fat documents:
|set| in the thousands, candidate pairs that the length+positional
filters pass but verify rejects, so every pruned pair saves |A|+|B|
shuffled verify rows.

Fixture (deterministic, adversarially favorable to the suffix stage):
G groups x g docs. Each doc = one group-shared block of rare shingles
(df = g, so it fills the rarest-first prefix and generates all
intra-group pairs as candidates) + a doc-band of filler shingles
shared across groups (df = g, disjoint RANGES per band — exactly the
shape the suffix partition argument detects and the prefix/positional
filters cannot). Every intra-group candidate passes length+positional
(shared block tokens sit at prefix position 1 with equal lengths) and
fails verify (overlap == block size < threshold); the suffix bound
sees the disjoint filler ranges and prunes ~100%. If ON cannot win
HERE, it cannot win anywhere at local scale, and the docstring's
economics get the negative data point; if it wins, the regime claim
has its number.

Output: SUFFIX_AB.json at the repo root (picked up by bench.py into
BENCH_LOCAL_r{N}.json under "suffix_ab", measured_round stamped via
bench._round_files so the staleness stamp can't drift). Run manually;
kept out of the per-round bench for timeout predictability.
"""

from __future__ import annotations

import json
import os
import time

HERE = os.path.dirname(os.path.abspath(__file__))

G_GROUPS = 30
G_SIZE = 20          # docs per group -> g*(g-1)/2 candidate pairs each
BLOCK = 400          # group-shared rare shingles (the candidate driver)
BAND = 600           # per-band filler shingles (disjoint ranges)
THRESH = (1, 2)      # Jaccard 0.5: block overlap 400/1600 = 0.25 fails


def make_docs(spark):
    """Shingle-grain table (doc_id, tok) built directly — the A/B
    times the join machinery, not tokenization. Bands are assigned
    i mod g so same-group docs (consecutive ids) never share a band."""
    from pyspark.sql import functions as F

    n_docs = G_GROUPS * G_SIZE
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    block_toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {BLOCK - 1}), j -> concat("
                f"'blk', lpad(CAST(CAST(doc_id / {G_SIZE} AS INT) AS "
                f"STRING), 4, '0'), '_', lpad(CAST(j AS STRING), 4, "
                f"'0')))"
            )
        ).alias("tok"),
    )
    band_toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {BAND - 1}), j -> concat("
                f"'fil', lpad(CAST(doc_id % {G_SIZE} AS STRING), 4, "
                f"'0'), '_', lpad(CAST(j AS STRING), 4, '0')))"
            )
        ).alias("tok"),
    )
    return block_toks.unionByName(band_toks)


def main() -> None:
    from pyspark.sql import SparkSession

    from supplier_performance_data_pipeline_spark.session import tune_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("bench-suffix-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_session(spark)

    # The A/B drives the token-grain entry point directly so the fat
    # sets are exact — same candidate + verify pipeline as the public
    # shingle join.
    from pyspark.sql import functions as F

    from supplier_performance_data_pipeline_spark.operators import dedup as D

    dt = make_docs(spark).localCheckpoint()
    num, den = THRESH
    n_rows = dt.count()
    print(f"shingle rows: {n_rows}")

    def run(suffix_probes, label):
        t0 = time.monotonic()
        out = D.jaccard_prefix_join_tokens(
            dt, num, den, suffix_probes=suffix_probes
        )
        n = out.count()
        dt_s = round(time.monotonic() - t0, 3)
        print(f"{label}: {dt_s}s ({n} surviving pairs)")
        return dt_s, n

    results = {}
    for rep in range(2):
        for probes, label in ((None, "suffix_off"), (8, "suffix_on_p8"),
                              (2, "suffix_on_p2")):
            sec, pairs = run(probes, f"rep{rep} {label}")
            prev = results.get(label)
            results[label] = {
                "sec": min(sec, prev["sec"]) if prev else sec,
                "pairs": pairs,
            }

    # Candidate volume + prune rate for the record: rebuild the
    # candidate join exactly as jaccard_prefix_join_tokens does, stop
    # before verify, and count what the suffix stage keeps.
    _, _, pfx, _ = D._prefix_index_from_tokens(dt, num, den)
    a = pfx.select(
        F.col("doc_id").alias("doc_a"), "tok",
        F.col("pos").alias("pos_a"), F.col("len").alias("la"),
    )
    b = pfx.select(
        F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b"),
        F.col("pos").alias("pos_b"), F.col("len").alias("lb"),
    )
    alpha = F.expr(f"({num} * (la + lb) + {num + den - 1}) div {num + den}")
    cand = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.lit(num) * F.col("la") <= F.lit(den) * F.col("lb"))
            & (F.lit(num) * F.col("lb") <= F.lit(den) * F.col("la"))
            & (
                F.lit(1)
                + F.least(
                    F.col("la") - F.col("pos_a"),
                    F.col("lb") - F.col("pos_b"),
                )
                >= alpha
            ),
        )
        .select("doc_a", "doc_b")
        .distinct()
    ).localCheckpoint()
    n_cand = cand.count()
    kept = D._suffix_filter(
        cand, dt,
        lambda bound, la, lb: F.lit(num + den) * bound
        >= F.lit(num) * (la + lb),
        probes=8,
    ).count()
    print(f"candidates: {n_cand}, suffix-kept(P=8): {kept}")

    from bench import _round_files

    rounds = [r for r, _ in _round_files()]
    record = {
        "measured_round": (max(rounds) + 1) if rounds else 1,
        "fixture": {
            "groups": G_GROUPS, "group_size": G_SIZE,
            "block_shingles": BLOCK, "band_shingles": BAND,
            "set_size": BLOCK + BAND, "threshold": f"{num}/{den}",
            "shingle_rows": n_rows,
        },
        "candidates": n_cand,
        "suffix_kept_p8": kept,
        "prune_rate_p8": round(1 - kept / n_cand, 4) if n_cand else None,
        "times_sec": results,
        "verdict": None,  # filled below
    }
    off = results["suffix_off"]["sec"]
    on8 = results["suffix_on_p8"]["sec"]
    on2 = results["suffix_on_p2"]["sec"]
    best_on = min(on8, on2)
    record["verdict"] = (
        f"suffix ON wins {off / best_on:.2f}x at the fat-doc fixture"
        if best_on < off
        else (
            f"negative result: ON {best_on / off:.2f}x slower even at "
            "|set|=1000 with ~100% prunable candidates — the "
            "interpreted probe's per-pair cost tracks the vectorized "
            "verify's linearly (both O(|set|)), so locally ON cannot "
            "win; the regime needs network-bound/spilling verify"
        )
    )
    out = os.path.join(HERE, "SUFFIX_AB.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
