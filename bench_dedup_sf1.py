"""One-shot dedup/connected-components scale probe (round-9): prove the
MinHash-LSH -> star-contraction pipeline's structural claims at a scale
two orders beyond the driver fixture.

The sf0.1 documents fixture is 5,000 rows — small enough that "bucketed
LSH, never all-pairs" and "CC converges in O(log n) rounds" are design
claims rather than measurements. This script fabricates a DETERMINISTIC
sf1-shaped documents table (500,000 docs, 100x sf0.1, same parquet
schema: doc_id int64, text string, lang string, source string, n_chars
int64) with a planted near-duplicate structure (~60k clusters of 2–5
mutated copies over ~10% of the corpus, plus a band of byte-exact
copies), then measures the Spark arm of:

- term isolation of the pipeline the cluster-keyed queries share
  (``_doc_clusters``): signature projection, LSH candidate+verify
  pairs, star-contraction components — each timed alone, with the
  quadratic-work-avoided ratio (candidate pairs vs n(n-1)/2) and the
  measured CC round count vs the Kiveris O(log n) bound recorded,
- three registered cluster-keyed queries end-to-end at the sf1 dir
  (``dedup_components``, ``dedup_rate_by_source``,
  ``corpus_leakage_safe_split``), 2 reps, min taken.

Output: DEDUP_SF1.json at the repo root (picked up by bench.py into
BENCH_LOCAL_r{N}.json under "dedup_sf1", same attach as ANN_SF1 /
SUFFIX_AB). Oracle parity is NOT re-checked here — the same builders
are driver-green at sf0.001/0.01/0.1; this records wall-clock and
structural counters only. Run manually (takes minutes); kept out of the
per-round bench so the driver's bench timeout stays predictable.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
DATA_DIR = "/tmp/spark_graft_sf1_dedup"
N_DOCS = 500_000
VOCAB = 500
SEED = 42
LANGS = ["en", "de", "es", "fr", "zh"]
N_SOURCES = 20


def generate() -> str:
    """Deterministic 500k-doc corpus with planted near-dup clusters.

    Base docs draw 40–70 tokens uniformly from a 500-word vocabulary;
    with 3-token shingles two random docs share essentially no shingles
    (shingle space 500^3), so unplanted pairs are true negatives. The
    planted structure: the first 60,000 docs are cluster seeds; each
    seed gets 1–4 near-dup copies (3 token positions rewritten -> ~9 of
    ~58 shingles differ, true Jaccard ~0.7, solidly above the LSH
    s-curve threshold for k=8/bands=4) and the LAST copy of every 10th
    seed is byte-exact. Remaining docs are unique filler.
    """
    path = os.path.join(DATA_DIR, "documents.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(DATA_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    words = np.array([f"w{i:03d}" for i in range(VOCAB)])

    n_seeds = 60_000
    copies = rng.integers(1, 5, size=n_seeds)  # 1..4 copies per seed
    n_copies = int(copies.sum())  # ~150k
    n_fill = N_DOCS - n_seeds - n_copies

    lens = rng.integers(40, 71, size=n_seeds + n_fill)
    base_tok = [
        rng.integers(0, VOCAB, size=n).astype(np.int16) for n in lens
    ]
    seed_tok = base_tok[:n_seeds]

    rows_tok: list[np.ndarray] = list(base_tok)
    cluster_of: list[int] = list(range(n_seeds)) + [-1] * n_fill
    for s in range(n_seeds):
        t = seed_tok[s]
        for c in range(copies[s]):
            if c == copies[s] - 1 and s % 10 == 0:
                m = t.copy()  # byte-exact duplicate
            else:
                m = t.copy()
                pos = rng.choice(len(t), size=3, replace=False)
                m[pos] = rng.integers(0, VOCAB, size=3)
            rows_tok.append(m)
            cluster_of.append(s)

    order = rng.permutation(len(rows_tok))
    texts = [" ".join(words[rows_tok[i]]) for i in order]
    clusters = np.array(cluster_of, dtype=np.int64)[order]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(
                [LANGS[i % len(LANGS)] for i in range(n)]
            ),
            # cluster members share a source (per-source dedup rates
            # stay meaningful); unique filler (cluster -1) spreads by
            # row position instead of piling into one source
            "source": pa.array(
                [
                    f"src{(int(h) if h >= 0 else i) % N_SOURCES}"
                    for i, h in enumerate(clusters)
                ]
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, path)
    return path


def main() -> None:
    generate()
    from pyspark.sql import SparkSession, functions as F

    from supplier_performance_data_pipeline_spark.operators.dedup import (
        MINHASH_K,
        lsh_candidate_pairs,
        minhash_signatures,
        near_dup_pairs_cached,
    )
    from supplier_performance_data_pipeline_spark.operators.graph import (
        connected_components,
    )
    from supplier_performance_data_pipeline_spark.plans.queries_text import (
        CC_MIN_MATCH,
    )
    from supplier_performance_data_pipeline_spark.plans.registry import (
        load_all,
    )
    from supplier_performance_data_pipeline_spark.session import tune_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("bench-dedup-sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_session(spark)
    docs = spark.read.parquet(os.path.join(DATA_DIR, "documents.parquet"))
    docs.count()  # warm the JVM/codegen on the real data shape

    # --- term isolation of the _doc_clusters pipeline -------------------
    # Two reps, min per term: the host this runs on shows 2-8x noise
    # windows (a contended first measurement of the CC term read 79s
    # against an isolated 10s), and single-shot numbers here would
    # publish that noise as engine cost.
    sig_sec = cand_sec = pairs_sec = cc_sec = None
    n_sigs = n_cand = n_pairs = n_comp = 0
    cc_stats: dict = {}
    all_pairs = N_DOCS * (N_DOCS - 1) // 2
    for rep in range(2):
        t0 = time.monotonic()
        sigs = minhash_signatures(docs).localCheckpoint()
        n_sigs = sigs.count()
        dt = round(time.monotonic() - t0, 3)
        sig_sec = dt if sig_sec is None else min(sig_sec, dt)
        print(f"rep{rep} signatures: {dt}s ({n_sigs} rows)")

        t0 = time.monotonic()
        n_cand = lsh_candidate_pairs(sigs).count()
        dt = round(time.monotonic() - t0, 3)
        cand_sec = dt if cand_sec is None else min(cand_sec, dt)
        print(f"rep{rep} lsh candidates: {dt}s ({n_cand} of {all_pairs})")

        t0 = time.monotonic()
        pairs_df, sig_handle = near_dup_pairs_cached(docs)
        pairs = pairs_df.filter(
            F.col("n_matching_components") >= CC_MIN_MATCH
        ).localCheckpoint()
        n_pairs = pairs.count()
        sig_handle.unpersist()
        dt = round(time.monotonic() - t0, 3)
        pairs_sec = dt if pairs_sec is None else min(pairs_sec, dt)
        print(f"rep{rep} verified pairs (>= {CC_MIN_MATCH}/{MINHASH_K}): "
              f"{dt}s ({n_pairs} pairs)")

        cc_stats = {}
        t0 = time.monotonic()
        comp = connected_components(pairs, stats_out=cc_stats)
        n_comp = comp.select("component").distinct().count()
        dt = round(time.monotonic() - t0, 3)
        cc_sec = dt if cc_sec is None else min(cc_sec, dt)
        print(f"rep{rep} connected components: {dt}s ({n_comp} clusters, "
              f"stats {cc_stats})")

    # --- adversarial CC: scrambled 100k-vertex chain ---------------------
    # The planted clusters above are tiny (2-5 members); the star-
    # contraction's worst case is a giant component of maximum DIAMETER
    # whose vertex ids are scrambled against the path order (defeats
    # O(diameter) min-label propagation outright). Pin the measured
    # round count against the Kiveris O(log n) bound at n=100k.
    n_chain = 100_000
    rng = np.random.default_rng(SEED + 1)
    perm = rng.permutation(n_chain).astype(np.int64)
    chain = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(perm, perm[1:])],
        "doc_a long, doc_b long",
    )
    chain_stats: dict = {}
    t0 = time.monotonic()
    chain_cc = connected_components(
        chain, stats_out=chain_stats, max_iters=64
    )
    n_chain_comp = chain_cc.select("component").distinct().count()
    chain_sec = round(time.monotonic() - t0, 3)
    print(f"adversarial chain: {chain_sec}s ({n_chain_comp} component, "
          f"stats {chain_stats})")
    assert n_chain_comp == 1, "scrambled chain must collapse to one"

    # --- registered cluster-keyed queries end-to-end at the sf1 dir -----
    specs = load_all()
    names = (
        "dedup_components",
        "dedup_rate_by_source",
        "corpus_leakage_safe_split",
    )
    times: dict[str, float] = {}
    for rep in range(2):
        for name in names:
            t0 = time.monotonic()
            n = specs[name].build(spark, DATA_DIR).count()
            dt = round(time.monotonic() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
            spark.catalog.clearCache()
            print(f"rep{rep} {name}: {dt}s ({n} rows)")

    # --- exact-collapse A/B in ITS regime: duplicate-dominated corpus --
    # The sf0.1 fixture has 8 duplicate texts in 5,000 docs, so the
    # collapse is pure overhead there (annotated INTENDED_PLAN_TRADES).
    # This is the shape it exists for: one boilerplate text crawled 6k
    # times. OFF: a 6k-row LSH bucket -> 18M candidate pairs through
    # the self-join + verify, and CC's first star round over an
    # 18M-edge clique. ON: 5,999 member edges, LSH only over unique
    # texts. Components identical (tests/test_exact_collapse.py).
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        doc_components,
    )

    hot_n = 6_000
    hot = " ".join(f"h{i:02d}" for i in range(60))
    fill = [(hot_n + i, " ".join(f"f{i}x{j}" for j in range(12)))
            for i in range(8_000)]
    dup_docs = spark.createDataFrame(
        [(i, hot) for i in range(hot_n)] + fill, "doc_id long, text string"
    ).localCheckpoint()
    ab: dict[str, float] = {}
    for label, flag in (("collapse_on", True), ("collapse_off", False)):
        t0 = time.monotonic()
        n = doc_components(dup_docs, min_match=4, collapse_exact=flag).count()
        ab[label] = round(time.monotonic() - t0, 3)
        print(f"{label}: {ab[label]}s ({n} rows)")

    # --- incremental CC maintenance: two-batch replay at sf1 -----------
    # (round-10) The production ingest shape: ~10% of the corpus plays
    # a newly-landed batch against the other 90%'s STORED component
    # table. The full-graph terms above (pairs_end_to_end +
    # connected_components) are the recompute cost this path avoids;
    # the incremental terms are (a) the batch's edge generation — probe
    # vs the persistent index, never index-vs-index — and (b)
    # star-contraction over the CONTRACTED graph only. The load-bearing
    # claims are deterministic: contracted edge/vertex counts vs the
    # full graph's, and an EXACT equality check of the incremental
    # labels against the full recompute at 500k docs.
    from supplier_performance_data_pipeline_spark.operators.dedup import (
        near_dup_component_edges,
        verified_pairs_between,
    )
    from supplier_performance_data_pipeline_spark.operators.graph import (
        incremental_components,
    )
    from supplier_performance_data_pipeline_spark.operators.sampling import (
        md5_mod,
    )

    is_batch = md5_mod(F.col("doc_id"), "incr|", 10) == 0
    index_docs = docs.filter(~is_batch).localCheckpoint()
    batch_docs = docs.filter(is_batch).localCheckpoint()
    n_batch = batch_docs.count()
    # Stored state (pre-paid when those docs arrived): component table
    # + persistent signature table of the index side. Outside the
    # timed terms, like the ANN probe's build-vs-serve isolation.
    old_labels = doc_components(
        index_docs, min_match=CC_MIN_MATCH
    ).localCheckpoint()
    index_sigs = minhash_signatures(index_docs).localCheckpoint()
    old_labels.count(), index_sigs.count()

    incr_edges_sec = incr_cc_sec = None
    incr_stats: dict = {}
    n_new_edges = 0
    for rep in range(2):
        t0 = time.monotonic()
        batch_sigs = minhash_signatures(batch_docs)
        new_edges = (
            verified_pairs_between(batch_sigs, index_sigs)
            .filter(F.col("n_matching_components") >= CC_MIN_MATCH)
            .select("doc_a", "doc_b")
            .unionByName(
                near_dup_component_edges(batch_docs, min_match=CC_MIN_MATCH)
            )
            .localCheckpoint()
        )
        n_new_edges = new_edges.count()
        dt = round(time.monotonic() - t0, 3)
        incr_edges_sec = dt if incr_edges_sec is None else min(incr_edges_sec, dt)
        print(f"rep{rep} incr batch edges: {dt}s ({n_new_edges} edges)")

        incr_stats = {}
        t0 = time.monotonic()
        incr_labels = incremental_components(
            old_labels, new_edges, stats_out=incr_stats
        ).localCheckpoint()
        n_incr = incr_labels.count()
        dt = round(time.monotonic() - t0, 3)
        incr_cc_sec = dt if incr_cc_sec is None else min(incr_cc_sec, dt)
        print(f"rep{rep} incr CC: {dt}s ({n_incr} labels, stats {incr_stats})")

    # Exact equality vs the full recompute measured above (comp) —
    # deterministic, the probe's load-bearing claim.
    full_labels = comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("c_full")
    )
    incr_cmp = incr_labels.select(
        F.col("id").alias("doc_id"), F.col("component").alias("c_incr")
    )
    n_mismatch = (
        full_labels.join(incr_cmp, "doc_id", "full")
        .filter(
            F.col("c_full").isNull()
            | F.col("c_incr").isNull()
            | (F.col("c_full") != F.col("c_incr"))
        )
        .count()
    )
    assert n_mismatch == 0, f"incremental != full recompute: {n_mismatch}"
    print(f"incremental == full recompute on all "
          f"{full_labels.count()} labels")

    # --- quantile_blocks reliable-knob A/B (r10 VERDICT #8) -------------
    # The r10 knob landed with correctness pins but no scale cost
    # number. Rank all 500k docs by text length through the full
    # two-level prefix (quantile_blocks -> blocked_row_number) under
    # both materialization modes: localCheckpoint (default; fastest,
    # truncates lineage) vs persist(DISK_ONLY)+eager count
    # (reliable=True; lineage kept for preemptible executors). Result
    # equality is asserted via a full-rank checksum (Σ rank·doc_id —
    # order-free exact in int64 at this scale), the deterministic
    # load-bearing claim; the timing pair is the cost of fault
    # tolerance at 100x driver scale. min-of-2 per mode.
    from supplier_performance_data_pipeline_spark.operators.ranking import (
        blocked_row_number,
        quantile_blocks,
    )

    rank_in = docs.select("doc_id", F.length("text").alias("v"))
    qb_sec: dict[str, float] = {}
    qb_checksum: dict[str, int] = {}
    for mode_name, reliable in (
        ("localcheckpoint", False), ("disk_only_reliable", True),
    ):
        for rep in range(2):
            handles: list = []
            t0 = time.monotonic()
            ranked = blocked_row_number(
                quantile_blocks(
                    rank_in, "v", desc=True, reliable=reliable,
                    release=handles,
                ),
                [F.desc("v"), F.asc("doc_id")],
            )
            chk = ranked.agg(
                F.sum(F.col("rn") * F.col("doc_id"))
            ).first()[0]
            dt = round(time.monotonic() - t0, 3)
            for h in handles:
                h.unpersist(blocking=True)
            qb_sec[mode_name] = min(qb_sec.get(mode_name, dt), dt)
            qb_checksum[mode_name] = int(chk)
            print(f"rep{rep} quantile_blocks {mode_name}: {dt}s "
                  f"(checksum {chk})")
    assert (
        qb_checksum["localcheckpoint"] == qb_checksum["disk_only_reliable"]
    ), f"reliable-knob rank divergence: {qb_checksum}"

    # Round stamp DELEGATED to bench.py's _round_files() so this record
    # and the BENCH_LOCAL record it gets embedded into can never drift
    # (same rule as ANN_SF1 / SUFFIX_AB).
    from bench import _round_files

    rounds = [r for r, _ in _round_files()]
    record = {
        "measured_round": (max(rounds) + 1) if rounds else 1,
        "docs": N_DOCS,
        "vocab": VOCAB,
        "seed": SEED,
        "planted": {
            "cluster_seeds": 60_000,
            "copies_per_seed": "1-4 (3-token mutations, true J ~0.7)",
            "exact_copy_band": "last copy of every 10th seed",
        },
        "note": (
            "deterministic synthetic corpus, 100x the sf0.1 documents "
            "fixture; wall-clock of the Spark arm only (oracle parity "
            "is certified at sf0.001/0.01/0.1 by the driver). Term "
            "isolation times the _doc_clusters pipeline stages alone; "
            "queries_sec is registered builders end-to-end at the sf1 "
            "dir"
        ),
        "host_noise_note": (
            "this host shows intermittent co-tenant load windows worth "
            "2-6x on the shuffle-heavy terms even under min-of-2 (the "
            "verify-join term was observed between 21s and 131s across "
            "four otherwise-identical runs; the CC term between 8.4s "
            "and 16s). Structural counters (candidate/verified pair "
            "counts, CC rounds, A/B ratios within a run) are "
            "deterministic and are the load-bearing claims"
        ),
        "term_isolation_sec": {
            "minhash_signatures": sig_sec,
            "lsh_candidates": cand_sec,
            "pairs_end_to_end": pairs_sec,
            "connected_components": cc_sec,
        },
        "structural": {
            "candidate_pairs": n_cand,
            "verified_pairs": n_pairs,
            "all_pairs": all_pairs,
            "quadratic_work_avoided": round(all_pairs / max(n_cand, 1)),
            "cc_rounds": cc_stats.get("rounds"),
            "cc_converged": cc_stats.get("converged"),
            "cc_verts": cc_stats.get("verts"),
            "cc_edges": cc_stats.get("edges"),
            "clusters": n_comp,
            "cc_rounds_note": (
                "Kiveris star-contraction bound is O(log n) round "
                "pairs; the probe pins the measured count so a scale-up "
                "that starts tracking n instead of log n is visible"
            ),
        },
        "queries_sec": times,
        "exact_collapse_ab": {
            "fixture": {
                "hot_copies": hot_n,
                "unique_filler": 8_000,
                "off_bucket_pairs": hot_n * (hot_n - 1) // 2,
                "on_member_edges": hot_n - 1,
            },
            "times_sec": ab,
            "off_over_on_ratio": round(
                ab["collapse_off"] / ab["collapse_on"], 2
            ),
            "note": (
                "duplicate-dominated regime the collapse exists for; at "
                "the near-duplicate-free sf0.1 fixture it is ~+1-2s pure "
                "overhead (INTENDED_PLAN_TRADES in bench.py)"
            ),
        },
        "incremental_cc": {
            "batch_docs": n_batch,
            "batch_share": round(n_batch / N_DOCS, 4),
            "new_edges": n_new_edges,
            "term_isolation_sec": {
                "batch_edges": incr_edges_sec,
                "incremental_cc": incr_cc_sec,
                "full_equivalent_pairs": pairs_sec,
                "full_equivalent_cc": cc_sec,
            },
            "contracted_edges": incr_stats.get("contracted_edges"),
            "contracted_verts": incr_stats.get("contracted_verts"),
            "full_cc_edges": cc_stats.get("edges"),
            "full_cc_verts": cc_stats.get("verts"),
            "rounds": incr_stats.get("rounds"),
            "converged": incr_stats.get("converged"),
            "equal_to_full_recompute": True,
            "note": (
                "two-batch replay: md5_mod bucket 0 (~10%) lands as a "
                "batch against the other 90%'s stored component table "
                "and persistent signature table (both built outside "
                "the timed terms — they were paid at original ingest). "
                "Edge generation probes the index, never "
                "index-vs-index; star-contraction runs on the "
                "CONTRACTED graph (touched roots + new vertices). "
                "equal_to_full_recompute is an exact full-outer-join "
                "check over all labels, asserted in-run"
            ),
        },
        "quantile_blocks_reliable_ab": {
            "rows": N_DOCS,
            "localcheckpoint_sec": qb_sec["localcheckpoint"],
            "disk_only_reliable_sec": qb_sec["disk_only_reliable"],
            "reliable_over_default_ratio": round(
                qb_sec["disk_only_reliable"] / qb_sec["localcheckpoint"], 4
            ),
            "rank_checksums_equal": True,
            "note": (
                "full two-level prefix rank (quantile_blocks -> "
                "blocked_row_number) over 500k rows under both "
                "materialization modes; equality asserted in-run via "
                "the Σ rank·doc_id checksum. The reliable mode's "
                "premium is the price of lineage-kept DISK_ONLY "
                "blocks on preemptible executors (r10 knob, r10 "
                "ADVICE unpersist handle exercised both reps)"
            ),
        },
        "adversarial_chain": {
            "verts": n_chain,
            "shape": (
                "single path, vertex ids scrambled against path order "
                "(max diameter; defeats O(diameter) label propagation)"
            ),
            "sec": chain_sec,
            "rounds": chain_stats.get("rounds"),
            "converged": chain_stats.get("converged"),
            "log2_n": round(float(np.log2(n_chain)), 2),
        },
    }
    out = os.path.join(HERE, "DEDUP_SF1.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
