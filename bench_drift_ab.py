"""Interleaved same-window A/B of the r9 tree vs the r11 tree
(r11 VERDICT #1 — the decisive drift experiment).

Question: BENCH_r11's shared-query median vs r9 is 1.28 with every
per-round flag system quiet. The flag system normalizes by the MEDIAN
query ratio, so a genuinely UNIFORM software regression is invisible
to it by construction — and cumulative cross-round comparisons are
confounded by host ambience (2-6x co-tenant windows, memory). The one
experiment that separates the two: run BOTH trees' registries on the
SAME fixed query subset, alternating tree-by-tree inside ONE idle
window, paired per query. Host ambience hits adjacent invocations
equally; a software regression splits the pair.

Design:
- Subset: top-10 shared queries by r9 time + the 20 fastest shared
  sub-second queries (the uniform-drift tail the verdict named) —
  names pinned below from BENCH_LOCAL_r9/r11.json.
- Trees: git worktrees of the round-tagged commits (r9 = 39c50f6,
  r11 = 030ae7f) under .drift_ab/ (gitignored). The runner subprocess
  prepends the target tree to sys.path, so each invocation imports
  THAT tree's package, session tuning, and registry — config drift is
  part of what's under test.
- Methodology per invocation, mirroring bench.py: get_spark from the
  tree, warm (cheapest query + mapInPandas daemon), host calibration
  min-of-2, then TWO passes over the subset timing build+toPandas,
  min-of-2 per query, clearCache between queries.
- Interleave: r9, r11, r9, r11, r9, r11 (3 paired reps), a loadavg
  gate (<2.0 1-min) before each invocation, loadavg recorded per
  invocation.
- Verdict rule (from the r11 VERDICT): paired median >= 1.10 on the
  same host minute = real regression, name the culprit; ~1.0 = close
  the drift question and re-anchor comparisons to the r11 row.

Writes DRIFT_AB.json at the repo root (round stamp delegated to
bench._round_files like the other probe artifacts).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
AB_DIR = os.path.join(REPO, ".drift_ab")
TREES = {"r9": "39c50f6", "r11": "030ae7f"}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(os.environ.get("SPARK_GRAFT_DRIFT_PAIRS", "3"))

# Fixed subset (BENCH_LOCAL_r9.json x BENCH_LOCAL_r11.json, shared):
TOP10 = [
    "streaming_left_outer_equivalence",
    "streaming_throttle_equivalence",
    "ann_ivfpq_recall_audit",
    "corpus_full_curation",
    "ann_index_persist_roundtrip",
    "supplier_pagerank",
    "ann_ivfpq_adc_topk",
    "ann_ivfpq_multiprobe_topk",
    "streaming_state_ttl_eviction",
    "dedup_cluster_chaining_audit",
]
SMALL20 = [
    "weighted_reservoir_sample",
    "document_chunks",
    "dedup_exact",
    "discount_revenue_forecast",
    "supplier_scd2_history",
    "ann_cosine_topk",
    "customer_jsonl_roundtrip",
    "embedding_label_centroids",
    "supplier_name_fuzzy_matches",
    "part_orc_roundtrip",
    "quantity_percentiles_by_flag",
    "embedding_quantize_int8",
    "events_view_purchase_funnel",
    "multimodal_features",
    "events_hourly_rollup",
    "totalprice_benford_audit",
    "order_status_priority_pivot",
    "events_time_to_purchase_quantiles",
    "multimodal_byte_entropy",
    "vocab_top_terms",
]
SUBSET = TOP10 + SMALL20


def _loadavg() -> tuple[float, float, float]:
    with open("/proc/loadavg") as f:
        a, b, c = f.read().split()[:3]
    return float(a), float(b), float(c)


def _gate(threshold: float = 2.0, max_wait: float = 900.0) -> dict:
    t0 = time.monotonic()
    while _loadavg()[0] >= threshold and time.monotonic() - t0 < max_wait:
        time.sleep(10)
    l1, l5, l15 = _loadavg()
    return {
        "loadavg": [l1, l5, l15],
        "waited_sec": round(time.monotonic() - t0, 1),
        "proceeded_hot": l1 >= threshold,
    }


def _runner(tree: str) -> None:
    """Subprocess body: import the TARGET tree's package and time the
    subset exactly like bench.py does. Prints one JSON line."""
    sys.path.insert(0, tree)
    from supplier_performance_data_pipeline_spark.plans.registry import (
        load_all,
    )
    from supplier_performance_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="drift_ab")
    specs = load_all()
    names = [n for n in SUBSET if n in specs]
    # warm: cheapest subset query + the Python/Arrow worker daemons
    specs[names[-1]].build(spark, SF_DIR).limit(1).collect()
    spark.range(64, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).collect()
    cal = float("inf")
    for _ in range(2):
        c0 = time.perf_counter()
        spark.range(2_000_000_000, numPartitions=32).selectExpr(
            "sum((id * 31) % 1000003) AS s"
        ).collect()
        cal = min(cal, time.perf_counter() - c0)
    times: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            t0 = time.perf_counter()
            rows = specs[name].build(spark, SF_DIR).toPandas()
            dt = time.perf_counter() - t0
            assert rows is not None
            times[name] = round(min(times.get(name, float("inf")), dt), 4)
            spark.catalog.clearCache()
    print(
        "DRIFT_JSON:"
        + json.dumps({"cal": round(cal, 4), "times": times})
    )
    spark.stop()


def _ensure_worktree(label: str, commit: str) -> str:
    path = os.path.join(AB_DIR, label)
    if not os.path.isdir(os.path.join(path, ".git")) and not os.path.isfile(
        os.path.join(path, ".git")
    ):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, commit],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    return path


def main() -> None:
    trees = {k: _ensure_worktree(k, c) for k, c in TREES.items()}
    invocations = []
    for pair in range(PAIRS):
        for label in ("r9", "r11"):
            gate = _gate()
            t0 = time.monotonic()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--runner",
                 trees[label]],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = next(
                (
                    ln
                    for ln in proc.stdout.splitlines()
                    if ln.startswith("DRIFT_JSON:")
                ),
                None,
            )
            if proc.returncode != 0 or line is None:
                sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
                raise SystemExit(
                    f"runner failed for {label} pair {pair}: "
                    f"rc={proc.returncode}"
                )
            rec = json.loads(line[len("DRIFT_JSON:"):])
            invocations.append(
                {
                    "pair": pair,
                    "tree": label,
                    "gate": gate,
                    "wall_sec": round(time.monotonic() - t0, 1),
                    **rec,
                }
            )
            print(
                f"[drift_ab] pair {pair} {label}: cal={rec['cal']} "
                f"subset_total={round(sum(rec['times'].values()), 1)}s "
                f"load={gate['loadavg']}",
                flush=True,
            )

    # Paired analysis: per pair, per query, ratio r11/r9 from the SAME
    # window minute; then the median over queries per pair, and the
    # cross-pair median of per-query MEDIAN ratios as the headline.
    names = sorted(
        set.intersection(
            *(set(inv["times"]) for inv in invocations)
        )
    )
    by = {
        (inv["pair"], inv["tree"]): inv["times"] for inv in invocations
    }
    per_pair_medians = []
    per_query_ratios: dict[str, list[float]] = {n: [] for n in names}
    for pair in range(PAIRS):
        ratios = {
            n: by[(pair, "r11")][n] / by[(pair, "r9")][n] for n in names
        }
        for n in names:
            per_query_ratios[n].append(ratios[n])
        per_pair_medians.append(
            round(statistics.median(ratios.values()), 4)
        )
    per_query_median = {
        n: round(statistics.median(v), 4)
        for n, v in per_query_ratios.items()
    }
    headline = round(
        statistics.median(per_query_median.values()), 4
    )
    cal_ratio = round(
        statistics.median(
            [inv["cal"] for inv in invocations if inv["tree"] == "r11"]
        )
        / statistics.median(
            [inv["cal"] for inv in invocations if inv["tree"] == "r9"]
        ),
        4,
    )
    top10_median = round(
        statistics.median(per_query_median[n] for n in TOP10 if n in names),
        4,
    )
    small_median = round(
        statistics.median(
            per_query_median[n] for n in SMALL20 if n in names
        ),
        4,
    )
    out = {
        "experiment": "interleaved same-window A/B, r9 tree vs r11 tree",
        "commits": TREES,
        "sf_dir": SF_DIR,
        "pairs": PAIRS,
        "subset_n": len(names),
        "paired_median_ratio_r11_over_r9": headline,
        "per_pair_medians": per_pair_medians,
        "top10_median_ratio": top10_median,
        "small20_median_ratio": small_median,
        "cal_ratio_r11_over_r9": cal_ratio,
        "per_query_median_ratio": per_query_median,
        "invocations": invocations,
        "verdict_rule": (
            ">=1.10 paired => software regression, name culprit; "
            "~1.0 => drift was host ambience, close question, "
            "re-anchor to the r11 row"
        ),
        "conclusion": (
            "regression_suspected" if headline >= 1.10 else "ambience"
        ),
    }
    path = os.path.join(REPO, "DRIFT_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"[drift_ab] wrote {path}: paired median {headline} "
          f"(top10 {top10_median}, small20 {small_median}, "
          f"cal {cal_ratio}) -> {out['conclusion']}")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--runner":
        _runner(sys.argv[2])
    else:
        main()
