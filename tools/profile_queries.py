#!/usr/bin/env python
"""Per-query profiling for the optimization rounds (guide §1).

For each named query (default: all headline queries), measures:
  - build_s: Python time to construct the DataFrame (plan build / py4j)
  - explain_s: time for .explain("formatted") (Catalyst analysis+optimization)
  - exec_s: min-of-N wall time for toPandas() (the bench's action)
  - noop_s: one noop-sink run (guide §1.4) to separate compute from transfer
  - n_jobs / n_stages / n_tasks: Spark scheduler work per execution
and writes the formatted plan to plans/r14/<name>_<tag>.txt.

Usage: python tools/profile_queries.py [--tag before] [--runs 2] [--plans]
           [name ...]
Output: one JSON line per query on stdout + PROFILE_<tag>.json.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from supplier_performance_data_pipeline_spark.plans.registry import load_all
from supplier_performance_data_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", action="store_true",
                    help="write plans/r14/<name>_<tag>.txt")
    ap.add_argument("--noop", action="store_true",
                    help="also time one noop-sink run per query")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    specs = load_all()
    names = args.names or [n for n in _headline() if n in specs]

    # Warm JVM/codegen + Python workers exactly like bench.py.
    specs["supplier_kpis"].build(spark, sf_dir).limit(1).collect()
    spark.range(64, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).collect()

    plans_dir = os.path.join(here, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    tracker = sc.statusTracker()
    for name in names:
        rec: dict = {}
        # plan build (Python + py4j chatter)
        t0 = time.perf_counter()
        df = specs[name].build(spark, sf_dir)
        rec["build_s"] = round(time.perf_counter() - t0, 3)
        # Catalyst analysis + optimization + physical planning
        t0 = time.perf_counter()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        rec["explain_s"] = round(time.perf_counter() - t0, 3)
        plan_txt = buf.getvalue()
        rec["plan_exchanges"] = plan_txt.count("Exchange")
        rec["plan_python"] = (
            plan_txt.count("BatchEvalPython")
            + plan_txt.count("ArrowEvalPython")
            + plan_txt.count("MapInPandas")
            + plan_txt.count("FlatMapGroupsInPandas")
        )
        rec["plan_lines"] = plan_txt.count("\n")
        if args.plans:
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan_txt)

        # Execution, min-of-N, counting scheduler work via job group.
        best = float("inf")
        group = f"prof_{name}"
        for run in range(args.runs):
            sc.setJobGroup(group + str(run), name)
            t0 = time.perf_counter()
            # fresh build each run like bench.py (build cost re-paid)
            specs[name].build(spark, sf_dir).toPandas()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            if run == args.runs - 1:
                jids = tracker.getJobIdsForGroup(group + str(run))
                rec["n_jobs"] = len(jids)
                n_stages = n_tasks = 0
                for j in jids:
                    ji = tracker.getJobInfo(j)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si is not None:
                            n_stages += 1
                            n_tasks += si.numTasks
                rec["n_stages"] = n_stages
                rec["n_tasks"] = n_tasks
            sc.setJobGroup("", "")
            spark.catalog.clearCache()
        rec["exec_s"] = round(best, 3)

        if args.noop:
            df = specs[name].build(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            rec["noop_s"] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()

        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    out = os.path.join(here, f"PROFILE_{args.tag}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


def _headline() -> list[str]:
    import bench

    return bench.HEADLINE


if __name__ == "__main__":
    main()
