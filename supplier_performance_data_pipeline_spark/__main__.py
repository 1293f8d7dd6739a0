"""CLI — the engine's shell entry points, mirroring the reference's
``python src/<script>.py`` workflow (README.md:260-272 of the reference):

    python -m supplier_performance_data_pipeline_spark pipeline --warehouse /tmp/wh
    python -m supplier_performance_data_pipeline_spark queries
    python -m supplier_performance_data_pipeline_spark query supplier_kpis --sf-dir /root/testdata/sf0.01
    python -m supplier_performance_data_pipeline_spark sql "SELECT * FROM supplier_risk_summary LIMIT 5"

``pipeline`` is the 4-stage batch DAG (generate → load → KPIs → risk);
``query`` runs any registered query; ``sql`` is the open SQL surface
over the warehouse views (the dashboard's arbitrary-SELECT parity).
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="supplier_performance_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pipeline", help="run the 4-stage batch pipeline")
    pp.add_argument("--warehouse", required=True)
    pp.add_argument("--seed", type=int, default=42)
    pp.add_argument("--suppliers", type=int, default=15)
    pp.add_argument("--pos", type=int, default=600)

    sub.add_parser("queries", help="list registered queries")

    qp = sub.add_parser("query", help="run one registered query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    qp.add_argument("--limit", type=int, default=50)

    sp = sub.add_parser("sql", help="SQL over the warehouse views")
    sp.add_argument("statement")
    sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sp.add_argument("--limit", type=int, default=50)

    args = p.parse_args(argv)

    from supplier_performance_data_pipeline_spark.plans.registry import load_all

    if args.cmd == "queries":
        for name in sorted(load_all()):
            print(name)
        return 0

    from supplier_performance_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")
    try:
        if args.cmd == "pipeline":
            from supplier_performance_data_pipeline_spark.generator import (
                GeneratorConfig,
            )
            from supplier_performance_data_pipeline_spark.plans.pipeline import (
                run_pipeline,
            )

            cfg = GeneratorConfig(
                seed=args.seed, n_suppliers=args.suppliers, n_pos=args.pos
            )
            tables = run_pipeline(spark, args.warehouse, cfg)
            for name, df in tables.items():
                if name.startswith("_"):
                    continue
                print(f"{name}: {df.count()} rows -> {args.warehouse}/{name}")
        elif args.cmd == "query":
            specs = load_all()
            if args.name not in specs:
                print(
                    f"unknown query {args.name!r}; run `queries` to list",
                    file=sys.stderr,
                )
                return 2
            specs[args.name].build(spark, args.sf_dir).show(
                args.limit, truncate=False
            )
        elif args.cmd == "sql":
            from supplier_performance_data_pipeline_spark.api import create_views

            create_views(spark, args.sf_dir)
            spark.sql(args.statement).show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
