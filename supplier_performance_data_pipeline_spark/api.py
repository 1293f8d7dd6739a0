"""SQL entry point: register the warehouse as views and run plain SQL.

The reference's query surface is "any SQL against the DuckDB file"
(dashboard/app.py:200-214 runs user-chosen SELECTs). The Spark twin:
register every base table and derived table as a temp view, then
``spark.sql(...)`` is the same open-ended surface — with Catalyst
doing pushdown/pruning against the parquet scans underneath.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from supplier_performance_data_pipeline_spark.session import tune_session

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def create_views(
    spark: SparkSession, sf_dir: str, include_derived: bool = True
) -> list[str]:
    """Register every parquet table in ``sf_dir`` as a temp view, plus
    the derived supplier_kpis / supplier_risk_summary views. Returns the
    view names. Views are lazy — registering costs nothing; Catalyst
    prunes/pushes down per query."""
    tune_session(spark)
    # The events table stores ts as TIMESTAMP(NANOS) in some driver
    # generations (vectorized reader rejects it — read nanos as long)
    # and plain µs TIMESTAMP in others; normalize to µs timestamps
    # either way (same convention as plans/queries_events.py).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    registered = []
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events":
            from supplier_performance_data_pipeline_spark.streaming.events import (
                normalize_event_ts,
            )

            df = normalize_event_ts(df)
        df.createOrReplaceTempView(name)
        registered.append(name)
    if include_derived:
        from supplier_performance_data_pipeline_spark.plans.queries_core import (
            _kpis,
            _risk,
        )

        _kpis(spark, sf_dir).createOrReplaceTempView("supplier_kpis")
        _risk(spark, sf_dir).createOrReplaceTempView("supplier_risk_summary")
        registered += ["supplier_kpis", "supplier_risk_summary"]
    return registered


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run SQL against the registered views (call create_views first)."""
    return spark.sql(query)
