"""Distributed generator + SQL-view API."""

from __future__ import annotations

from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.api import create_views
from supplier_performance_data_pipeline_spark.generator import (
    generate_lineage_at_scale,
)
from tests.conftest import SF_SMOKE


def test_scale_generator_invariants(spark):
    n = 100_000
    df = generate_lineage_at_scale(spark, n, n_suppliers=50, seed=7).cache()
    assert df.count() == n
    assert df.select("po_id").distinct().count() == n  # unique keys
    bad = df.filter(
        (F.col("quantity_delivered") > F.col("quantity_ordered"))
        | (F.col("quantity_ordered") < 10)
        | (F.col("quantity_ordered") > 500)
    ).count()
    assert bad == 0
    # Aggregate rates land in the configured family's plausible range
    # (late 22%+uplift, quality 4%+uplift).
    rates = df.agg(
        F.avg((F.col("delivery_date") > F.col("promised_date")).cast("int")).alias("late"),
        F.avg("quality_issues").alias("q"),
    ).collect()[0]
    assert 0.2 < rates["late"] < 0.5
    assert 0.03 < rates["q"] < 0.15
    df.unpersist()


def test_scale_generator_deterministic(spark):
    a = generate_lineage_at_scale(spark, 1000, 10, seed=3).collect()
    b = generate_lineage_at_scale(spark, 1000, 10, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sql_view_api(spark):
    views = create_views(spark, SF_SMOKE)
    assert "lineitem" in views and "supplier_kpis" in views
    out = spark.sql(
        "SELECT COUNT(*) AS n FROM supplier_kpis WHERE n_pos > 0"
    ).collect()
    assert out[0]["n"] > 0
