"""Skew helpers: salted join must be exactly a plain inner join."""

from __future__ import annotations

from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows hit one hot key — the shape salting exists for.
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("attr")
    )
    plain = fact.join(dim, "k").select("k", "payload", "attr")
    salted = salted_join(fact, dim, "k").select("k", "payload", "attr")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_stratified_hash_sample_rates_and_determinism(spark):
    from supplier_performance_data_pipeline_spark.operators.sampling import (
        stratified_hash_sample,
    )
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    rates = {"true": 0.5, "false": 0.1}
    a = stratified_hash_sample(df, "id", "s", rates)
    b = stratified_hash_sample(df, "id", "s", rates)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))  # rerun-stable
    counts = {r["s"]: r["n"] for r in a.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["true"] / 2500 - 0.5) < 0.05
    assert abs(counts["false"] / 2500 - 0.1) < 0.05
