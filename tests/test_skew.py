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
