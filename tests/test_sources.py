"""IO layer: CSV round-trip with explicit schema, partitioned Parquet,
overwrite idempotency (SURVEY.md §2.1 S1-S6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from supplier_performance_data_pipeline_spark.sources.readers import read_csv
from supplier_performance_data_pipeline_spark.sources.writers import write_parquet

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("d", T.DateType()),
        T.StructField("x", T.DoubleType()),
    ]
)

ROWS = [
    (1, "a", dt.date(2024, 1, 1), 1.5),
    (2, "b", dt.date(2024, 6, 2), -2.25),
    (3, None, None, None),
]


def test_csv_round_trip_schema(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "t.csv")
    df.write.option("header", True).mode("overwrite").csv(path)
    back = read_csv(spark, path, SCHEMA)
    assert back.schema == SCHEMA  # declared, never inferred
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_partitioned_parquet_prunes(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "part", F.coalesce(F.col("id") % 2, F.lit(0))
    )
    path = str(tmp_path / "p")
    write_parquet(df, path, partition_by=["part"])
    back = spark.read.parquet(path)
    pruned = back.filter(F.col("part") == 1)
    assert pruned.count() == len([r for r in ROWS if r[0] % 2 == 1])
    # Partition filter must reach the scan, not a post-filter.
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_overwrite_idempotent(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "o")
    write_parquet(df, path)
    write_parquet(df, path)  # rerun must not duplicate or fail
    assert spark.read.parquet(path).count() == len(ROWS)


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """write_table(bucket_by=...) pre-shuffles at write time; a later
    join on the bucket column must then be shuffle-free (the 100 TB
    strategy for repeatedly-joined facts)."""
    import re

    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_table,
    )

    left = spark.range(1000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(1000).selectExpr("id AS k", "id * 3 AS b")
    write_table(left, "bkt_left", bucket_by=(4, "k"))
    write_table(right, "bkt_right", bucket_by=(4, "k"))
    try:
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange hashpartitioning", plan)
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_jsonl_round_trip_schema(spark, tmp_path):
    from supplier_performance_data_pipeline_spark.sources.readers import (
        read_jsonl,
    )
    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_jsonl,
    )

    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "docs.jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, SCHEMA)
    assert back.schema == SCHEMA
    assert sorted(map(tuple, back.collect()), key=str) == sorted(
        map(tuple, ROWS), key=str
    )


def test_range_layout_files_have_disjoint_key_ranges(spark, tmp_path):
    """The data-skipping precondition: every output file owns a disjoint
    range of the layout key, so parquet min/max footer stats can prune
    files for selective predicates."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_parquet_range_layout,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    path = str(tmp_path / "li_ranged")
    write_parquet_range_layout(li, path, ["l_orderkey"], n_files=4)

    spans = []
    for f in _glob.glob(path + "/*.parquet"):
        md = _pq.read_metadata(f)
        idx = md.schema.names.index("l_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) >= 3  # range partitioner actually split the key space
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint (boundary key may touch, never overlap)
    # And the data survives intact.
    assert spark.read.parquet(path).count() == li.count()


def test_tune_session_respects_explicit_shuffle_partitions(spark):
    """tune_session right-sizes only sessions still on Spark's stock
    200 — an owner-chosen value (test fixtures, get_spark callers, a
    cluster sized to its data) must survive."""
    from supplier_performance_data_pipeline_spark.session import tune_session

    before = spark.conf.get("spark.sql.shuffle.partitions")
    assert before != "200"  # the fixture chose its own value
    tune_session(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        tune_session(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
