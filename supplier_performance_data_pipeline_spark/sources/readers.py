"""Sources: schema-checked CSV and Parquet readers.

Parity with the reference's loader (reference: src/load_duckdb.py:74-95 —
CSV read into pre-declared typed tables) plus the Parquet path the driver
testdata uses. Column pruning and predicate pushdown are free because we
hand Spark a declarative scan; ``.explain`` on downstream queries shows
``PushedFilters`` / pruned ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from supplier_performance_data_pipeline_spark.schemas import TESTDATA_TABLES


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV source with explicit schema — never inferSchema.

    Reference parity: src/load_duckdb.py:76-95 (read_csv_auto into
    pre-declared typed tables; the explicit DDL is the contract).
    """
    if not _exists(spark, path):
        raise FileNotFoundError(f"input not found: {path}")
    return spark.read.schema(schema).option("header", True).csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (vectorized reader, pushdown-capable)."""
    if not _exists(spark, path):
        raise FileNotFoundError(f"input not found: {path}")
    return spark.read.parquet(path)


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition a scan to cluster parallelism ONLY when its file
    layout is narrower than the cluster.

    Parquet row groups are the unit of scan parallelism; a table written
    as one file/one row group (the local fixtures) runs every map-side
    transform before the first shuffle — shingling, MinHash, n-gram
    explodes — in ONE task. At 100 TB the scan already has thousands of
    splits, `getNumPartitions() >= parallelism` holds, and this is a
    no-op: it never adds a full-table shuffle on a wide scan (which WOULD
    be a scale bug). Hash-partitioning by the row key keeps the spread
    deterministic; downstream reductions are order-free by the engine's
    partition-invariance contract (tests sweep local[3]/7-shuffle).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *keys) if keys else df.repartition(n)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines source with explicit schema — document corpora
    commonly arrive as JSONL; schema-on-read (never infer, which would
    scan the data twice and guess types). Malformed lines surface in
    ``_corrupt_record``-free PERMISSIVE nulls rather than failing the
    job — at 100 TB a single bad line must not kill the read."""
    if not _exists(spark, path):
        raise FileNotFoundError(f"input not found: {path}")
    return spark.read.schema(schema).json(path)


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver testdata tables present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def _exists(spark: SparkSession, path: str) -> bool:
    # Local paths only in this deployment; existence guardrail mirrors the
    # reference's fail-fast checks (src/load_duckdb.py:24-27).
    return os.path.exists(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC source; optional explicit schema (ORC is self-describing,
    but pinning the schema keeps the read contract independent of
    whatever the writer last emitted — same discipline as read_csv)."""
    if not _exists(spark, path):
        raise FileNotFoundError(f"input not found: {path}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: list[tuple[str, int, str]],
) -> DataFrame:
    """FIXED-WIDTH text source (the classic mainframe/enterprise feed
    format): each line is a concatenation of right-padded column
    slices; ``fields`` is [(name, width, spark_type), ...] in line
    order. Reads as ``spark.read.text`` (one scan, splittable), slices
    each column with substring arithmetic, trims the pad, and casts to
    the declared type — column positions ARE the schema, so the read
    contract is explicit by construction (the same never-inferSchema
    discipline as read_csv). Values must not contain leading/trailing
    whitespace of their own (the writer refuses them at write time,
    so the trim here removes only pad). Lines whose length differs
    from the declared total width fail loudly — out-of-range
    substrings would otherwise just yield empty/NULL fields, silently
    nulling every column of a sheared grid."""
    if not _exists(spark, path):
        raise FileNotFoundError(f"input not found: {path}")
    from pyspark.sql import functions as F

    total_width = sum(w for _, w, _ in fields)
    lines = spark.read.text(path).select(
        F.when(
            F.length("value") != total_width,
            F.raise_error(
                F.concat(
                    F.lit(
                        "fixed-width line width mismatch (expected "
                        f"{total_width}, got "
                    ),
                    F.length("value").cast("string"),
                    F.lit("): "),
                    F.col("value"),
                )
            ),
        )
        .otherwise(F.col("value"))
        .alias("value")
    )
    cols = []
    start = 1
    for name, width, typ in fields:
        cols.append(
            F.trim(F.substring(F.col("value"), start, width))
            .cast(typ)
            .alias(name)
        )
        start += width
    return lines.select(*cols)
