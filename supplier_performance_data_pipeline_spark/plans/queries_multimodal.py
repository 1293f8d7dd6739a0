"""Multimodal-column queries: binary payload + typed metadata plumbing.

The testdata ships no real media, so the media table is derived
deterministically from ``documents`` (payload = UTF-8 bytes of the
text). That makes the whole mapInPandas feature-extraction path —
schema, Arrow batch iteration, byte-level feature math — exactly
reproducible in the DuckDB oracle: the corpus is pure ASCII, so byte
values equal character codes and every feature is SQL-expressible.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample,
)
from supplier_performance_data_pipeline_spark.plans.registry import register
from supplier_performance_data_pipeline_spark.session import tune_session

# ASCII byte codes of the text, 1-indexed substr — mirrors
# _fake_features (payload[:4096]; the corpus maxes out well below that).
_CODES = "list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1)))"


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media table: opaque binary payload + typed metadata."""
    tune_session(spark)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


@register(
    "multimodal_features",
    oracle=f"""
SELECT
    doc_id AS media_id,
    'text/plain' AS mime,
    CAST(length(text) AS BIGINT) AS n_bytes,
    md5(text) AS checksum,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE CAST(list_sum({_CODES}) AS DOUBLE) / length(text) END AS feat_mean,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE CAST(list_max({_CODES}) AS DOUBLE) END AS feat_max
FROM documents
""".strip(),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas): byte stats + checksum per media row. The decode step
    is the stub; the plumbing (schema, batching, partitioning) is the
    real scale path."""
    return extract_features(_media(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id AS media_id, 'text/plain' AS mime,
       CAST(length(text) AS BIGINT) AS n_bytes
FROM documents WHERE doc_id % 10 = 0
""".strip(),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic every-Nth sampling — the cheap JVM-side pre-filter
    before expensive decode; predicate stays in the scan."""
    sampled = frame_sample(_media(spark, sf_dir), every_n=10)
    return sampled.select(
        "media_id", "mime", F.length("payload").cast("long").alias("n_bytes")
    )


from supplier_performance_data_pipeline_spark.operators.multimodal import (  # noqa: E402
    byte_entropy,
)


@register(
    "multimodal_byte_entropy",
    oracle=f"""
WITH codes AS (
    SELECT doc_id, length(text) AS n, unnest({_CODES}) AS code
    FROM documents WHERE length(text) > 0
),
cc AS (SELECT doc_id, n, code, COUNT(*) AS c FROM codes GROUP BY doc_id, n, code),
terms AS (
    SELECT doc_id, n,
           CAST(ROUND(c / CAST(n AS DOUBLE) * ln(c / CAST(n AS DOUBLE)), 12)
                AS DECIMAL(18,12)) AS t
    FROM cc
)
SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_bytes,
       ROUND(-CAST(SUM(t) AS DOUBLE), 6) AS entropy
FROM terms GROUP BY doc_id, n
UNION ALL
SELECT doc_id, 0, 0.0 FROM documents WHERE length(text) = 0
""".strip(),
)
def q_multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload byte-distribution Shannon entropy through the REAL
    Arrow path (mapInPandas + numpy bincount — no stub): the media
    sniff that separates compressed/encrypted payloads (~ln 256) from
    text (~3-4 nats) and padding (near 0) without decoding anything.
    The per-byte expansion a SQL explode would materialize (n_bytes ×
    rows) stays inside one vectorized batch; only (id, n_bytes,
    entropy) crosses back to the JVM. The oracle reproduces the exact
    arithmetic SQL-side at oracle scale (ASCII corpus: byte == char
    code), using the rounded-term DECIMAL-sum contract."""
    return byte_entropy(_media(spark, sf_dir))
