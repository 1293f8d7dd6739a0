"""PySpark-native supplier-performance analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference pipeline (``Flazoukie/supplier-performance-data-pipeline``,
studied at /root/reference — see SURVEY.md), re-expressed Spark-first:

- declarative DataFrame/SQL logical plans, Catalyst picks physical strategy
- explicit StructType schemas (never infer), Parquet-backed warehouse
- broadcast-aware joins, AQE-friendly aggregations, shuffle-conscious design
- extension operators for large-scale training-data pipelines
  (dedup, similarity search, text analysis, multimodal plumbing, streaming)
"""

__version__ = "0.1.0"
