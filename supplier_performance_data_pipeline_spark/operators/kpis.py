"""Supplier KPI computation — the reference's core query, Spark-first.

Reference parity: src/compute_kpis.py:24-74. One declarative plan:
3-way inner equi-join (suppliers ⋈ purchase_orders ⋈ deliveries),
per-PO derived columns (day-granularity delay, on-time flag), then a
per-supplier hash aggregation with five mixed aggregates.

Scale notes (100 TB): the dimension side (suppliers) is broadcast —
Catalyst does this automatically under the threshold and we hint it
explicitly so the fact-fact join (purchase_orders ⋈ deliveries on po_id)
is the only shuffle. The groupBy gets map-side partial aggregation for
free. No Python touches a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.functions.scalar import (
    nullif_div,
    on_time_flag,
)

SUPPLIER_KEYS = [
    "supplier_id",
    "supplier_name",
    "category",
    "country",
    "financial_risk_score",
]


def per_po_dataset(
    suppliers: DataFrame, purchase_orders: DataFrame, deliveries: DataFrame
) -> DataFrame:
    """Join the three base tables into the per-PO dataset with derived
    delay/on-time columns (reference: src/compute_kpis.py:28-51).

    ``delivery_delay_days`` may be negative (early delivery); DuckDB's
    DATE_DIFF('day', promised, delivery) == Spark datediff(delivery,
    promised) — note the flipped argument order (SURVEY.md §2.7).
    """
    joined = (
        F.broadcast(suppliers)
        .join(purchase_orders, "supplier_id")
        .join(deliveries, "po_id")
    )
    return joined.withColumns(
        {
            "delivery_delay_days": F.datediff(
                F.col("delivery_date"), F.col("promised_date")
            ),
            "on_time_flag": on_time_flag(
                F.col("delivery_date"), F.col("promised_date")
            ),
        }
    )


def supplier_kpis(per_po: DataFrame) -> DataFrame:
    """Aggregate the per-PO dataset to one KPI row per supplier
    (reference: src/compute_kpis.py:53-72).

    Single shuffle on the supplier grouping keys; all aggregates are
    built-ins so partial (map-side) aggregation applies.
    """
    return per_po.groupBy(*SUPPLIER_KEYS).agg(
        F.avg("on_time_flag").cast("double").alias("on_time_delivery_rate"),
        F.avg("delivery_delay_days").cast("double").alias("avg_delivery_delay_days"),
        nullif_div(F.sum("quantity_delivered"), F.sum("quantity_ordered")).alias(
            "fill_rate"
        ),
        F.avg("quality_issues").cast("double").alias("quality_issue_rate"),
        F.count("*").alias("n_pos"),
    )


def compute_supplier_kpis(
    suppliers: DataFrame, purchase_orders: DataFrame, deliveries: DataFrame
) -> DataFrame:
    """End-to-end KPI table (the reference's CTAS, minus the ORDER BY —
    Spark table writes don't preserve order; sort at presentation)."""
    return supplier_kpis(per_po_dataset(suppliers, purchase_orders, deliveries))
