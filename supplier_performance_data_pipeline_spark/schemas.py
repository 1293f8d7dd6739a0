"""Explicit schema registry.

The reference deliberately declares every schema instead of inferring
(reference: src/load_duckdb.py:38 "explicitly defining the schema helps
avoid issues with automatic type inference"). We do the same with
``StructType``s applied on read — never ``inferSchema``.

Two families:
- supplier domain (reference parity; reference: src/load_duckdb.py:39-72)
- driver testdata tables (TPC-H-ish star schema + events/documents/embeddings)
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- supplier domain (reference: src/load_duckdb.py:39-72) -----------------

SUPPLIERS = T.StructType(
    [
        T.StructField("supplier_id", T.StringType(), False),
        T.StructField("supplier_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("financial_risk_score", T.IntegerType(), True),
    ]
)

PURCHASE_ORDERS = T.StructType(
    [
        T.StructField("po_id", T.StringType(), False),
        T.StructField("supplier_id", T.StringType(), False),
        T.StructField("order_date", T.DateType(), True),
        T.StructField("promised_date", T.DateType(), True),
        T.StructField("quantity_ordered", T.IntegerType(), True),
    ]
)

DELIVERIES = T.StructType(
    [
        T.StructField("po_id", T.StringType(), False),
        T.StructField("delivery_date", T.DateType(), True),
        T.StructField("quantity_delivered", T.IntegerType(), True),
        T.StructField("quality_issues", T.IntegerType(), True),
    ]
)

SUPPLIER_DOMAIN = {
    "suppliers": SUPPLIERS,
    "purchase_orders": PURCHASE_ORDERS,
    "deliveries": DELIVERIES,
}

# Derived-table output schemas (reference: src/compute_kpis.py:54-72,
# src/compute_risk.py:85-111) — used for assertions in tests.
SUPPLIER_KPIS_COLUMNS = [
    "supplier_id",
    "supplier_name",
    "category",
    "country",
    "financial_risk_score",
    "on_time_delivery_rate",
    "avg_delivery_delay_days",
    "fill_rate",
    "quality_issue_rate",
    "n_pos",
]

SUPPLIER_RISK_COLUMNS = SUPPLIER_KPIS_COLUMNS + [
    "norm_on_time",
    "norm_delay",
    "norm_fill",
    "norm_quality",
    "performance_score",
    "risk_score",
]

# --- driver testdata (TESTDATA.md) -----------------------------------------

TESTDATA_TABLES = (
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
)
