"""Adapter: driver testdata (TPC-H-ish) → the engine's supplier domain.

The engine's operators implement the reference's supplier-analytics
semantics (SURVEY.md §1). The driver's correctness testdata is a
TPC-H-ish star schema (TESTDATA.md), so this module maps it into the
domain model — same shapes, same join graph:

  supplier (+nation)            → suppliers dimension
  lineitem ⋈ orders             → purchase_orders fact (planned demand)
  lineitem                      → deliveries fact (execution)

Mapping choices (mirrored verbatim in the DuckDB oracle SQL so both
engines compute identical values):
  - po_id               = l_orderkey * 10 + l_linenumber  (unique per line)
  - order_date          = o_orderdate::date
  - promised_date       = order_date + 30 days (fixed promised lead time)
  - quantity_ordered    = l_quantity
  - delivery_date       = l_shipdate::date
  - quantity_delivered  = l_quantity * (1 - l_discount)
  - quality_issues      = 1 if l_returnflag = 'R' else 0
  - financial_risk_score = floor((10000 - s_acctbal) / 110)  (0..99)
  - category            = s_suppkey % 5 → 5 fixed names; country = n_name
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CATEGORIES = ["Packaging", "Raw Materials", "Logistics", "Electronics", "Textiles"]


def domain_suppliers(supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Supplier dimension with category/country/financial risk attributes."""
    cat = F.col("s_suppkey") % 5
    category = F.when(cat == 0, CATEGORIES[0])
    for i, name in enumerate(CATEGORIES[1:-1], start=1):
        category = category.when(cat == i, name)
    category = category.otherwise(CATEGORIES[-1])
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("s_suppkey").alias("supplier_id"),
            F.col("s_name").alias("supplier_name"),
            category.alias("category"),
            F.col("n_name").alias("country"),
            F.floor((F.lit(10000.0) - F.col("s_acctbal")) / F.lit(110.0))
            .cast("int")
            .alias("financial_risk_score"),
        )
    )


def domain_purchase_orders(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Planned-demand fact: one row per lineitem with its order's dates."""
    return lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("po_id"),
        F.col("l_suppkey").alias("supplier_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("promised_date"),
        F.col("l_quantity").alias("quantity_ordered"),
    )


def domain_deliveries(lineitem: DataFrame) -> DataFrame:
    """Execution fact: one row per lineitem, 1:1 with purchase_orders."""
    return lineitem.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("po_id"),
        F.col("l_shipdate").cast("date").alias("delivery_date"),
        (F.col("l_quantity") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "quantity_delivered"
        ),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("quality_issues"),
    )


# The same mapping as ANSI SQL CTEs for the DuckDB oracle. Every queries()
# entry that goes through the domain adapter prepends this block.
DOMAIN_CTES = """
suppliers AS (
    SELECT
        s_suppkey AS supplier_id,
        s_name AS supplier_name,
        CASE s_suppkey % 5
            WHEN 0 THEN 'Packaging'
            WHEN 1 THEN 'Raw Materials'
            WHEN 2 THEN 'Logistics'
            WHEN 3 THEN 'Electronics'
            ELSE 'Textiles'
        END AS category,
        n_name AS country,
        CAST(FLOOR((10000.0 - s_acctbal) / 110.0) AS INTEGER) AS financial_risk_score
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
purchase_orders AS (
    SELECT
        l_orderkey * 10 + l_linenumber AS po_id,
        l_suppkey AS supplier_id,
        CAST(o_orderdate AS DATE) AS order_date,
        CAST(o_orderdate AS DATE) + 30 AS promised_date,
        l_quantity AS quantity_ordered
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
deliveries AS (
    SELECT
        l_orderkey * 10 + l_linenumber AS po_id,
        CAST(l_shipdate AS DATE) AS delivery_date,
        l_quantity * (1.0 - l_discount) AS quantity_delivered,
        CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS quality_issues
    FROM lineitem
),
joined AS (
    SELECT
        s.supplier_id, s.supplier_name, s.category, s.country,
        s.financial_risk_score,
        po.po_id, po.order_date, po.promised_date, po.quantity_ordered,
        d.delivery_date, d.quantity_delivered, d.quality_issues,
        DATE_DIFF('day', po.promised_date, d.delivery_date) AS delivery_delay_days,
        CASE WHEN d.delivery_date <= po.promised_date THEN 1 ELSE 0 END AS on_time_flag
    FROM suppliers s
    JOIN purchase_orders po ON s.supplier_id = po.supplier_id
    JOIN deliveries d ON po.po_id = d.po_id
),
supplier_kpis AS (
    SELECT
        supplier_id, supplier_name, category, country, financial_risk_score,
        AVG(on_time_flag) AS on_time_delivery_rate,
        AVG(delivery_delay_days) AS avg_delivery_delay_days,
        SUM(quantity_delivered) / NULLIF(SUM(quantity_ordered), 0) AS fill_rate,
        AVG(quality_issues) AS quality_issue_rate,
        COUNT(*) AS n_pos
    FROM joined
    GROUP BY supplier_id, supplier_name, category, country, financial_risk_score
)
""".strip()
