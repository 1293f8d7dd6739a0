"""Seeded synthetic supplier-domain data generator.

Reproduces the reference generator's distributions (reference:
src/generate_data.py:27-188 — seed, table sizes, category/country pools,
lead-time/late/early/partial/quality probabilities with financial-risk
uplift) as an independent implementation. Generation is driver-side —
600 rows is nothing (SURVEY.md §7.3); the scale path for synthetic data
is per-partition seeded generation via ``spark.range`` + ``rand(seed)``,
provided by ``generate_lineage_at_scale``.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession

from supplier_performance_data_pipeline_spark.schemas import (
    DELIVERIES,
    PURCHASE_ORDERS,
    SUPPLIERS,
)

CATEGORIES = ["Packaging", "Raw Materials", "Logistics", "Electronics", "Textiles"]
COUNTRIES = ["DE", "PL", "CZ", "NL", "IT", "ES", "FR", "TR", "CN"]


@dataclass
class GeneratorConfig:
    # Distribution parameters per reference src/generate_data.py:27-58.
    seed: int = 42
    n_suppliers: int = 15
    n_pos: int = 600
    start_date: date = field(default_factory=lambda: date(2024, 1, 1))
    end_date: date = field(default_factory=lambda: date(2024, 12, 31))
    lead_time_days: tuple[int, int] = (3, 21)
    qty_range: tuple[int, int] = (10, 500)
    late_base: float = 0.22
    early_base: float = 0.08
    partial_base: float = 0.18
    quality_base: float = 0.04


def _clamp(x: float, lo: float, hi: float) -> float:
    return max(lo, min(hi, x))


def generate_supplier_domain(
    spark: SparkSession, cfg: GeneratorConfig | None = None
) -> dict[str, DataFrame]:
    """Three base tables with the reference's invariants: unique keys,
    1:1 PO↔delivery, quantity_delivered ≤ quantity_ordered."""
    cfg = cfg or GeneratorConfig()
    rng = random.Random(cfg.seed)

    suppliers = []
    profiles = {}
    for i in range(1, cfg.n_suppliers + 1):
        sid = f"S{i:03d}"
        fin = rng.randint(0, 100)
        suppliers.append(
            (sid, f"Supplier {i:02d}", rng.choice(CATEGORIES), rng.choice(COUNTRIES), fin)
        )
        # Risk-scaled behavior profile with the reference's exact
        # per-probability clamp bounds (reference: src/generate_data.py:111-113).
        r = fin / 100.0
        profiles[sid] = {
            "late": _clamp(cfg.late_base + 0.25 * r, 0.05, 0.65),
            "early": cfg.early_base,
            "partial": _clamp(cfg.partial_base + 0.15 * r, 0.05, 0.55),
            "quality": _clamp(cfg.quality_base + 0.06 * r, 0.01, 0.20),
        }

    span = (cfg.end_date - cfg.start_date).days
    pos, deliveries = [], []
    for j in range(1, cfg.n_pos + 1):
        po_id = f"PO{j:05d}"
        sid = rng.choice(suppliers)[0]
        order_date = cfg.start_date + timedelta(days=rng.randint(0, span))
        promised = order_date + timedelta(days=rng.randint(*cfg.lead_time_days))
        qty = rng.randint(*cfg.qty_range)
        pos.append((po_id, sid, order_date, promised, qty))

        p = profiles[sid]
        u = rng.random()
        if u < p["late"]:
            delivery = promised + timedelta(days=rng.randint(1, 14))
        elif u < p["late"] + p["early"]:
            delivery = promised - timedelta(days=rng.randint(1, 4))
        else:
            delivery = promised
        delivered = qty
        if rng.random() < p["partial"]:
            # max(0, int(round(...))) mirrors src/generate_data.py:174.
            delivered = max(0, int(round(qty * rng.uniform(0.60, 0.95))))
        quality = 1 if rng.random() < p["quality"] else 0
        deliveries.append((po_id, delivery, delivered, quality))

    return {
        "suppliers": spark.createDataFrame(suppliers, SUPPLIERS),
        "purchase_orders": spark.createDataFrame(pos, PURCHASE_ORDERS),
        "deliveries": spark.createDataFrame(deliveries, DELIVERIES),
    }


def generate_lineage_at_scale(
    spark: SparkSession,
    n_rows: int,
    n_suppliers: int,
    seed: int = 42,
    cfg: GeneratorConfig | None = None,
) -> DataFrame:
    """Distributed fused PO+delivery fact generator — the 100 TB path.

    The driver-side generator (above) reproduces the reference's Python
    RNG stream exactly but serializes through one process. This one
    generates any row count distributedly: ``spark.range`` partitions
    the id space, each row's randomness comes from ``rand(seed+k)``
    (deterministic given seed and id-space partitioning) and per-entity
    attributes from hashes of the entity id — so supplier behavior is
    consistent across the fact without a join. Same distribution family
    as the reference (late/early/partial/quality with financial-risk
    uplift, reference: src/generate_data.py:105-188), pure Column
    expressions end to end — no Python in the row path, no shuffle.
    """
    from pyspark.sql import functions as F

    cfg = cfg or GeneratorConfig()
    span = (cfg.end_date - cfg.start_date).days
    lo_lead, hi_lead = cfg.lead_time_days
    lo_q, hi_q = cfg.qty_range

    df = spark.range(n_rows).select(
        (F.col("id") + 1).alias("po_seq"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(n_suppliers)).alias(
            "sup_idx"
        ),
        *[F.rand(seed + k).alias(f"u{k}") for k in range(1, 9)],
    )
    fin = F.pmod(F.xxhash64(F.col("sup_idx"), F.lit(seed + 99)), F.lit(101))
    r = fin / 100.0
    # Same per-probability clamp bounds as the reference profile
    # (src/generate_data.py:111-113).
    p_late = F.greatest(
        F.least(F.lit(cfg.late_base) + 0.25 * r, F.lit(0.65)), F.lit(0.05)
    )
    p_partial = F.greatest(
        F.least(F.lit(cfg.partial_base) + 0.15 * r, F.lit(0.55)), F.lit(0.05)
    )
    p_quality = F.greatest(
        F.least(F.lit(cfg.quality_base) + 0.06 * r, F.lit(0.20)), F.lit(0.01)
    )

    order_date = F.date_add(F.lit(cfg.start_date), (F.col("u1") * span).cast("int"))
    lead = (F.lit(lo_lead) + F.col("u2") * (hi_lead - lo_lead)).cast("int")
    promised = F.date_add(order_date, lead)
    # Outcome draw: late wins p_late, else early p_early, else on time.
    delay = (
        F.when(F.col("u3") < p_late, (1 + F.col("u4") * 14).cast("int"))
        .when(F.col("u3") < p_late + cfg.early_base, -(1 + F.col("u4") * 3).cast("int"))
        .otherwise(F.lit(0))
    )
    qty = (F.lit(lo_q) + F.col("u5") * (hi_q - lo_q)).cast("int")
    ratio = F.when(F.col("u6") < p_partial, 0.6 + F.col("u7") * 0.35).otherwise(
        F.lit(1.0)
    )
    # round() mirrors the reference's int(round(ordered * ratio)); the
    # quality draw uses its OWN uniform (u8) — sharing u7 with the
    # partial ratio would correlate quality issues with low-ratio rows,
    # a joint dependence the reference's independent draws don't have.
    return df.select(
        F.format_string("PO%09d", F.col("po_seq")).alias("po_id"),
        F.format_string("S%05d", F.col("sup_idx") + 1).alias("supplier_id"),
        fin.cast("int").alias("financial_risk_score"),
        order_date.alias("order_date"),
        promised.alias("promised_date"),
        qty.alias("quantity_ordered"),
        F.date_add(promised, delay).alias("delivery_date"),
        F.greatest(F.round(qty * ratio).cast("int"), F.lit(0)).alias(
            "quantity_delivered"
        ),
        F.when(F.col("u8") < p_quality, 1).otherwise(0).alias("quality_issues"),
    )
