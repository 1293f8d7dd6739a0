"""THE portable money-math recipe, in one place.

Round 4 proved (verdict + a 6,010-value cross-engine experiment) that
``CAST(double AS DECIMAL(p,2))`` tie-breaks differently between Spark
(exact-binary-expansion HALF_UP) and DuckDB on ``.xx5`` half-cent
values, and that rescaling a DECIMAL down a scale (``CAST(dec(…,4)*100
AS DECIMAL(19,0))``) diverges even on this testdata (HALF_UP vs
truncation → the ``nation_supplier_hhi`` red, 1-cent drift on 43/100
suppliers). The only quantization that is bit-identical across engines
BY CONSTRUCTION is pure IEEE-754 arithmetic:

    cents(x)  =  CAST(FLOOR(x * 100 + 0.5) AS BIGINT)

Multiply, add, and FLOOR are each correctly rounded / exact by the
IEEE-754 mandate, so every engine computes the identical BIGINT (the
CAST is exact because FLOOR already produced an integral double —
never cast a NON-integral double to BIGINT in only one engine: DuckDB
rounds, Spark truncates). Note the convention: exact half-cents round
toward +infinity (−5.005 → −500, not −501) — a different tie rule than
HALF_UP but a PORTABLE one, which is what the differential contract
needs.

Derived units used throughout the registry:
  - cents    = integer 1e-2 dollars (prices, balances, quantities)
  - pct      = integer percent units (0-100) for discounts/rates
  - e4 units = cents × (100 − pct): integer 1e-4 dollars for the
               discounted-revenue product — never divide until the
               output edge; report ``CAST(SUM(e4) AS DOUBLE) / 10000``.

Sums go through DECIMAL(38,0) (exact, order-free, overflow-checked)
rather than BIGINT so a 100-TB-scale sum cannot wrap silently.
Per-row bound: ``x*100`` is exact while |x| < 2^53/100 ≈ 9e13 dollars
per VALUE — beyond that the quantization is still PORTABLE (both
engines compute the identical double) but no longer cent-faithful to
the decimal literal the double came from; no testdata column is within
six orders of magnitude of the bound.

Every helper has two renderings — a Spark ``Column`` and a DuckDB SQL
string — generated from the same formula (the ``md5_mod`` "one recipe,
two renderings" pattern from ``operators/sampling.py``); change one,
change both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cents(col: Column | str) -> Column:
    """Exact integer cents from a dollar double; bit-portable."""
    return F.floor(_c(col) * F.lit(100) + F.lit(0.5)).cast("long")


def cents_sql(expr: str) -> str:
    """DuckDB rendering of :func:`cents`."""
    return f"CAST(FLOOR({expr} * 100 + 0.5) AS BIGINT)"


def percent_units(col: Column | str) -> Column:
    """Exact integer PERCENT units (0-100 — NOT basis points: a 5%
    discount maps to 5) from a rate double in [0, 1] quantized at 2
    digits (TPC-H discounts/taxes)."""
    return F.floor(_c(col) * F.lit(100) + F.lit(0.5)).cast("long")


def percent_units_sql(expr: str) -> str:
    """DuckDB rendering of :func:`percent_units`."""
    return f"CAST(FLOOR({expr} * 100 + 0.5) AS BIGINT)"


def revenue_e4(price: Column | str, discount: Column | str) -> Column:
    """price×(1−discount) as exact integer 1e-4 dollars, DECIMAL(38,0)
    so engine-side sums stay exact and unwrappable at any scale."""
    e4 = cents(price) * (F.lit(100) - percent_units(discount))
    return e4.cast("decimal(38,0)")


def revenue_e4_sql(price_expr: str, discount_expr: str) -> str:
    """DuckDB rendering of :func:`revenue_e4`."""
    return (
        f"CAST({cents_sql(price_expr)}"
        f" * (100 - {percent_units_sql(discount_expr)}) AS DECIMAL(38,0))"
    )


# SQL fragments for the common oracle shapes (dollars at the edge):
#   CAST(SUM(<rev_e4>) AS DOUBLE) / 10000
#   CAST(SUM(CAST(<cents> AS DECIMAL(38,0))) AS DOUBLE) / 100
