"""Adversarial money-math portability: the round-4 reds came from money
values the testdata happens not to contain (exact half-cent ties, >2dp
prices) hitting engine-specific rounding in DECIMAL casts/rescales.
This suite proves the FLOOR integer-unit recipe (functions/money.py)
survives data engineered to hit every tie:

1. the cents/basis-points primitives agree bit-for-bit between Spark
   and DuckDB on thousands of .xx5 / .xxx5 / >2dp adversarial values
   (including negatives, where FLOOR's half-toward-+inf convention
   differs from HALF_UP but is identical across engines — which is the
   actual contract);
2. EVERY money-handling registry query matches its oracle EXACTLY on a
   testdata clone whose money columns are replaced with adversarial
   tie values end-to-end;
3. the tightened local gate (exact float comparison in
   tests/oracle_utils.py) catches a deliberately injected 1-cent error
   that the old rtol=1e-9 comparison certified — the round-4 escape
   hatch, now pinned shut.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pytest

from supplier_performance_data_pipeline_spark.functions.money import (
    percent_units,
    percent_units_sql,
    cents,
    cents_sql,
)
from supplier_performance_data_pipeline_spark.plans.registry import load_all
from tests.conftest import SF_SMOKE
from tests.oracle_utils import assert_frames_match, run_oracle

MONEY_COLS = (
    "l_extendedprice",
    "o_totalprice",
    "c_acctbal",
    "l_quantity",
    "l_discount",
    "l_tax",
)


def _adversarial_values(n: int) -> np.ndarray:
    """Doubles engineered to sit on every rounding boundary: exact
    .xx5 half-cent ties, .xxx5 sub-cent ties, >2dp tails, negatives."""
    rng = np.random.RandomState(7)
    base = rng.uniform(0, 99999, n)
    out = np.empty(n)
    kind = np.arange(n) % 5
    out[kind == 0] = np.floor(base[kind == 0]) + 0.005  # half-cent tie
    out[kind == 1] = np.floor(base[kind == 1] * 10) / 10 + 0.015
    out[kind == 2] = np.round(base[kind == 2], 4)  # 4dp tails
    out[kind == 3] = np.floor(base[kind == 3]) + 0.455
    out[kind == 4] = -(np.floor(base[kind == 4]) + 0.005)  # negative tie
    return out


def test_cents_primitive_bit_identical_cross_engine(spark):
    vals = _adversarial_values(6000)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS x)",
        [vals.tolist()],
    )
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {cents_sql('x')} FROM t ORDER BY rowid"
        ).fetchall()
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame({"i": range(len(vals)), "x": vals})
    )
    got = {
        r["i"]: r["c"]
        for r in sdf.select("i", cents("x").alias("c")).collect()
    }
    spark_vals = [got[i] for i in range(len(vals))]
    assert spark_vals == duck, (
        "cents() disagrees cross-engine on adversarial ties"
    )


def test_percent_units_primitive_bit_identical_cross_engine(spark):
    # rates in [0,1] with half-bp ties like 0.055, 0.005, 0.125
    vals = [i / 1000.0 for i in range(0, 1001)] + [0.055, 0.005, 0.075]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS x)", [vals]
    )
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {percent_units_sql('x')} FROM t ORDER BY rowid"
        ).fetchall()
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame({"i": range(len(vals)), "x": vals})
    )
    got = {
        r["i"]: r["c"]
        for r in sdf.select("i", percent_units("x").alias("c")).collect()
    }
    assert [got[i] for i in range(len(vals))] == duck


# --- end-to-end: every money query over an adversarial testdata clone -------


def _money_specs():
    specs = load_all()
    return sorted(
        name
        for name, spec in specs.items()
        if spec.oracle is not None
        and "FLOOR(" in spec.oracle
        and any(c in spec.oracle for c in MONEY_COLS)
    )


@pytest.fixture(scope="session")
def adversarial_sf_dir(tmp_path_factory):
    """Clone of sf0.001 whose money columns are replaced with
    adversarial tie values (same schema, same row counts/keys)."""
    out = str(tmp_path_factory.mktemp("adversarial_sf"))
    perturb = {
        "lineitem": ["l_extendedprice", "l_quantity", "l_discount", "l_tax"],
        "orders": ["o_totalprice"],
        "customer": ["c_acctbal"],
    }
    for fname in os.listdir(SF_SMOKE):
        src = os.path.join(SF_SMOKE, fname)
        dst = os.path.join(out, fname)
        table = fname.removesuffix(".parquet")
        if table not in perturb:
            shutil.copy(src, dst)
            continue
        df = pd.read_parquet(src)
        for col in perturb[table]:
            vals = _adversarial_values(len(df))
            if col in ("l_discount", "l_tax"):
                # rates in [0, 0.1) with a third sitting EXACTLY on the
                # FLOOR(x*100 + 0.5) half-basis-point boundary
                # (0.005, 0.015, ... 0.095) — dividing engineered price
                # ties by 1e4 would shift them two decimals OFF the
                # percent-quantization half-point and test nothing
                n = len(df)
                idx = np.arange(n)
                vals = np.round(np.abs(vals) % 1000, 0) % 10 / 100.0
                vals[idx % 3 == 0] = ((idx[idx % 3 == 0] % 10) + 0.5) / 100.0
                vals[idx % 3 == 1] = np.round(
                    np.abs(_adversarial_values(n)[idx % 3 == 1]) % 0.1, 4
                )
            elif col != "c_acctbal":
                vals = np.abs(vals)  # prices/quantities non-negative
            df[col] = vals
        df.to_parquet(dst, index=False)
    return out


@pytest.mark.parametrize("name", _money_specs())
def test_money_query_exact_on_adversarial_data(
    spark, adversarial_sf_dir, name
):
    spec = load_all()[name]
    actual = spec.build(spark, adversarial_sf_dir).toPandas()
    expected = run_oracle(adversarial_sf_dir, spec.oracle)
    assert_frames_match(actual, expected, name, approx_cols=spec.approx_cols)


# --- the round-4 escape hatch, pinned shut ----------------------------------


def test_exact_gate_catches_one_cent_error():
    """A 1-cent error at 1e8 magnitude passed the old rtol=1e-9 gate
    (|a-b| <= rtol*|b| tolerates ±0.1 at that scale) — exactly how two
    genuinely-wrong queries certified 'parity green' in round 4. The
    exact gate must fail it."""
    a = pd.DataFrame({"k": ["x"], "revenue": [123456789.01]})
    b = pd.DataFrame({"k": ["x"], "revenue": [123456789.02]})
    assert np.isclose(
        a.revenue, b.revenue, rtol=1e-9, atol=1e-9
    ).all(), "precondition: the OLD gate tolerates the cent error"
    with pytest.raises(AssertionError, match="exact float mismatch"):
        assert_frames_match(a, b, "injected_cent_error")


def test_exact_gate_rejects_decimal_object_columns():
    """The round-5 escape hatch, pinned shut: a Spark decimal(7,6)
    column reaches pandas as decimal.Decimal objects; the gate's old
    astype(float) coerced them and erased exactly the rendering drift
    the driver hashes ("0.301030" vs 0.30103 — values bit-identical,
    driver red). A Decimal column on EITHER side must now be a hard
    fail before any value comparison."""
    import decimal

    dec = pd.DataFrame(
        {"k": ["x"], "benford_freq": [decimal.Decimal("0.301030")]}
    )
    flt = pd.DataFrame({"k": ["x"], "benford_freq": [0.30103]})
    assert float(dec.benford_freq[0]) == flt.benford_freq[0], (
        "precondition: values are numerically identical — only the "
        "rendering drifts"
    )
    with pytest.raises(AssertionError, match="decimal.Decimal"):
        assert_frames_match(dec, flt, "decimal_canary")
    with pytest.raises(AssertionError, match="decimal.Decimal"):
        assert_frames_match(flt, dec, "decimal_canary_flipped")


def test_exact_gate_rejects_negative_zero_floats():
    """The round-7 escape hatch, pinned shut: DuckDB's ROUND(double)
    keeps the sign of a rounded tiny negative (-0.001 -> -0.0) while
    Spark's BigDecimal round emits +0.0 — supplier_risk_display first
    realized the divergence at sf0.1. The gate must fail -0.0 on
    EITHER side even when both arms agree (agreement on the sign of
    zero is an accident of which engine computed it), and must keep
    accepting ordinary +0.0."""
    neg = pd.DataFrame({"k": ["x"], "delay": [-0.0]})
    pos = pd.DataFrame({"k": ["x"], "delay": [0.0]})
    assert neg.delay[0] == pos.delay[0], (
        "precondition: -0.0 == 0.0 numerically — only the rendering "
        "(and the driver's value hash) drifts"
    )
    with pytest.raises(AssertionError, match="-0.0"):
        assert_frames_match(neg, pos, "negzero_canary")
    with pytest.raises(AssertionError, match="-0.0"):
        assert_frames_match(pos, neg, "negzero_canary_flipped")
    with pytest.raises(AssertionError, match="-0.0"):
        assert_frames_match(neg, neg.copy(), "negzero_both_arms_agree")
    assert_frames_match(pos, pos.copy(), "plain_zero_still_fine")


def test_money_registry_has_no_decimal_cast_left():
    """No registered oracle may quantize money through a DECIMAL cast
    (engine-dependent tie-rounding on .xx5 values) or rescale a
    DECIMAL down to scale 0 (the nation_supplier_hhi red: Spark
    HALF_UP vs DuckDB truncation) — the FLOOR recipe is the only
    sanctioned quantization. The pattern matches a money column
    followed by AS DECIMAL within one paren level, so the round-4
    shapes `CAST(l_extendedprice AS DECIMAL(12,2))` AND
    `CAST(1.0 - l_discount AS DECIMAL(4,2))` both trip it, while the
    sanctioned `CAST(CAST(FLOOR(col*100+0.5) AS BIGINT) AS
    DECIMAL(38,0))` does not (a `)` intervenes)."""
    import re as _re

    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        for col in MONEY_COLS:
            m = _re.search(rf"{col}[^()]*AS DECIMAL\(", spec.oracle)
            assert m is None, (
                f"{name}: oracle quantizes {col} via DECIMAL cast "
                f"({m.group(0)!r}); use the FLOOR integer-unit recipe "
                "from functions/money.py"
            )
        m = _re.search(r"\*\s*100\s+AS DECIMAL\(\d+,0\)", spec.oracle)
        assert m is None, (
            f"{name}: oracle rescales a DECIMAL down to scale 0 "
            f"({m.group(0)!r}) — engine-dependent tie rounding"
        )


def test_money_floor_fragments_use_the_canonical_rendering():
    """The FLOOR recipe appears inlined in oracle strings; this pins
    every inlined fragment to the EXACT canonical rendering from
    functions/money.py, so a future recipe change that edits the
    helpers but misses a hand-written copy fails loudly, listing the
    stragglers (the 'change one, change both' contract, enforced)."""
    import re as _re

    canon = _re.compile(
        # cents/bp quantization of a raw column (the cents_sql shape)
        r"CAST\(FLOOR\([A-Za-z0-9_.]+(?:\(ts\))? \* 100 \+ 0\.5\) AS BIGINT\)"
        # …of a MIN/MAX (column-profile canonical strings)
        r"|CAST\(FLOOR\((?:MIN|MAX)\([a-z_]+\) \* 100 \+ 0\.5\) AS BIGINT\)"
        # integer re-quantization of an already-cents aggregate
        # (interpolated medians/percentiles): FLOOR(x + 0.5), no *100
        r"|CAST\(FLOOR\((?:MIN|MAX|quantile_cont)\([A-Za-z0-9_., ]+\)"
        r" \+ 0\.5\) AS BIGINT\)"
        # GRAIN-scaled rate threshold (mixture_resample_rate_sql):
        # FLOOR(LEAST(1.0, <fixed op chain>) * GRAIN + 0.5)
        r"|CAST\(FLOOR\(LEAST\(1\.0, [^;]{0,120}?\)"
        r" \* 10000 \+ 0\.5\) AS BIGINT\)"
    )
    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        frags = _re.findall(
            r"CAST\(FLOOR\([^;]{0,200}?AS BIGINT\)", spec.oracle
        )
        # no exemption hole: a money fragment (ending in AS BIGINT)
        # that exceeds the 80-char window would otherwise escape the
        # pin — compare against a 200-char sweep. (Non-money FLOORs
        # like tpch_domain's `... AS INTEGER` risk score are out of
        # scope for the cents recipe and intentionally unmatched.)
        wide = _re.findall(
            r"CAST\(FLOOR\([^;]{0,400}?AS BIGINT\)", spec.oracle
        )
        assert len(frags) == len(wide), (
            f"{name}: a FLOOR…AS BIGINT fragment exceeds the 200-char "
            "match window — widen the test or shorten the fragment"
        )
        for frag in frags:
            assert canon.match(frag), (
                f"{name}: non-canonical FLOOR money fragment {frag!r} — "
                "render via functions/money.py (cents_sql / "
                "percent_units_sql / revenue_e4_sql) or match their "
                "exact output"
            )
