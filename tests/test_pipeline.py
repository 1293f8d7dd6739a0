"""End-to-end pipeline test: generate → load → KPIs → risk, with the
KPI values re-derived independently in pandas as the oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from supplier_performance_data_pipeline_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def pipeline_result(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("warehouse")
    return run_pipeline(spark, str(out))


def test_row_counts_and_integrity(pipeline_result):
    counts = pipeline_result["_row_counts"]
    assert counts["suppliers"] == 15
    assert counts["purchase_orders"] == 600
    assert counts["deliveries"] == 600


def test_kpis_match_pandas_recompute(pipeline_result):
    s = pipeline_result["suppliers"].toPandas()
    po = pipeline_result["purchase_orders"].toPandas()
    d = pipeline_result["deliveries"].toPandas()
    kpis = pipeline_result["supplier_kpis"].toPandas().set_index("supplier_id")

    j = po.merge(d, on="po_id").merge(s, on="supplier_id")
    j["delay"] = (
        pd.to_datetime(j.delivery_date) - pd.to_datetime(j.promised_date)
    ).dt.days
    j["on_time"] = (j.delivery_date <= j.promised_date).astype(int)
    for sid, g in j.groupby("supplier_id"):
        row = kpis.loc[sid]
        assert row["n_pos"] == len(g)
        assert row["on_time_delivery_rate"] == pytest.approx(g.on_time.mean())
        assert row["avg_delivery_delay_days"] == pytest.approx(g.delay.mean())
        assert row["fill_rate"] == pytest.approx(
            g.quantity_delivered.sum() / g.quantity_ordered.sum()
        )
        assert row["quality_issue_rate"] == pytest.approx(g.quality_issues.mean())


def test_risk_composite_formula(pipeline_result):
    risk = pipeline_result["supplier_risk_summary"].toPandas()
    perf = (
        risk.norm_on_time + risk.norm_delay + risk.norm_fill + risk.norm_quality
    ) / 4.0
    expected = 0.7 * (1.0 - perf) + 0.3 * (risk.financial_risk_score / 100.0)
    assert risk.performance_score.tolist() == pytest.approx(perf.tolist())
    assert risk.risk_score.tolist() == pytest.approx(expected.tolist())
    assert ((risk.norm_on_time >= 0) & (risk.norm_on_time <= 1)).all()
