"""Dashboard serving-layer tests on the awards-shaped synthetic view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_usaspending_spark.ml.adapter import awards_view
from bigdata_usaspending_spark.plans import dashboard, serving


@pytest.fixture(scope="module")
def awards(spark, sf_small):
    return awards_view(spark, sf_small).cache()


@pytest.fixture(scope="module")
def geo(spark):
    rows = [(f"Customer#{i:09d}", 40.0 + i, -70.0 - i) for i in range(1, 9)]
    return spark.createDataFrame(
        rows, "recipient_name string, latitude double, longitude double"
    )


def test_map_totals_semijoin_and_order(awards, geo):
    out = dashboard.map_totals(awards, geo, "recipient_name").collect()
    assert 0 < len(out) <= 8  # only geocoded entities survive (J1 semantics)
    totals = [r.total_award_amount for r in out]
    assert totals == sorted(totals, reverse=True)
    assert out[0].latitude is not None


def test_sankey_topk(awards):
    out = dashboard.sankey_links(awards, k=15).collect()
    assert len(out) == 15
    totals = [r.total_award_amount for r in out]
    assert totals == sorted(totals, reverse=True)


def test_monthly_rollup_levels(awards):
    rows = dashboard.monthly_rollup(awards).collect()
    grand = [r for r in rows if r.awarding_sub_agency is None and r.month is None]
    agency_totals = [r for r in rows if r.awarding_sub_agency is not None and r.month is None]
    points = [r for r in rows if r.awarding_sub_agency is not None and r.month is not None]
    assert len(grand) == 1 and agency_totals and points
    # exact: agency subtotals sum to the grand total
    assert abs(sum(r.total_award_amount for r in agency_totals) - grand[0].total_award_amount) < 1e-6


def test_top30_parity_variant_is_partial(awards):
    exact = dashboard.monthly_rollup(awards).collect()
    partial = dashboard.monthly_rollup_top30_parity(awards).collect()
    g_exact = next(r for r in exact if r.awarding_sub_agency is None and r.month is None)
    g_partial = next(r for r in partial if r.awarding_sub_agency is None and r.month is None)
    # the old dashboard's number undercounts (top-30 rows only)
    assert g_partial.total_award_amount <= g_exact.total_award_amount


@pytest.fixture(scope="module")
def sub_agency_geo(spark, awards):
    names = [r.awarding_sub_agency for r in
             awards.select("awarding_sub_agency").distinct().limit(5).collect()]
    return spark.createDataFrame(
        [(n, 10.0 + i, 20.0 + i) for i, n in enumerate(names)],
        "awarding_sub_agency string, latitude double, longitude double",
    )


def test_dashboard_payload_matches_template_contract(awards, geo, sub_agency_geo):
    payload = serving.dashboard_payload(awards, geo, sub_agency_geo)
    # the reference's exact template variables (app/ml_app.py:141-147)
    for key in ("map_recipient_data", "map_subagency_data", "sankey_data", "month_data"):
        assert isinstance(payload[key], list) and isinstance(payload[key][0], dict)
    assert {"latitude", "longitude", "total_award_amount"} <= set(
        payload["map_recipient_data"][0]
    )
    assert {"awarding_sub_agency", "recipient_name", "total_award_amount"} <= set(
        payload["sankey_data"][0]
    )
    assert len(payload["sankey_data"]) <= 15
    assert len(payload["month_data"]) <= 30
    assert {"awarding_sub_agency", "month", "total_award_amount"} <= set(
        payload["month_data"][0]
    )
    # engine extensions: exact server-side numbers
    assert payload["grand_total"] == pytest.approx(
        sum(p["total_award_amount"] for p in payload["pie_data"])
    )
    assert payload["grand_total"] == pytest.approx(
        sum(p["total_award_amount"] for p in payload["line_data"])
    )
    # exact line/pie vs the browser's partial top-30 numbers: the engine's
    # grand total covers ALL rows, the old client-side one can't exceed it
    browser_total = sum(r["total_award_amount"] for r in payload["month_data"])
    assert browser_total <= payload["grand_total"]


@pytest.mark.slow
def test_inference_payloads(spark, awards):
    from bigdata_usaspending_spark.ml import pipelines as ml

    result = ml.train_all(awards)
    sample = awards.limit(1).first()
    features = {
        "awarding_agency": sample.awarding_agency,
        "awarding_sub_agency": sample.awarding_sub_agency,
        "contract_award_type": sample.contract_award_type,
        "funding_agency": sample.funding_agency,
        "funding_sub_agency": sample.funding_sub_agency,
        "month": 3, "year": 2023, "award_amount": 1000.0,
    }
    reg = serving.regression_payload(result.regression_model, spark, features)
    assert reg["ok"] and "Regression Prediction" in reg["message"]
    cls = serving.classification_payload(result.classification_model, spark, features)
    assert cls["ok"] and cls["label"] in ("HIGH", "LOW") and 50.0 <= cls["confidence_pct"] <= 100.0
    clu = serving.clustering_payload(result.clustering_model, spark, features)
    assert clu["ok"] and 0 <= clu["cluster"] < 5

    unseen = {**features, "awarding_sub_agency": "NEVER_SEEN"}
    bad = serving.regression_payload(result.regression_model, spark, unseen)
    # handleInvalid=skip drops the row -> the reference's flashed error
    assert not bad["ok"] and bad["message"] == "No valid data to predict on."


def test_payload_sort_keys_are_none_safe():
    """Null grouping values (null sub-agency, month, or even a null total)
    must sort without TypeError — engine semantics: ASC NULLS FIRST,
    DESC NULLS LAST."""
    from bigdata_usaspending_spark.plans.serving import _asc_key, _desc_key

    vals = ["beta", None, "alpha"]
    assert sorted(vals, key=_asc_key) == [None, "alpha", "beta"]
    months = [3, None, 1]
    assert sorted(months, key=_asc_key) == [None, 1, 3]
    totals = [5.0, None, 9.0]
    assert sorted(totals, key=_desc_key) == [9.0, 5.0, None]
