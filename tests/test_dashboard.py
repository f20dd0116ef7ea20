"""Dashboard serving-layer tests on the awards-shaped synthetic view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_usaspending_spark.ml.adapter import awards_view
from bigdata_usaspending_spark.plans import dashboard


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
