"""Serving-tier facade: the dict payloads each reference route rendered,
assembled engine-side (reference app/ml_app.py:86-147 for /dashboard,
:161-364 for the three inference routes).

The Flask/Jinja UI itself is out of engine scope (SURVEY.md §7.1); these
functions return exactly the template variables it consumed, so a serving
layer is one `render_template(**dashboard_payload(...))` away. Collects here
are safe by construction: every dataset is a top-k or a per-key rollup —
bounded output, never an unbounded fact-table pull (the reference collected
entire rollup tables, app/ml_app.py:107,117).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exact_sum, month_of
from ..ml.pipelines import classify_with_confidence, infer_single
from .dashboard import map_totals, monthly_rollup, sankey_links

# the reference's single-row inference schema (app/ml_app.py:194-208):
# the 5 categorical candidates + month/year/amount
INFERENCE_SCHEMA = (
    "awarding_agency string, awarding_sub_agency string, "
    "contract_award_type string, funding_agency string, "
    "funding_sub_agency string, month int, year int, award_amount double"
)


def _rows(df: DataFrame) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


def dashboard_payload(
    awards: DataFrame,
    recipient_geo: DataFrame,
    sub_agency_geo: DataFrame,
    sankey_k: int = 15,
    month_k: int = 30,
) -> dict:
    """The /dashboard template contract (app/ml_app.py:141-147): four list-
    of-dict datasets under the reference's exact keys, plus the engine's
    exact pie/line datasets (the reference's browser re-aggregated the
    top-30 month rows client-side and silently showed partial totals —
    templates/dashboard.html:148-189)."""
    month_totals = awards.groupBy(
        "awarding_sub_agency", month_of("start_date").alias("month")
    ).agg(exact_sum("award_amount", "total_award_amount"))
    rollup = monthly_rollup(awards).collect()
    return {
        # the reference's four template variables, same shapes
        "map_recipient_data": _rows(
            map_totals(awards, recipient_geo, "recipient_name")
        ),
        "map_subagency_data": _rows(
            map_totals(awards, sub_agency_geo, "awarding_sub_agency")
        ),
        "sankey_data": _rows(sankey_links(awards, k=sankey_k)),
        "month_data": _rows(
            month_totals.orderBy(
                F.desc("total_award_amount"),
                F.asc("awarding_sub_agency"),
                F.asc("month"),
            ).limit(month_k)
        ),
        # engine extensions: exact server-side pie/line/grand-total (A9 fix)
        "pie_data": [
            {"awarding_sub_agency": r.awarding_sub_agency,
             "total_award_amount": r.total_award_amount}
            for r in rollup
            if r.awarding_sub_agency is not None and r.month is None
        ],
        "line_data": _rows(
            awards.groupBy(month_of("start_date").alias("month"))
            .agg(exact_sum("award_amount", "total_award_amount"))
            .orderBy(F.asc("month"))
        ),
        "grand_total": next(
            r.total_award_amount
            for r in rollup
            if r.awarding_sub_agency is None and r.month is None
        ),
    }


def inference_row(spark: SparkSession, features: dict) -> DataFrame:
    """Single-row inference DataFrame from route-form values
    (app/ml_app.py:194-208). Missing keys default like the form did."""
    defaults = {
        "awarding_agency": None, "awarding_sub_agency": None,
        "contract_award_type": None, "funding_agency": None,
        "funding_sub_agency": None, "month": 1, "year": 2023,
        "award_amount": 0.0,
    }
    merged = {**defaults, **features}
    row = tuple(merged[k] for k in (
        "awarding_agency", "awarding_sub_agency", "contract_award_type",
        "funding_agency", "funding_sub_agency", "month", "year", "award_amount",
    ))
    return spark.createDataFrame([row], INFERENCE_SCHEMA)


def regression_payload(model, spark: SparkSession, features: dict) -> dict:
    """/regression result dict (app/ml_app.py:211-216): prediction, or the
    unseen-category error the reference flashed."""
    row = infer_single(model, inference_row(spark, features))
    if row is None:
        return {"ok": False, "message": "No valid data to predict on."}
    value = float(row["prediction"])
    return {
        "ok": True,
        "prediction": value,
        "message": f"Regression Prediction (award_amount) = {value:,.2f}",
    }


def classification_payload(model, spark: SparkSession, features: dict) -> dict:
    """/classification result dict (app/ml_app.py:278-287): HIGH/LOW label +
    confidence percentage."""
    out = classify_with_confidence(model, inference_row(spark, features))
    if out is None:
        return {"ok": False, "message": "No valid data to predict on."}
    label, confidence = out
    return {"ok": True, "label": label, "confidence_pct": confidence}


def clustering_payload(model, spark: SparkSession, features: dict) -> dict:
    """/clustering result dict (app/ml_app.py:349-354): assigned cluster id."""
    row = infer_single(model, inference_row(spark, features))
    if row is None:
        return {"ok": False, "message": "No valid data to predict on."}
    return {"ok": True, "cluster": int(row["prediction"])}
