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

# the reference's single-row inference schema (app/ml_app.py:194-208):
# the 5 categorical candidates + month/year/amount
INFERENCE_SCHEMA = (
    "awarding_agency string, awarding_sub_agency string, "
    "contract_award_type string, funding_agency string, "
    "funding_sub_agency string, month int, year int, award_amount double"
)


def _rows(df: DataFrame) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


def _asc_key(v):
    """None-safe ascending sort key mirroring engine-side ASC NULLS FIRST:
    real data can carry null grouping values (null sub-agency/month) that
    the synthetic star never produces, and raw-value keys TypeError against
    None in Python 3."""
    return (v is not None, 0 if v is None else v)


def _desc_key(v):
    """None-safe descending sort key mirroring DESC NULLS LAST."""
    return (v is None, 0.0 if v is None else -v)


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
    templates/dashboard.html:148-189).

    All seven datasets derive from ONE grouping-sets pass over the fact —
    a single scan + shuffle instead of six independent aggregations (at
    100 TB the fact scan dominates; the standalone operators in
    plans/dashboard.py remain for per-dataset use). Each grouping set is
    aggregated independently from raw rows, so every exact-decimal total
    is bit-identical to the corresponding standalone aggregation; the geo
    joins happen AFTER aggregation (1:1 on the key, so totals are
    unchanged and the join input is k-bounded, not fact-sized). The
    materialized aggregate is bounded by the sets' combined key
    cardinality, never the fact."""
    agg = (
        awards.select(
            "recipient_name",
            "awarding_sub_agency",
            month_of("start_date").alias("month"),
            "award_amount",
        )
        .groupingSets(
            [
                ["recipient_name"],
                ["awarding_sub_agency"],
                ["awarding_sub_agency", "recipient_name"],
                ["awarding_sub_agency", "month"],
                ["month"],
                [],
            ],
            "recipient_name",
            "awarding_sub_agency",
            "month",
        )
        .agg(
            exact_sum("award_amount", "total_award_amount"),
            F.grouping_id().alias("_gid"),
        )
        .localCheckpoint()
    )

    # grouping_id bits over (recipient_name, awarding_sub_agency, month):
    # 4 = recipient aggregated away, 2 = sub-agency, 1 = month
    def sel(gid: int) -> DataFrame:
        return agg.filter(F.col("_gid") == gid)

    _UNION_COLS = ("recipient_name", "awarding_sub_agency", "month",
                   "latitude", "longitude")

    def tag(df: DataFrame, name: str) -> DataFrame:
        have = set(df.columns)
        return df.select(
            F.lit(name).alias("_ds"),
            *[
                (F.col(c) if c in have else F.lit(None)).cast(t).alias(c)
                for c, t in zip(
                    _UNION_COLS, ("string", "string", "int", "double", "double")
                )
            ],
            F.col("total_award_amount"),
        )

    # every dataset as one branch of a single union over the materialized
    # aggregate -> the whole payload is ONE collect round-trip (plus the
    # aggregate job), not one job per chart. The k-cuts (sankey/month)
    # happen engine-side via TakeOrderedAndProject; presentation ordering
    # is (re)applied on the collected driver rows.
    branches = [
        tag(sel(3).join(F.broadcast(recipient_geo), "recipient_name"), "map_recipient"),
        tag(sel(5).join(F.broadcast(sub_agency_geo), "awarding_sub_agency"), "map_subagency"),
        tag(
            sel(1).orderBy(
                F.desc("total_award_amount"),
                F.asc("awarding_sub_agency"),
                F.asc("recipient_name"),
            ).limit(sankey_k),
            "sankey",
        ),
        tag(
            sel(4).orderBy(
                F.desc("total_award_amount"),
                F.asc("awarding_sub_agency"),
                F.asc("month"),
            ).limit(month_k),
            "month",
        ),
        tag(sel(5).filter(F.col("awarding_sub_agency").isNotNull()), "pie"),
        tag(sel(6), "line"),
        tag(sel(7), "grand"),
    ]
    combined = branches[0]
    for b in branches[1:]:
        combined = combined.unionByName(b)
    by_ds: dict[str, list] = {}
    for r in combined.collect():
        by_ds.setdefault(r["_ds"], []).append(r)

    def rows(name: str, cols: tuple[str, ...], key) -> list[dict]:
        return [
            {c: r[c] for c in (*cols, "total_award_amount")}
            for r in sorted(by_ds.get(name, []), key=key)
        ]

    desc_total = lambda *tb: (  # noqa: E731
        lambda r: (
            _desc_key(r["total_award_amount"]),
            *[_asc_key(r[c]) for c in tb],
        )
    )
    return {
        # the reference's four template variables, same shapes
        "map_recipient_data": rows(
            "map_recipient",
            ("recipient_name", "latitude", "longitude"),
            desc_total("recipient_name"),
        ),
        "map_subagency_data": rows(
            "map_subagency",
            ("awarding_sub_agency", "latitude", "longitude"),
            desc_total("awarding_sub_agency"),
        ),
        "sankey_data": rows(
            "sankey",
            ("awarding_sub_agency", "recipient_name"),
            desc_total("awarding_sub_agency", "recipient_name"),
        ),
        "month_data": rows(
            "month",
            ("awarding_sub_agency", "month"),
            desc_total("awarding_sub_agency", "month"),
        ),
        # engine extensions: exact server-side pie/line/grand-total (A9 fix)
        "pie_data": rows(
            "pie", ("awarding_sub_agency",), lambda r: _asc_key(r["awarding_sub_agency"])
        ),
        "line_data": rows("line", ("month",), lambda r: _asc_key(r["month"])),
        "grand_total": by_ds["grand"][0]["total_award_amount"],
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
    from ..io import local_frame

    return local_frame(spark, [row], INFERENCE_SCHEMA)


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
