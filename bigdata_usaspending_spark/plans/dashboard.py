"""Dashboard query set — the exact datasets the reference's Flask UI
rendered (app/ml_app.py:86-147, templates/dashboard.html), with every
aggregation server-side.

Reference defects fixed (SURVEY.md §3.2, §4):
- the map queries collected entire rollup tables unbounded (:107,117) ->
  limits pushed into the query (TakeOrderedAndProject);
- the pie/line charts re-aggregated the top-30 rows in browser JS
  (templates/dashboard.html:148-189), silently showing partial totals ->
  exact rollup() computed in Spark. A limit-then-rollup variant is provided
  for bit-parity with the old dashboard if ever needed.

Every function takes an awards-shaped DataFrame (see ml.adapter.awards_view
for the synthetic-star mapping) and returns a DataFrame the serving tier can
collect (all results are small: top-k or per-key/month rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import exact_sum, month_of
from ..operators.joins import join_dim_fact
from ..operators.topk import order_desc, top_k


def map_totals(awards: DataFrame, geo_dim: DataFrame, key: str, limit: int | None = None) -> DataFrame:
    """Map dataset: total by entity with lat/lon carried through
    (reference: total_award_amount_by_{recipient,sub_agency} orderBy desc,
    app/ml_app.py:99-117)."""
    joined = join_dim_fact(awards, geo_dim, on=key)
    totals = joined.groupBy(key, "latitude", "longitude").agg(
        exact_sum("award_amount", "total_award_amount")
    )
    out = order_desc(totals, "total_award_amount", key)
    return out.limit(limit) if limit else out


def sankey_links(awards: DataFrame, k: int = 15) -> DataFrame:
    """Sankey dataset: top-k (sub_agency, recipient) flows
    (reference app/ml_app.py:120-127)."""
    totals = awards.groupBy("awarding_sub_agency", "recipient_name").agg(
        exact_sum("award_amount", "total_award_amount")
    )
    return totals.orderBy(
        F.desc("total_award_amount"), F.asc("awarding_sub_agency"), F.asc("recipient_name")
    ).limit(k)


def monthly_rollup(awards: DataFrame) -> DataFrame:
    """Pie + line dataset in one pass: ROLLUP(sub_agency, month) — the exact
    server-side version of the browser's two-stage re-aggregation (A9).

    rows with month IS NULL, sub_agency NOT NULL  -> pie slices (per-agency totals)
    rows with both NOT NULL                       -> line points (per-month)
    the (NULL, NULL) row                          -> grand total
    """
    return (
        awards.rollup("awarding_sub_agency", month_of("start_date").alias("month"))
        .agg(exact_sum("award_amount", "total_award_amount"))
        .orderBy(F.asc_nulls_first("awarding_sub_agency"), F.asc_nulls_first("month"))
    )


def monthly_rollup_top30_parity(awards: DataFrame) -> DataFrame:
    """Bit-parity variant of the OLD dashboard numbers: aggregate only the
    top-30 (sub_agency, month) rows, as the browser did
    (templates/dashboard.html:148-189). Kept for migration comparison."""
    per_month = awards.groupBy(
        "awarding_sub_agency", month_of("start_date").alias("month")
    ).agg(exact_sum("award_amount", "total_award_amount"))
    top30 = top_k(per_month, "total_award_amount", "awarding_sub_agency", 30)
    return (
        top30.rollup("awarding_sub_agency", "month")
        .agg(F.sum("total_award_amount").alias("total_award_amount"))
        .orderBy(F.asc_nulls_first("awarding_sub_agency"), F.asc_nulls_first("month"))
    )
