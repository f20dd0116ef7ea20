"""Skew-handling operators.

The award data is DoD-skewed — one agency dominated an entire column
(SURVEY.md §2.11: the real dataset's awarding_agency had a single value), so
grouped aggregations on agency-like keys concentrate on few reducers at
scale. Two mechanisms:

- AQE skew-join splitting is enabled globally (session.RUNTIME_CONFS) and
  handles join-side skew at runtime.
- salted_sum_by_key: explicit two-stage aggregation for skewed GROUP BY —
  stage 1 groups on (key, salt) spreading each hot key over ``salt_buckets``
  reducers, stage 2 merges per key. Because the money sums accumulate in
  exact decimal (associative), salting changes the physical plan but cannot
  change the result — the property that makes it safe to deploy blindly.

Cost note: salting doubles the shuffle count; use it when key skew is known
(hot-key histograms from value_counts) or leave AQE to handle moderate skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import EXACT_DECIMAL


def salted_sum_by_key(
    df: DataFrame,
    keys: Sequence[str],
    amount_col: str,
    alias: str = "total_award_amount",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage grouped SUM with key salting; bit-identical results to the
    unsalted operators.aggregates.sum_by_key."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(F.col(amount_col).cast(EXACT_DECIMAL)).alias("_partial")
    )
    return partial.groupBy(*keys).agg(
        F.round(F.sum("_partial"), 2).cast("double").alias(alias)
    )
