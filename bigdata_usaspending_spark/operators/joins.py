"""Join operators (SURVEY.md §2.3).

The reference's single join shape is dim ⋈ fact on one named key
(app/spark_cassandra_etl_award_amount_aggregator.py:81-82) where the dim has
<=10 rows. We generalize it and make the broadcast explicit: at 100 TB the
fact side must never shuffle for a small-dim join, so dims get an explicit
``F.broadcast`` hint rather than relying on the autoBroadcastJoinThreshold
estimate surviving a scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_dim_fact(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """fact ⋈ dim with USING-column semantics (single deduped key column).

    ``how`` supports the full Spark join surface (inner/left/right/full/
    semi/anti); the reference only used inner, which doubles as a semi-join
    filter since the geo dim keys are a strict subset of fact keys.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = ("event_id", "value"),
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row of the
    same key with right_ts <= left_ts (trades-to-quotes / event-attribution
    semantics — an operator Spark has no built-in for).

    Scale shape: the naive formulation is an inequality join — O(|L| x |R|)
    per key and unbroadcastable at 100 TB. This implementation is the
    union-window pattern: tag both sides, union, and carry the last non-null
    right payload forward with last_value(ignorenulls) over a
    (key, ts, side) ordering — ONE shuffle on the key, linear in |L| + |R|,
    and the window never materializes a cross product. Right rows sort
    before left rows at equal ts, so at-or-before includes exact matches.

    The right side is pre-deduplicated to one row per (key, ts) via max_by
    on the first payload column, making the pick deterministic even when a
    key has two right rows at the same instant.

    Output: every left column, plus each payload column as ``<name><suffix>``
    (NULL when no right row precedes the left row).
    """
    from pyspark.sql import Window

    first_pay = right_payload[0]
    dedup = right.groupBy(F.col(key), F.col(right_ts).alias("_ats")).agg(
        *[
            F.max_by(F.col(c), F.col(first_pay)).alias(c) if c != first_pay
            else F.max(F.col(c)).alias(c)
            for c in right_payload
        ]
    )
    rp = F.struct(*[F.col(c) for c in right_payload])
    r2 = dedup.select(
        F.col(key), F.col("_ats"), rp.alias("_rp"), F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}"
                                 for c in left.columns) + ">"
        ).alias("_lrow"),
    )
    l2 = left.select(
        F.col(key),
        F.col(left_ts).alias("_ats"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}"
                                 for c in right_payload) + ">"
        ).alias("_rp"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r2.unionByName(l2)
        .withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )


def range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Interval join: attach the range-dimension row whose [lo, hi) interval
    contains the fact value (banding/tiering — no built-in equi-join form).

    An inequality join has no hash key, so Spark plans a nested-loop join —
    correct only when the range side is small and BROADCAST, which banding
    dimensions always are (tier tables, histogram buckets: tens to thousands
    of rows). The fact side streams through the broadcast list with no
    shuffle at all. For large range dimensions the scalable rewrite is to
    equi-join on a computed bucket key (floor(value / bucket_width)) and
    post-filter — not needed for the tiering capability here.
    """
    cond = (fact[value_col] >= ranges[lo_col]) & (fact[value_col] < ranges[hi_col])
    return fact.join(F.broadcast(ranges), on=cond, how=how)
