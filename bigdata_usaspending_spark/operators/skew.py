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


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    row_id: str,
    replication: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join for the fact ⋈ fact case where neither side
    broadcasts and one key dominates (the DoD-agency shape): the skewed side
    gets a deterministic per-row salt (hash of its unique ``row_id``, not
    rand — replays produce identical partitioning), the other side is
    replicated ``replication`` times, and the join key becomes (key, salt) —
    spreading each hot key over ``replication`` reducers.

    Equivalent to ``skewed.join(other, key, how)`` for inner/left joins
    (every original pair appears exactly once, in the partition its salt
    chose). Cost: the other side shuffles ``replication``x — use when a
    hot-key histogram (value_counts) shows AQE's split threshold won't
    catch the skew, e.g. stream-static joins where AQE doesn't apply.

    The join strategy is pinned to sort-merge via a ``merge`` hint on the
    replicated side. Left to the planner, small inputs pick
    BroadcastHashJoin of the REPLICATED side — the one strategy that is
    never right here: it ships and hash-builds ``replication``x the rows a
    broadcast of the bare ``other`` would (if ``other`` fit in a broadcast
    you would broadcast it unsalted and skip this operator entirely), and
    it removes the (key, salt) shuffle that is the operator's whole
    purpose. Measured at sf0.1: broadcast 2.3-3.4 s, shuffle-hash 1.2 s,
    sort-merge 0.95 s per fresh execution. Sort-merge also holds at scale:
    per-partition build memory stays bounded by the sort spill path, where
    a shuffled-hash build of a hot partition is the OOM case salting is
    deployed to avoid.
    """
    salts = F.array(*[F.lit(i).cast("int") for i in range(replication)])
    skewed_s = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(row_id)), F.lit(replication)).cast("int")
    )
    other_s = other.withColumn("_salt", F.explode(salts)).hint("merge")
    out = skewed_s.join(other_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Grouping-key skew diagnostic — the measurement taken BEFORE choosing
    salted_sum_by_key/salted_join over the plain shapes: per-key row counts
    (one partial-agg shuffle on the key; map-side combine absorbs the raw
    volume) reduced to an exact distribution summary — key count, row
    count, hottest-key count, p50/p90/p99 of per-key counts, and
    ``skew_ratio`` = max/p50 (the number that says whether the hot key is
    10x or 10000x the median, i.e. whether AQE skew handling suffices or
    an explicit salt is needed). All exact integer counts plus the
    percentile bridge (Spark percentile == DuckDB quantile_cont), so the
    whole diagnostic is oracle-checkable. At 100 TB this runs as one
    shuffle over (key, partial count) pairs — far cheaper than the join it
    de-risks."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_c"))
    c = F.col("_c").cast("double")
    qs = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.max("_c").alias("max_count"),
        F.percentile(c, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("_p"),
    )
    return qs.select(
        "n_keys",
        "n_rows",
        "max_count",
        F.element_at("_p", 1).alias("p50_count"),
        F.element_at("_p", 2).alias("p90_count"),
        F.element_at("_p", 3).alias("p99_count"),
        (F.col("max_count").cast("double") / F.element_at("_p", 1)).alias(
            "skew_ratio"
        ),
    )
