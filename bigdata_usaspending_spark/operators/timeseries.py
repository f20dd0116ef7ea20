"""Time-series operators: calendar resampling with gap fill, per-group
z-score outlier flagging, and fixed-width histograms.

The reference's dashboards aggregate award amounts by calendar month
(app/spark_cassandra_groupby_month.py:25-32) but silently render nothing for
months with no awards and have no outlier/distribution view at all. These
operators generalize that family the way a warehouse engine would:

- ``monthly_gap_fill``    — dense per-key monthly spine (missing months
  materialized) with forward-filled totals. Spine generation is
  ``sequence()`` per key (pure codegen, no driver loop); the fill is a
  single running ``last(ignorenulls)`` window per key — one shuffle on the
  key, partition sizes bounded by months-per-key (~tens), so the plan is
  unchanged at 1000 executors.
- ``zscore_flags``        — per-group mean/stddev from exact-decimal sums
  (same determinism contract as aggregates.describe_stats) computed with
  window aggregates so each row gets its z-score in ONE shuffle on the
  group key; no join back, no driver collect.
- ``fixed_width_histogram`` — global min/max (one tiny all-to-one partial
  agg) broadcast-cross-joined onto the scan, then a groupBy on the bin
  index: two linear passes, no sort, bin count fixed — the distribution
  sketch you can afford on 100 TB.

Determinism: every double here is produced by the same IEEE expression an
external SQL engine would evaluate ((x-mn)*nbins/(mx-mn), (x-mean)/std with
decimal-backed sums), so the DuckDB twins match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import exact_sum

_DIN = "decimal(19,4)"
_DPROD = "decimal(38,6)"


def monthly_gap_fill(
    df: DataFrame,
    key: str,
    date_col: str,
    amount_col: str,
    alias: str = "amount_filled",
) -> DataFrame:
    """Dense monthly resample per key with forward fill.

    Aggregates ``amount_col`` per (key, calendar month), materializes every
    month between each key's first and last active month via
    ``sequence(min_month, max_month, interval 1 month)``, left-joins the
    observed totals onto the spine, and forward-fills gaps with the last
    observed total. ``gap_filled`` marks spine rows that had no data.

    Scale shape: the monthly pre-aggregation is one shuffle on
    (key, month); bounds + spine + fill all reuse the SAME key partitioning
    (Catalyst sees the common key), and the fill window is bounded by the
    calendar span, never by fact cardinality.
    """
    month = F.date_trunc("month", F.col(date_col)).alias("month")
    monthly = df.groupBy(F.col(key), month).agg(exact_sum(amount_col, "_amt"))
    bounds = monthly.groupBy(key).agg(
        F.min("month").alias("_mn"), F.max("month").alias("_mx")
    )
    spine = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.expr("interval 1 month"))
        ).alias("month"),
    )
    joined = spine.join(monthly, [key, "month"], "left")
    fill = Window.partitionBy(key).orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        key,
        "month",
        F.last("_amt", ignorenulls=True).over(fill).alias(alias),
        F.col("_amt").isNull().alias("gap_filled"),
    )


def zscore_flags(
    df: DataFrame,
    key: str,
    value_col: str,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-group z-score outlier flagging.

    mean and stddev come from exact-decimal Σx / Σx² window aggregates over
    the group (order-independent, reproducible by any engine), final
    arithmetic in double: z = (x − Σx/n) / sqrt((Σx² − (Σx)²/n)/(n−1)).
    Returns only rows with \\|z\\| > ``z_threshold``.

    One shuffle on the group key; the window aggregates are unbounded-frame
    (computed once per partition, not per row), and no second pass or join
    is needed to attach group stats to rows.
    """
    w = Window.partitionBy(key)
    x = F.col(value_col)
    xd = x.cast(_DIN)
    n = F.count(F.lit(1)).over(w).cast("double")
    s = F.sum(xd).over(w).cast("double")
    s2 = F.sum((xd * xd).cast(_DPROD)).over(w).cast("double")
    mean = s / n
    std = F.sqrt((s2 - (s * s) / n) / (n - F.lit(1.0)))
    z = (x.cast("double") - mean) / std
    return (
        df.select(key, value_col, z.alias("z"))
        .filter(F.abs(F.col("z")) > F.lit(z_threshold))
    )


def fixed_width_histogram(df: DataFrame, col: str, nbins: int) -> DataFrame:
    """Equi-width histogram: bin = min(floor((x−mn)·nbins/(mx−mn)), nbins−1).

    Global min/max is a 1-row partial aggregate broadcast back onto the
    scan (no shuffle of the fact side); the bin groupBy is map-side partial
    with at most ``nbins`` groups. ``bin_lo`` is the inclusive lower edge,
    reproduced bit-for-bit by any engine evaluating the same expression.
    """
    stats = df.agg(
        F.min(F.col(col)).cast("double").alias("_mn"),
        F.max(F.col(col)).cast("double").alias("_mx"),
    )
    x = F.col(col).cast("double")
    width_num = F.col("_mx") - F.col("_mn")
    bin_idx = F.least(
        F.floor((x - F.col("_mn")) * F.lit(float(nbins)) / width_num),
        F.lit(nbins - 1).cast("bigint"),
    ).cast("int")
    binned = df.join(F.broadcast(stats)).select(
        bin_idx.alias("bin"), "_mn", "_mx"
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.first("_mn")
                + F.col("bin").cast("double")
                * ((F.first("_mx") - F.first("_mn")) / F.lit(float(nbins)))
            ).alias("bin_lo"),
        )
        .select("bin", "bin_lo", "n")
        .orderBy("bin")
    )


def mad_outliers(
    df: DataFrame,
    key: str,
    value_col: str,
    k: float = 1.8,
) -> DataFrame:
    """Median-absolute-deviation outlier flags — the robust twin of
    zscore_flags (mean/std are themselves dragged by the outliers they
    should expose; median/MAD have a 50% breakdown point).

    Exact per-group medians via the built-in ``percentile`` aggregate
    (mergeable per-partition value->count maps — no global sort, same
    contract as aggregates.exact_median), one for x and one for |x - med|,
    each one keyed shuffle; group stats are tiny and broadcast back.
    Returns rows with |x - med| > k * MAD. Every double (median
    interpolation lo*0.5+hi*0.5, abs, compare) is reproducible SQL."""
    x = F.col(value_col).cast("double")
    med = df.groupBy(key).agg(
        F.percentile(x, F.lit(0.5)).alias("_med")
    )
    dev = df.join(F.broadcast(med), key).select(
        key, x.alias(value_col), F.abs(x - F.col("_med")).alias("abs_dev"), "_med"
    )
    mad = dev.groupBy(key).agg(
        F.percentile(F.col("abs_dev"), F.lit(0.5)).alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), key)
        .filter(F.col("abs_dev") > F.lit(k) * F.col("_mad"))
        .select(key, value_col, "abs_dev")
    )


def ewma_monthly(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-key EWMA over the monthly exact-decimal totals: s_1 = x_1,
    s_t = alpha*x_t + (1-alpha)*s_{t-1} folded in month order.

    The monthly rollup is the usual two-phase decimal aggregate; the fold
    runs per KEY over its month array (bounded by the calendar, ~tens of
    elements — the one place an interpreted HOF fold is the right tool:
    one fold per key, not per row). Replayable externally: DuckDB's
    ``list_reduce`` seeds with the first element and folds left, exactly
    like the slice-seeded ``aggregate`` here; alpha=0.5 keeps both
    coefficient literals exact binary64."""
    monthly = df.groupBy(
        F.col(key), F.date_trunc("month", F.col(ts_col)).alias("month")
    ).agg(exact_sum(value_col, "_amt"))
    series = monthly.groupBy(key).agg(
        F.array_sort(F.collect_list(F.struct("month", "_amt"))).alias("pm")
    )
    vals = F.transform("pm", lambda s: s["_amt"])
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    ew = F.aggregate(
        rest,
        F.element_at(vals, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return series.select(
        key, F.size("pm").cast("int").alias("n_periods"), ew.alias("ewma")
    ).orderBy(key)


def active_intervals_by_month(
    df: DataFrame,
    start_col: str,
    end_col: str,
    amount_col: str | None = None,
) -> DataFrame:
    """Interval-overlap aggregation: for every calendar month, how many
    ``[start, end]`` intervals overlap it (and optionally the exact-decimal
    sum of ``amount_col`` over those intervals).

    This is the scale-safe formulation of the interval/temporal join the
    reference could not express at all: instead of a non-equi theta join
    (``month BETWEEN start AND end`` — which Spark can only execute as a
    broadcast nested loop), each interval is EXPLODED into the months it
    covers via ``sequence(date_trunc(start), date_trunc(end), 1 month)``
    and the overlap count becomes a plain hash aggregation on the month.
    Cost is linear in (rows x months-per-interval); the same bin-explode
    trick generalizes to any band/overlap join where one side's ranges are
    bounded (explode to fixed-width bins, equi-join on bin, post-filter the
    exact predicate). Intervals with ``end < start`` or NULL endpoints are
    dropped (no well-defined coverage).
    """
    start = F.date_trunc("month", F.col(start_col))
    end = F.date_trunc("month", F.col(end_col))
    spans = df.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    ).select(
        F.explode(F.sequence(start, end, F.expr("interval 1 month"))).alias("month"),
        *([F.col(amount_col)] if amount_col else []),
    )
    aggs = [F.count(F.lit(1)).alias("n_active")]
    if amount_col:
        aggs.append(exact_sum(amount_col, "open_amount"))
    return spans.groupBy("month").agg(*aggs)


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 20,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the distribution-drift gate a production pipeline runs
    between ingest batches (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25
    shifted). Values bucket onto a FIXED [lo, hi) grid (explicit edges,
    not data-dependent min/max, so the metric is comparable across runs
    and replayable); out-of-range values clamp into the edge bins, nulls
    and NaNs are excluded.

    PSI = sum over buckets of (q - p) * ln(q / p) with p, q the
    baseline/current bucket fractions. Buckets empty on either side are
    SKIPPED (no epsilon smoothing — smoothing constants are a tunable
    lie; the skipped count is reported instead). The sum folds over
    bin-sorted terms (F.aggregate left fold == DuckDB list_reduce), so
    the double is engine-reproducible despite float addition being
    order-sensitive.

    Scale shape: each side is one map + one <= nbins-group partial
    aggregate; the join and fold touch nbins rows. Nothing scans twice,
    nothing shuffles more than nbins rows."""
    width = float(hi) - float(lo)

    def bucket(df: DataFrame, alias: str) -> DataFrame:
        x = F.col(col).cast("double")
        b = F.least(
            F.greatest(
                F.floor((x - F.lit(float(lo))) * F.lit(float(nbins)) / F.lit(width)),
                F.lit(0).cast("bigint"),
            ),
            F.lit(nbins - 1).cast("bigint"),
        )
        return (
            df.filter(x.isNotNull() & ~F.isnan(x))
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    j = (
        bucket(baseline, "pn")
        .join(bucket(current, "qn"), "bin", "full")
        .select(
            "bin",
            F.coalesce("pn", F.lit(0)).alias("pn"),
            F.coalesce("qn", F.lit(0)).alias("qn"),
        )
    )
    totals = j.agg(
        F.sum("pn").alias("_tp"), F.sum("qn").alias("_tq")
    )
    p = F.col("pn").cast("double") / F.col("_tp").cast("double")
    q = F.col("qn").cast("double") / F.col("_tq").cast("double")
    terms = j.crossJoin(F.broadcast(totals)).select(
        "bin",
        "pn",
        "qn",
        F.when((F.col("pn") > 0) & (F.col("qn") > 0), (q - p) * F.log(q / p))
        .alias("term"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("term").isNull()).cast("int")).alias("n_skipped"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("term").isNotNull(), F.struct("bin", "term"))
                    )
                ),
                lambda s: s["term"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("psi"),
    )
